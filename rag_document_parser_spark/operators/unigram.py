"""Unigram-LM tokenizer: seed-vocabulary costs + exact Viterbi
segmentation — the third member of the tokenizer triad (``bpe.py``
trains by pair frequency, ``wordpiece.py`` by likelihood-gain greedy
merges; this module segments by GLOBAL likelihood, the SentencePiece
model of Kudo 2018). The reference has no tokenizer tier
(/root/reference/main.py:72-147 — per-file parsing only).

Model: each vocabulary piece carries an additive cost (a negative log
probability); a word's segmentation is the piece sequence of minimum
total cost, found by exact Viterbi dynamic programming over the
word's character positions. Seed costs come from substring
frequencies — the SentencePiece EM *initialization* (its EM rounds
re-estimate these costs; the seed-vocabulary segmentation is the
documented subset here, the same one-algorithm-stage discipline as
``bpe.py``'s one-replace-per-round subset).

Cross-engine fixed point — the log problem: Viterbi ADDS costs, so a
log is unavoidable, but IEEE ``ln`` is not bitwise-portable across
engines. Both engines instead compute the PIECEWISE-LINEAR base-2 log

    log2_e6(n) = ilog2(n)·10^6 + (n·10^6 div 2^ilog2(n)) - 10^6

with ``ilog2(n) = length(bin(n)) - 1`` — pure integer arithmetic
(monotone, exact at powers of two, ≤ 8.6 % relative error between
them), so Spark and the DuckDB oracle agree bit-for-bit. Piece cost is
``cost_e6 = log2_e6(total) - log2_e6(freq)``; an out-of-vocabulary
single character costs ``2·log2_e6(total)``. Headroom: ``n·10^6``
needs ``n < 9.2e12`` total sampled piece occurrences — beyond that,
train on a word-TYPE sample (tokenizer training never needs the full
crawl; the ``wordpiece.py`` bound note).

Why this scales: the corpus collapses once to the word-TYPE table;
substring candidates enumerate per TYPE (≤ len × ``max_piece_len``
rows per type, the ``wordpiece.greedy_segment`` shape) and aggregate
map-side on the uniform piece key; the selected vocabulary folds to
ONE map-typed row cross-joined broadcast onto the TYPE table; the
Viterbi DP is a single row-local array fold per TYPE (zero UDFs, zero
shuffles); documents explode to tokens once and join the per-TYPE
result broadcast — the corpus never shuffles on the word key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words

__all__ = ["unigram_vocab", "viterbi_segment", "segment_words"]

# piecewise-linear base-2 log in e6 fixed point (see module docstring)
LOG2_E6 = ("((length(bin({n})) - 1) * 1000000 + "
           "({n} * 1000000 div shiftleft(1L, length(bin({n})) - 1)) "
           "- 1000000)")

_ASCII_WORD = "^[a-z0-9]+$"


def _word_types(df: DataFrame, text_col: str, min_count: int,
                ascii_only: bool) -> DataFrame:
    """(word, c): corpus word TYPES with occurrence counts."""
    toks = df.select(words(F.col(text_col)).alias("_t"))
    flat = (toks.select(F.explode_outer("_t").alias("word"))
            .where(F.col("word").isNotNull()))
    if ascii_only:
        flat = flat.where(F.col("word").rlike(_ASCII_WORD))
    return (flat.groupBy("word").agg(F.count("*").alias("c"))
            .where(F.col("c") >= min_count))


def _piece_freqs(wc: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, plen, freq): substring occurrences over word TYPES,
    weighted by type count. Overlapping occurrences all count ('aa'
    appears twice in 'aaa') — the standard suffix-count seeding."""
    wl = wc.select("word", "c", F.length("word").alias("wlen"))
    cand = (wl.select(
        "c", "word", "wlen",
        F.explode(F.sequence(F.lit(1), F.col("wlen"))).alias("pos"))
        .select("c", "word", "pos",
                F.explode(F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len),
                            F.col("wlen") - F.col("pos") + 1)))
                .alias("plen"))
        .select("c", "plen",
                F.expr("substring(word, pos, plen)").alias("piece")))
    return (cand.groupBy("piece", "plen")
            .agg(F.sum("c").cast("long").alias("freq")))


def unigram_vocab(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 256, max_piece_len: int = 4,
                  min_count: int = 2,
                  ascii_only: bool = False) -> DataFrame:
    """Seed vocabulary with integer unigram costs.

    Returns ``(piece, freq, cost_e6)``: EVERY single character of the
    trainable word-TYPE table (closure — any word stays segmentable)
    plus the ``vocab_size`` most frequent multi-character substrings
    up to ``max_piece_len`` (ties broken lexically), each costed
    ``log2_e6(total) - log2_e6(freq)`` against the selected
    vocabulary's total occurrence mass.

    Shape: one TYPE-bounded substring explode, one map-side groupBy on
    the uniform piece key, a TakeOrdered top-N over the (vocabulary-
    sized) multi-char relation, and one scalar total — never a window
    or sort over corpus-scale rows.
    """
    wc = _word_types(df, text_col, min_count, ascii_only)
    pf = _piece_freqs(wc, max_piece_len)
    chars = pf.where(F.col("plen") == 1)
    multi = (pf.where(F.col("plen") >= 2)
             .orderBy(F.col("freq").desc(), F.col("piece").asc())
             .limit(vocab_size))
    sel = chars.unionByName(multi).select("piece", "freq")
    tot = sel.agg(F.sum("freq").cast("long").alias("_tot"))
    return (sel.crossJoin(F.broadcast(tot))
            .select("piece", "freq",
                    F.expr(LOG2_E6.format(n="_tot") + " - "
                           + LOG2_E6.format(n="freq"))
                    .cast("long").alias("cost_e6")))


def _dp_exprs(max_piece_len: int) -> tuple[str, str, str]:
    """The three chained Viterbi expressions over columns
    ``word`` (the string), ``vmap`` (piece -> cost_e6 map) and
    ``ucost`` (out-of-vocabulary single-char cost). ``_INF`` marks an
    unmatchable multi-char span; reachable prefixes are always finite
    because single characters fall back to ``ucost``."""
    inf = 1_000_000_000_000_000
    cost = (f"coalesce(element_at(vmap, substring(word, i, j - i + 1)),"
            f" if(j - i + 1 = 1, ucost, {inf}L))")
    dp = f"""
aggregate(
  sequence(1, length(word)),
  array(named_struct('c', 0L, 'b', 0)),
  (acc, j) -> concat(acc, array(
    aggregate(
      transform(sequence(greatest(1, j - {max_piece_len} + 1), j),
        i -> named_struct('c', element_at(acc, i).c + {cost}, 'i', i)),
      named_struct('c', {inf * 9}L, 'i', 0),
      (m, x) -> if(x.c < m.c, x, m),
      m -> named_struct('c', m.c, 'b', m.i - 1)))))
"""
    cuts = """
aggregate(
  sequence(1, length(word)),
  array(length(word)),
  (acc2, s) -> if(element_at(acc2, 1) = 0, acc2,
    concat(array(element_at(_dp, element_at(acc2, 1) + 1).b), acc2)))
"""
    pieces = """
transform(sequence(1, size(_cuts) - 1),
  k -> substring(word, element_at(_cuts, k) + 1,
                 element_at(_cuts, k + 1) - element_at(_cuts, k)))
"""
    return dp, cuts, pieces


def segment_words(wt: DataFrame, vocab: DataFrame,
                  max_piece_len: int = 4) -> DataFrame:
    """Viterbi-segment each word TYPE: ``(word, pieces, n_pieces,
    cost_e6)`` — minimum-total-cost split, ties broken toward the
    longer piece at the earlier boundary (the fold keeps the first
    minimum, and candidates scan longest-first).

    ``wt`` needs a non-empty ``word`` column; ``vocab`` is the
    ``unigram_vocab`` relation. The vocabulary folds to one map-typed
    row (plus the OOV cost derived from the same total) cross-joined
    broadcast; the DP is a row-local fold — no shuffle of ``wt``.
    """
    stats = (vocab.agg(
        F.map_from_entries(F.collect_list(F.struct("piece", "cost_e6")))
        .alias("vmap"),
        F.sum("freq").cast("long").alias("_tot"))
        .select("vmap", F.expr("2 * " + LOG2_E6.format(n="_tot"))
                .cast("long").alias("ucost")))
    dp, cuts, pieces = _dp_exprs(max_piece_len)
    return (wt.where(F.length("word") > 0)
            .crossJoin(F.broadcast(stats))
            .withColumn("_dp", F.expr(dp))
            .withColumn("_cuts", F.expr(cuts))
            .select("word",
                    F.expr(pieces).alias("pieces"),
                    (F.size("_cuts") - 1).cast("long").alias("n_pieces"),
                    F.expr("element_at(_dp, length(word) + 1).c")
                    .cast("long").alias("cost_e6")))


def viterbi_segment(df: DataFrame, vocab: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    max_piece_len: int = 4,
                    ascii_only: bool = False) -> DataFrame:
    """Per-document Viterbi segmentation totals: ``(id_col, n_tokens,
    n_pieces, cost_e6)``. Documents explode to word tokens once and
    join the per-TYPE segmentation broadcast (TYPE tables outgrow
    broadcast at extreme scale — swap to a shuffle join on the uniform
    word key then; the corpus side stays shuffle-free either way).
    Empty documents emit ``(0, 0, 0)``."""
    toks = df.select(F.col(id_col).alias("id"),
                     words(F.col(text_col)).alias("_t"))
    ex = toks.select("id", F.explode_outer("_t").alias("word"))
    if ascii_only:
        ex = ex.select(
            "id", F.when(F.col("word").rlike(_ASCII_WORD),
                         F.col("word")).alias("word"))
    wt = ex.where(F.col("word").isNotNull()).select("word").distinct()
    seg = segment_words(wt, vocab, max_piece_len).drop("pieces")
    return (ex.join(F.broadcast(seg), "word", "left")
            .groupBy("id")
            .agg(F.count("word").alias("n_tokens"),
                 F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("n_pieces"),
                 F.coalesce(F.sum("cost_e6"), F.lit(0)).alias("cost_e6"))
            .select(F.col("id").alias(id_col),
                    F.col("n_tokens").cast("long"),
                    F.col("n_pieces").cast("long"),
                    F.col("cost_e6").cast("long")))
