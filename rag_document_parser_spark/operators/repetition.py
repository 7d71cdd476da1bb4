"""Repetition quality signals and eval-set decontamination.

Standard training-data pipeline filters (Gopher/C4-style) the reference
has no analog for (it processes documents individually,
/root/reference/main.py:72-147); these are corpus-level scale-path
additions in the spirit of SURVEY §6's LLM-data operators.

Scale shape, per operator:

- ``line_repetition_features`` is **zero-shuffle**: every metric is an
  array expression over the row's own lines (``array_distinct`` +
  ``aggregate``), so it runs inside the same whole-stage-codegen span
  as the parquet scan. A 100 TB corpus costs one read pass.
- ``top_ngram_stats`` explodes grams and hash-aggregates twice, first
  on ``(id, gram)`` then on ``id``. Both aggregations are map-side
  combinable, and after the explode a doc's gram rows stay inside the
  source-row's partition, so the partial aggregate collapses them to
  one row per (task, id, gram) before any exchange. Per-doc mode via
  higher-order array functions instead would be O(grams²) per row —
  worse for exactly the giant docs that matter.
- ``decontaminate`` keys off the usual asymmetry: the eval set is tiny
  (thousands of docs) next to the corpus. Eval shingles are distinct-
  aggregated and **broadcast**; the corpus side is a left-semi hash
  join partition-local to the scan, then one map-side-combinable count
  per doc. The corpus is never shuffled on the (Zipf-skewed) shingle
  key at all — the same skew-immunity argument as
  ``dedup.ngram_jaccard_pairs``'s blacklist join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.dedup import shingle_df, words

__all__ = [
    "decontaminate",
    "decontaminate_surgery",
    "line_repetition_features",
    "remove_repeated_windows",
    "repeated_window_fraction",
    "repeated_windows",
    "top_ngram_stats",
]


def _sum_lengths(lines: Column) -> Column:
    """Total characters across an array of lines (0 for empty arrays)."""
    return F.aggregate(lines, F.lit(0).cast("long"),
                       lambda acc, l: acc + F.length(l))


def line_repetition_features(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             lines_col: str | None = None) -> DataFrame:
    """Per-doc duplicate-line fractions (Gopher repetition signals).

    Lines come from ``lines_col`` (``array<string>``) when given, else
    from splitting ``text_col`` on newlines with empty lines dropped.
    Output per doc: ``n_lines``, ``n_distinct_lines``, total and
    distinct character counts, and the two Gopher fractions —
    ``dup_line_frac`` (by count) and ``dup_line_char_frac`` (by
    character mass). Fractions are raw doubles; driver oracles project
    ``floor(x * 1e6)`` per the repo's float-equality rule.

    Zero shuffles: everything is per-row array arithmetic; the lines
    array is staged as a bound attribute so Catalyst evaluates the
    split once, not once per referencing expression.
    """
    lines = (F.col(lines_col) if lines_col is not None
             else F.filter(F.split(F.col(text_col), "\n"),
                           lambda l: l != ""))
    staged = df.select(F.col(id_col), lines.alias("_lines"))
    dis = F.array_distinct(F.col("_lines"))
    proj = staged.select(
        F.col(id_col),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size(dis).cast("long").alias("n_distinct_lines"),
        _sum_lengths(F.col("_lines")).alias("n_line_chars"),
        _sum_lengths(dis).alias("n_distinct_line_chars"),
    )
    return proj.select(
        "*",
        F.when(F.col("n_lines") > 0,
               1.0 - F.col("n_distinct_lines") / F.col("n_lines"))
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(F.col("n_line_chars") > 0,
               1.0 - F.col("n_distinct_line_chars") / F.col("n_line_chars"))
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    )


def top_ngram_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Most-frequent-n-gram fraction per doc (Gopher `top n-gram` rule).

    Output: ``(id, n_grams, top_count, top_frac)`` for every doc with at
    least one n-gram; ``top_frac = top_count / n_grams`` is the mass of
    the modal gram. The gram string itself is deliberately not returned:
    equal-count ties would make it engine-dependent, and the filter rule
    only consumes the fraction.
    """
    sh = shingle_df(df, text_col, id_col, n, distinct=False,
                    drop_empty=True)
    # explode_outer + notnull for the same InferFiltersFromGenerate
    # reason as ngram_jaccard_pairs (dedup.py): plain explode re-inlines
    # the tokenizer chain into pushed-down generator-input filters.
    flat = (sh.select("id", F.explode_outer("shingles").alias("gram"))
              .where(F.col("gram").isNotNull()))
    per_gram = flat.groupBy("id", "gram").agg(F.count("*").alias("c"))
    return (per_gram.groupBy("id")
            .agg(F.sum("c").alias("n_grams"),
                 F.max("c").alias("top_count"))
            .select("id", "n_grams", "top_count",
                    (F.col("top_count") / F.col("n_grams"))
                    .alias("top_frac")))


def _window_hash_df(df: DataFrame, text_col: str, id_col: str,
                    window: int) -> DataFrame:
    """(id, whashes): md5 of every `window`-token sliding window
    (stride 1) as a per-row array — only the 32-char hash ever leaves
    the row, never the window text (at 10^12 docs the exploded relation
    is hashes, not substrings). Tokens are staged as a bound attribute
    first (two stacked projections, SPARK-36718) so the tokenizer runs
    once per row, not once per window — the same staging discipline as
    ``dedup.shingle_df`` and ``line_repetition_features``."""
    toks = df.select(F.col(id_col).alias("id"),
                     words(F.col(text_col)).alias("_t"))
    hashes = F.when(
        F.size("_t") >= window,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (window - 1)),
            lambda i: F.md5(F.array_join(F.slice("_t", i, window), " "))),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    return toks.select("id", hashes.alias("whashes"))


def repeated_windows(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 20,
                     min_docs: int = 2) -> DataFrame:
    """Cross-corpus repeated-substring detection (the signal behind
    substring-level dedup, Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better" — suffix-array duplicates re-expressed
    as fixed-width token windows).

    Returns ``(whash, n_docs, n_occurrences)`` for every ``window``-token
    sliding window whose text occurs in >= ``min_docs`` distinct docs.
    One explode + one map-side-combinable aggregate on the window hash —
    the same skew-immune groupBy shape as paragraph_dedup's blacklist
    (a corpus-dominating boilerplate window partial-aggregates inside
    each task).
    """
    flat = _window_hash_df(df, text_col, id_col, window).select(
        "id", F.explode_outer("whashes").alias("whash"),
    ).where(F.col("whash").isNotNull())
    return (flat.groupBy("whash")
            .agg(F.count_distinct("id").alias("n_docs"),
                 F.count("*").alias("n_occurrences"))
            .where(F.col("n_docs") >= min_docs))


def repeated_window_fraction(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", window: int = 20,
                             min_docs: int = 2,
                             broadcast_repeats: bool = True) -> DataFrame:
    """Per-doc fraction of token windows that are cross-corpus repeats:
    ``(id_col, n_windows, n_repeated, repeated_e6)`` with ``repeated_e6
    = n_repeated * 10^6 div n_windows`` (0 when the doc is shorter than
    one window). The repeated-window set is usually tiny next to the
    corpus and joins back broadcast — the corpus never shuffles on the
    window key; on boilerplate-saturated crawls where the repeat set
    itself outgrows executor memory, ``broadcast_repeats=False`` drops
    the hint and degrades to a shuffle join.
    """
    rep = repeated_windows(df, text_col, id_col, window, min_docs) \
        .select("whash")
    if broadcast_repeats:
        rep = F.broadcast(rep)
    ex = _window_hash_df(df, text_col, id_col, window).select(
        "id", F.posexplode_outer("whashes").alias("_pos", "whash"))
    hit = F.col("whash").isNotNull() & F.col("_hit").isNotNull()
    return (ex.join(rep.withColumn("_hit", F.lit(1)), "whash", "left")
            .groupBy("id")
            .agg(F.count("whash").alias("n_windows"),
                 F.sum(hit.cast("long")).alias("n_repeated"))
            .select(F.col("id").alias(id_col), "n_windows", "n_repeated",
                    F.when(F.col("n_windows") > 0,
                           F.expr("n_repeated * 1000000 div n_windows"))
                    .otherwise(F.lit(0)).cast("long").alias("repeated_e6")))


def remove_repeated_windows(df: DataFrame, repeats: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id", window: int = 20,
                            broadcast_repeats: bool = True) -> DataFrame:
    """Cut cross-corpus repeated substrings OUT of documents (Lee et al.
    2022 §4 — remove the duplicated span, keep the rest of the doc; the
    whole-doc-drop alternative measurably hurts downstream models).

    ``repeats`` is (a projection of) ``repeated_windows`` output — any
    DataFrame with a ``whash`` column. A token is removed when it is
    covered by ANY repeated ``window``-token sliding window; the doc
    survives as ``(id_col, n_tokens, n_removed, cleaned)`` where
    ``cleaned`` is the space-joined residual token sequence. Surgery is
    in TOKEN space (the tokenizer's lowercase word stream), matching the
    window-hash definition — a documented divergence from Lee et al.'s
    byte-level suffix arrays, which this fixed-width re-expression
    trades for distributability (same trade ``repeated_windows`` makes).

    Scale shape: the repeat set broadcasts (tiny next to the corpus;
    ``broadcast_repeats=False`` degrades to a shuffle join when
    boilerplate saturation outgrows executor memory), repeated start
    positions regroup on the UNIFORM doc_id key, and the span surgery
    itself is per-row fold arithmetic: repeated starts merge into
    disjoint covered intervals (one ``aggregate`` over the sorted start
    list), then the kept tokens concatenate the BETWEEN-interval slices
    — O(tokens + intervals) per doc, never a per-position membership
    scan (O(tokens × starts) on exactly the boilerplate-heavy docs that
    matter).
    """
    rep = repeats.select("whash")
    if broadcast_repeats:
        rep = F.broadcast(rep)
    toks = df.select(F.col(id_col).alias("id"),
                     words(F.col(text_col)).alias("_t"))
    ex = _window_hash_df(df, text_col, id_col, window).select(
        "id", F.posexplode_outer("whashes").alias("_pos", "whash"))
    # 1-based token index of each repeated window's first token
    starts = (ex.where(F.col("whash").isNotNull())
              .join(rep, "whash", "left_semi")
              .groupBy("id")
              .agg(F.sort_array(F.collect_list(F.col("_pos") + 1))
                   .alias("_starts")))
    j = toks.join(starts, "id", "left").select(
        "id", "_t",
        F.coalesce("_starts", F.expr("cast(array() as array<int>)"))
        .alias("_starts"))
    # merge sorted starts into disjoint covered intervals [lo, hi]
    intervals = F.aggregate(
        "_starts",
        F.expr("cast(array() as array<struct<lo:int,hi:int>>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s <= F.element_at(acc, -1).getField("hi") + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1).getField("lo").alias("lo"),
                    (s + (window - 1)).alias("hi"))))
        ).otherwise(
            F.concat(acc, F.array(F.struct(
                s.alias("lo"), (s + (window - 1)).alias("hi"))))))
    staged = j.select("id", "_t", F.size("_t").alias("_n"),
                      intervals.alias("_iv"))
    # concatenate the gaps between intervals (plus the tail) — the
    # between-interval slice lengths are >= 0 by the merge invariant
    kept = F.aggregate(
        "_iv",
        F.struct(F.lit(1).alias("pos"),
                 F.expr("cast(array() as array<string>)").alias("out")),
        lambda acc, iv: F.struct(
            (iv.getField("hi") + 1).alias("pos"),
            F.concat(acc.getField("out"),
                     F.slice(F.col("_t"), acc.getField("pos"),
                             iv.getField("lo") - acc.getField("pos")))
            .alias("out")),
        lambda acc: F.concat(
            acc.getField("out"),
            F.slice(F.col("_t"), acc.getField("pos"),
                    F.col("_n") - acc.getField("pos") + 1)))
    return staged.select(
        F.col("id").alias(id_col),
        F.col("_n").cast("long").alias("n_tokens"),
        kept.alias("_kept"),
    ).select(
        id_col, "n_tokens",
        (F.col("n_tokens") - F.size("_kept")).cast("long")
        .alias("n_removed"),
        F.array_join("_kept", " ").alias("cleaned"))


def decontaminate(corpus: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Flag corpus docs whose shingle sets overlap an eval set.

    For every corpus doc with at least one word n-gram shingle, counts
    how many of its *distinct* shingles appear anywhere in ``eval_df``
    and emits ``contam_frac = n_matched / n_sh`` plus ``contaminated``
    (``contam_frac >= threshold``). This is the standard benchmark-
    decontamination pass run before training (n-gram collision against
    held-out eval sets).

    The eval side is distinct-aggregated then broadcast; swapping a
    100 TB corpus through a shuffle on the shingle key never happens.
    """
    ev = (shingle_df(eval_df, text_col, id_col, n, drop_empty=True)
          .select(F.explode("shingles").alias("shingle")).distinct())
    corp = shingle_df(corpus, text_col, id_col, n, drop_empty=True)
    sizes = corp.select("id", F.size("shingles").alias("n_sh"))
    flat = (corp.select("id", F.explode_outer("shingles").alias("shingle"))
                .where(F.col("shingle").isNotNull()))
    matched = (flat.join(F.broadcast(ev), "shingle", "left_semi")
                   .groupBy("id").agg(F.count("*").alias("n_matched")))
    out = (sizes.join(matched, "id", "left")
           .select("id", "n_sh",
                   F.coalesce("n_matched", F.lit(0)).alias("n_matched")))
    frac = F.col("n_matched") / F.col("n_sh")
    return out.select("id", "n_sh", "n_matched", frac.alias("contam_frac"),
                      (frac >= threshold).alias("contaminated"))


def decontaminate_surgery(corpus: DataFrame, eval_df: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          window: int = 20,
                          broadcast_repeats: bool = True) -> DataFrame:
    """Benchmark-overlap SURGERY: excise every eval-set token window
    from corpus documents instead of dropping whole documents.

    ``decontaminate`` flags and drops; this keeps the document and cuts
    only the overlapping spans — the remedy corpus recipes apply when a
    long document quotes a benchmark passage verbatim (dropping the
    whole doc would throw away the 99% that is clean; shipping it would
    leak the eval answer). The eval side collapses to its DISTINCT
    ``window``-token window hashes and rides the same broadcast +
    interval-merge span surgery as ``remove_repeated_windows`` —
    O(tokens + intervals) per doc, corpus never shuffled on the window
    key. Same token-space caveat as the repeated-window surgery:
    ``cleaned`` is the tokenizer's lowercase word stream.

    Returns ``(id_col, n_tokens, n_removed, cleaned)``.
    """
    bench = (_window_hash_df(eval_df, text_col, id_col, window)
             .select(F.explode_outer("whashes").alias("whash"))
             .where(F.col("whash").isNotNull()).distinct())
    return remove_repeated_windows(corpus, bench, text_col, id_col,
                                   window, broadcast_repeats)
