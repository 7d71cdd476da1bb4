"""Distributed BPE tokenizer training (Sennrich et al. 2016) on the
word-TYPE table.

The reference has no tokenizer tier (per-file parsing only,
/root/reference/main.py:72-147); this is the corpus-level pass a
training pipeline runs between `vocab_coverage` (how big should the
vocab be) and `bpe_segment` (how many subword tokens will the corpus
cost). Pure Catalyst per round — no UDFs — with the driver pacing the
merge loop exactly like `similarity.train_kmeans` / `graph.pagerank`
pace theirs.

Why this scales: BPE never iterates over the CORPUS. One
map-side-combinable groupBy collapses 10^12 documents to the word-TYPE
table (vocabulary-sized, weighted by count); every merge round is then
(a) one pair-count aggregate over types — map-side combinable, keys
are symbol pairs, weights are long counts — and (b) one argmax via
``orderBy().limit(1)`` (TakeOrdered: per-partition top-1 + driver
merge, never a global sort), and (c) one string `replace` projection.
Round state is localCheckpointed so the plan does not grow across
rounds (substitute `persist(DISK_ONLY)`/checkpoint on a real cluster).

MERGE SEMANTICS (documented subset): a word is the space-joined string
of its symbols with sentinel spaces and a ``</w>`` end marker; merge
``(l, r)`` is ONE left-to-right non-overlapping string replace of
``' l r '`` with ``' lr '``. Shared-boundary occurrences (``a b a b``)
merge on the NEXT round if the pair is still the argmax — a documented
divergence from reference BPE implementations that re-scan within a
round. Both engines (and the DuckDB oracle, which unrolls rounds as
CTEs the way the `pagerank` oracle does) implement this rule
bit-for-bit; ties in the argmax break lexically on the pair string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words

__all__ = ["bpe_segment", "train_bpe"]

END = "</w>"


def _symstr(word: Column) -> Column:
    """' c h a r s </w> ' — sentinel spaces so every symbol boundary,
    including the first and last, matches the ' l r ' merge pattern.
    ``</w>`` cannot collide with word symbols: the tokenizer's alphabet
    ([a-z0-9] + Arabic) contains no '<'."""
    return F.concat(F.lit(" "), F.array_join(F.split(word, ""), " "),
                    F.lit(" " + END + " "))


def _pairs(sym_df: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent-symbol pairs weighted by type count.
    Symbol arrays are staged as bound attributes (SPARK-36718) and the
    short-array guard mirrors ``dedup.word_shingles`` — sequence(1, 0)
    DESCENDS, so <2-symbol rows must short-circuit."""
    ys = sym_df.select("c", F.split(F.trim("s"), " ").alias("y"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("y") - 1),
        lambda i: F.concat(F.element_at("y", i), F.lit(" "),
                           F.element_at("y", i + 1)))
    guarded = F.when(F.size("y") >= 2, grams).otherwise(
        F.array().cast("array<string>"))
    flat = (ys.select("c", F.explode_outer(guarded).alias("pair"))
            .where(F.col("pair").isNotNull()))
    return flat.groupBy("pair").agg(F.sum("c").alias("cnt"))


def _apply_merge(s: Column, left: str, right: str) -> Column:
    return F.replace(s, F.lit(f" {left} {right} "),
                     F.lit(f" {left}{right} "))


def train_bpe(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", n_merges: int = 16,
              min_count: int = 2) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``[(merge_rank, left, right, pair_count), ...]`` in learned
    order (the list is driver-sized by construction — one row per
    merge). Words below ``min_count`` corpus occurrences are excluded
    from training (the standard rare-word cutoff); stops early if no
    pair is left.
    """
    toks = df.select(words(F.col(text_col)).alias("_t"))
    flat = (toks.select(F.explode_outer("_t").alias("word"))
            .where(F.col("word").isNotNull()))
    wc = (flat.groupBy("word").agg(F.count("*").alias("c"))
          .where(F.col("c") >= min_count))
    syms = wc.select("c", _symstr(F.col("word")).alias("s"))
    syms = syms.localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (_pairs(syms)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1).collect())
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ")
        merges.append((rank, left, right, cnt))
        # localCheckpoint per round: keeps the replace chain from
        # growing into an O(rounds)-deep plan (the kmeans discipline)
        syms = syms.select(
            "c", _apply_merge(F.col("s"), left, right).alias("s"),
        ).localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """The learned merge table as a DataFrame (for sinks/joins).
    Columns are ``lhs``/``rhs`` — not left/right, which are SQL
    keywords in the DuckDB oracle."""
    return spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, "
                "pair_count long")


def bpe_segment(df: DataFrame, merges: list[tuple[int, str, str, int]],
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list: ``(doc_id, n_tokens, n_subwords)``
    per document — the corpus token-cost measurement that sizes
    training budgets.

    The merge chain is a fixed expression (one `replace` per merge)
    evaluated per token inside a higher-order ``transform`` over the
    staged token array — zero shuffles, zero UDFs; the whole operator
    pipelines into the scan. Docs with no tokens emit ``(0, 0)``.
    """
    toks = df.select(F.col(id_col), words(F.col(text_col)).alias("_t"))

    def seg_count(t: Column) -> Column:
        s = _symstr(t)
        for _, left, right, _ in merges:
            s = _apply_merge(s, left, right)
        return F.size(F.split(F.trim(s), " ")).cast("long")

    return toks.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        F.aggregate(F.col("_t"), F.lit(0).cast("long"),
                    lambda acc, t: acc + seg_count(t)).alias("n_subwords"),
    )
