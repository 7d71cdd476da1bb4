"""Count-min sketch: fixed-size frequency summaries for heavy hitters.

Exact term frequencies over 100 TB need a shuffle keyed on the term —
fine once (keywords.py pays it deliberately), but monitoring loops,
per-shard dashboards, and streaming token-mix trackers want a summary
whose size does NOT grow with the corpus. The count-min sketch (Cormode
& Muthukrishnan 2005) is that summary: a DEPTH × width integer grid
where every token increments one counter per row and a point estimate
is the MIN over its DEPTH cells — always an overestimate, never an
underestimate, with error bounded by (corpus_tokens / width) per row.

Spark shape:

- ``cms_build`` is one map-side-combinable ``groupBy`` over at most
  ``DEPTH × width`` distinct keys — the shuffle moves the SKETCH, not
  the corpus (each map task pre-aggregates its tokens into its local
  grid cells). Sketches from different shards/days merge by the same
  groupBy-sum, which is what makes the operator streaming- and
  union-friendly.
- ``cms_estimate`` broadcasts the (tiny) sketch against the candidate
  terms; the corpus is never touched again.
- hashing is md5-derived (the repo-wide engine-portable hash), one
  independent row-salted function per sketch row, so the DuckDB oracle
  replays the exact grid and the estimates are deterministic integers.

The reference has no sketch surface (it reports exact per-directory
counts, /root/reference/main.py:72-147); this is a SURVEY §6 scale-path
tier over the same token stream as keywords.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["DEPTH", "cms_build", "cms_estimate"]

DEPTH = 4


def _bucket(term: Column, row: int, width: int) -> Column:
    """Row-salted md5 bucket in [0, width): independent-enough hash
    functions per sketch row from one md5 evaluation each. The 60-bit
    value is non-negative, so ``%`` == ``pmod`` == DuckDB's ``%``."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"cms-{row}:"), term)), 1, 15), 16, 10)
    return h.cast("long") % F.lit(width)


def _probes(term: Column, width: int) -> Column:
    return F.explode(F.array(*[
        F.struct(F.lit(r).cast("long").alias("row"),
                 _bucket(term, r, width).alias("bucket"))
        for r in range(DEPTH)]))


def cms_build(tokens: DataFrame, term_col: str = "term",
              width: int = 1024) -> DataFrame:
    """``(row, bucket, cnt)`` grid cells (absent cell == 0).

    One explode (DEPTH structs per token, generated scan-local) and one
    count aggregate whose key space is capped at DEPTH × width — the
    partial-aggregation map side absorbs the corpus, the exchange moves
    at most the grid per task.
    """
    cells = tokens.select(_probes(F.col(term_col), width).alias("_c"))
    return (cells.groupBy(F.col("_c.row").alias("row"),
                          F.col("_c.bucket").alias("bucket"))
            .agg(F.count("*").alias("cnt")))


def cms_estimate(sketch: DataFrame, terms: DataFrame,
                 term_col: str = "term", width: int = 1024) -> DataFrame:
    """Point estimates ``(term, est_cnt)`` for a candidate term set.

    The sketch is grid-bounded, so it is the broadcast side; a cell the
    sketch never saw estimates 0 (left join + coalesce), and the final
    MIN over the DEPTH rows is the classic count-min upper bound:
    ``exact <= est <= exact + collisions``.
    """
    probes = terms.select(F.col(term_col).alias("term"),
                          _probes(F.col(term_col), width).alias("_c"))
    probes = probes.select("term", F.col("_c.row").alias("row"),
                           F.col("_c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (joined.groupBy("term")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est_cnt")))
