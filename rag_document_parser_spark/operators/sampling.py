"""Deterministic corpus sampling (eval-set construction).

A web-scale training-data pipeline samples constantly — held-out eval
slices, ablation subsets, human-review batches, per-language quotas.
``df.sample()``/``rand()`` are non-reproducible across runs, engines,
and partitionings; every decision here instead keys off
``md5(key || salt)``, so the same (corpus, salt) selects the same rows
on any engine at any cluster size. md5 is the one hash Spark and the
DuckDB oracle compute identically (xxhash64 is Spark-private).

Scale shape:

- ``hash_sample`` is a pure scan-local filter — zero shuffles, runs
  inside the same whole-stage-codegen span as the parquet scan, and the
  selectivity is applied before anything downstream, so a 1 % sample of
  100 TB costs one read pass and writes 1 TB.
- ``stratified_sample`` uses the same two-stage rank bound as
  ``similarity.topk_per_query``: a per-(stratum, source-partition)
  partial rank caps what any task sorts, then a bounded final rank over
  at most ``k * n_partitions`` survivors per stratum. A naive
  ``row_number() OVER (PARTITION BY stratum)`` would funnel every row
  of a popular stratum ("en" is most of the web) through one task.

The reference has no sampling surface (it processes full directories,
/root/reference/main.py:72-147); these are scale-path additions in the
spirit of SURVEY §6's training-data operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_sample", "sample_key", "stratified_sample"]

# 8 hex digits = 32 bits of the digest: rate resolution 1/2^32, far finer
# than any sampling decision needs, and short enough that the threshold
# comparison is a cheap fixed-width string compare in both engines.
_HEX_DIGITS = 8


def sample_key(key: Column, salt: str = "") -> Column:
    """Lowercase hex md5 prefix both engines agree on byte-for-byte.

    Comparing lowercase fixed-width hex strings lexicographically is
    identical to comparing the underlying 32-bit integers, which keeps
    the DuckDB oracle a plain string comparison too (no hex→int casts
    with engine-specific overflow rules).
    """
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))),
                       1, _HEX_DIGITS)


def _threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16 ** _HEX_DIGITS), 16 ** _HEX_DIGITS - 1),
                  f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Deterministic Bernoulli-style sample: keep ~``rate`` of rows.

    Membership depends only on (key, salt) — stable under re-runs,
    repartitioning, and engine changes, and two samples with disjoint
    salts are independent (fresh digest bits). The filter is a plain
    deterministic predicate, so Catalyst pushes the surrounding
    column pruning to the scan and the row never leaves the scan stage
    unless selected.
    """
    return df.where(sample_key(F.col(key_col), salt) < _threshold(rate))


def stratified_sample(df: DataFrame, k: int, strata_col: str,
                      key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically.

    Rows within a stratum are ordered by (md5 prefix, key) — an
    order-free uniform draw with a total tie-break — and the first k
    win. Two-stage rank keeps the popular-stratum skew bounded (see
    module docstring); results are identical to the single-window form
    because a global top-k row is a top-k row of its own source
    partition. Output carries the input columns plus ``sample_rank``
    (1..k within the stratum).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    staged = (df.withColumn("_skey", sample_key(F.col(key_col), salt))
                .withColumn("_pid", F.spark_partition_id()))
    w1 = Window.partitionBy(strata_col, "_pid").orderBy(
        F.asc("_skey"), F.asc(key_col))
    cand = (staged.withColumn("_pr", F.row_number().over(w1))
            .where(F.col("_pr") <= k).drop("_pid", "_pr"))
    w2 = Window.partitionBy(strata_col).orderBy(F.asc("_skey"),
                                                F.asc(key_col))
    return (cand.withColumn("sample_rank", F.row_number().over(w2))
            .where(F.col("sample_rank") <= k).drop("_skey"))
