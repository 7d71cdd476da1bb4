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

__all__ = ["global_shuffle", "hash_sample", "hash_split",
           "leakage_safe_split", "resample_by_group", "sample_key",
           "stratified_sample", "weighted_sample"]

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


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic weight-proportional top-k (without replacement).

    The exponential-race trick in the integer domain: each row draws a
    60-bit md5 value ``u`` and races with priority ``u div weight`` —
    the expected priority is inversely proportional to the weight, so
    heavier rows win proportionally more often, yet the draw is a pure
    function of (key, salt) — stable across runs, partitionings, and
    engines (the float A-ES form ``u^(1/w)`` would hit libm/pow
    divergence between Spark and the DuckDB oracle; integer division
    they perform identically on the non-negative operands used here).
    Non-positive weights are floored at 1 (a zero-weight row still has
    a tiny chance, never a division error).

    Two-stage rank (the stratified_sample / topk_per_query bound): the
    per-source-partition stage keeps any task's sort at its own
    partition share and caps survivors at ``k`` per partition, so the
    final global window orders at most ``k × n_partitions`` rows no
    matter the corpus size. Output carries the input columns plus
    ``sample_rank`` (1..k by ascending priority).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = F.conv(F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        1, 15), 16, 10).cast("long")
    prio = F.call_function(
        "div", u, F.greatest(F.col(weight_col).cast("long"), F.lit(1)))
    staged = (df.withColumn("_prio", prio)
                .withColumn("_pid", F.spark_partition_id()))
    w1 = Window.partitionBy("_pid").orderBy(F.asc("_prio"), F.asc(key_col))
    cand = (staged.withColumn("_pr", F.row_number().over(w1))
            .where(F.col("_pr") <= k).drop("_pid", "_pr"))
    w2 = Window.partitionBy().orderBy(F.asc("_prio"), F.asc(key_col))
    return (cand.withColumn("sample_rank", F.row_number().over(w2))
            .where(F.col("sample_rank") <= k).drop("_prio"))


def hash_split(df: DataFrame, fractions: dict[str, float],
               key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic disjoint split (train/val/test) by hash range.

    Adds a ``split`` column: each row lands in the split whose
    cumulative [0, 1) digest range contains its sample key, so the
    splits are exactly disjoint, exhaustive, and stable under re-runs,
    repartitioning, and engine changes — the property ``df.randomSplit``
    cannot give. Fractions must sum to 1 (±1e-9); the last split absorbs
    the sub-ulp rounding tail. Scan-local (zero shuffles): the label is
    a chained range compare on the md5 prefix, evaluated inside the
    scan's codegen span.
    """
    if len(fractions) < 1:
        raise ValueError("fractions must name at least one split")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"fractions must be >= 0, got {fractions}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    key = sample_key(F.col(key_col), salt)
    label, cum = F.lit(names[-1]), 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        branch = key < F.lit(_threshold(min(cum, 1.0)))
        expr = F.when(branch, F.lit(name)) if expr is None \
            else expr.when(branch, F.lit(name))
    label = label if expr is None else expr.otherwise(label)
    return df.withColumn("split", label)


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       fractions: dict[str, float],
                       key_col: str = "doc_id", id_a: str = "id_a",
                       id_b: str = "id_b", salt: str = "") -> DataFrame:
    """``hash_split`` that never separates near-duplicates.

    A plain per-document split leaks: when two near-identical documents
    land in train and val, the val loss silently measures memorization.
    This variant keys the split by the document's duplicate-CLUSTER
    representative — ``dedup_clusters`` (min-label connected components)
    over the ``pairs`` relation any dedup operator in this repo emits —
    so every cluster lands wholly in one split. Documents with no
    near-dup keep their own key (``coalesce``), making the output a
    superset-compatible drop-in for ``hash_split``: same ``split``
    column, same determinism guarantees, plus a ``split_rep`` column
    naming the key actually hashed.

    Scale shape: the pair list only names docs that HAVE a near-dup —
    orders of magnitude smaller than the corpus — so the cluster
    relation rides a broadcast left join; the corpus itself never
    shuffles. The split label itself stays a scan-local md5 range
    compare.
    """
    from rag_document_parser_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(pairs, id_a, id_b)
    joined = df.join(
        F.broadcast(clusters.withColumnRenamed("id", key_col)),
        key_col, "left")
    staged = (joined
              .withColumn("split_rep",
                          F.coalesce(F.col("cluster_id"), F.col(key_col)))
              .drop("cluster_id"))
    return hash_split(staged, fractions, key_col="split_rep", salt=salt)


def resample_by_group(df: DataFrame, weights: dict[str, float],
                      group_col: str, key_col: str = "doc_id",
                      salt: str = "",
                      default_weight: float = 1.0) -> DataFrame:
    """Deterministic mixture resampling (domain/language reweighting).

    The standard training-data mixing step (Pile/DoReMi-style domain
    weights): a row in group ``g`` with weight ``w`` is emitted
    ``floor(w)`` times, plus one more iff its sample key falls under
    ``frac(w)`` — so the group's expected multiplicity is exactly
    ``w``, downsampling (w < 1) and upsampling (w > 1) through one
    rule. Groups absent from ``weights`` get ``default_weight``.
    Output = input columns + ``copy`` (1..n for that row); rows drawn
    zero times disappear.

    Determinism: multiplicity depends only on (key, salt), never on
    partitioning or RNG state — rerunning the job or changing the
    cluster size reproduces the corpus bit-for-bit, which is what makes
    the mixture auditable. Scale: zero shuffles — the copy count is a
    chained group compare plus one digest compare, and the fan-out is a
    ``sequence`` explode inside the scan stage; a 3× upsample of a 100
    TB slice costs the one read pass plus the write of the copies.
    """
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {g!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")

    def parts(w: float) -> tuple[int, str]:
        base = int(w)
        return base, _threshold(w - base)

    d_base, d_thr = parts(default_weight)
    base_e, thr_e = None, None
    for g, w in weights.items():
        b, t = parts(w)
        cond = F.col(group_col) == g
        base_e = F.when(cond, b) if base_e is None else base_e.when(cond, b)
        thr_e = F.when(cond, t) if thr_e is None else thr_e.when(cond, t)
    base_c = F.lit(d_base) if base_e is None else base_e.otherwise(d_base)
    thr_c = F.lit(d_thr) if thr_e is None else thr_e.otherwise(d_thr)
    copies = (base_c.cast("int")
              + (sample_key(F.col(key_col), salt) < thr_c).cast("int"))
    return (df.withColumn("_n", copies.cast("long"))
            .where(F.col("_n") > 0)
            .withColumn("copy",
                        F.explode(F.sequence(F.lit(1).cast("long"),
                                             F.col("_n"))))
            .drop("_n"))


def global_shuffle(df: DataFrame, n_shards: int, key_col: str = "doc_id",
                   salt: str = "",
                   curriculum_col: str | None = None) -> DataFrame:
    """Deterministic training-order shuffle: ``(shard, pos)`` per row.

    Pre-training wants examples in a well-mixed order, but a true
    global sort of 100 TB by a random key is the single most expensive
    shuffle a pipeline can run. The standard two-level factorization:
    a scan-local hash assigns each row to one of ``n_shards`` shards
    (uniform by construction — no skew regardless of the data), and a
    SECOND independent hash orders rows *within* each shard, so the
    only sort any task performs is over ~|corpus|/n_shards rows. The
    training loader then reads shards in any order (or round-robin
    interleaves them), which is statistically equivalent to a full
    shuffle at shard granularity. Both hashes are pure functions of
    ``(key, salt)`` — re-runs and cluster-size changes reproduce the
    exact order, which is what makes a training run repeatable.

    With ``curriculum_col``, within-shard order becomes (curriculum
    DESC, hash) — shard-local curriculum: every loader stream starts
    at its highest-scored examples while the global interleave stays
    mixed (an anti-correlation trick from curriculum-learning practice:
    global score order would put all easy data in one wall-clock
    phase; per-shard order preserves the schedule per stream without
    a global sort).

    Output = input columns + ``shard`` (0..n_shards-1) and ``pos``
    (1..|shard| by the shuffled order).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    # two independent 60-bit draws from disjoint digest halves
    u1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    u2 = F.conv(F.substring(digest, 16, 15), 16, 10).cast("long")
    order = ([F.desc(curriculum_col)] if curriculum_col else []) \
        + [F.asc("_ord"), F.asc(key_col)]
    w = Window.partitionBy("shard").orderBy(*order)
    return (df.withColumn("shard", u1 % n_shards)
            .withColumn("_ord", u2)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_ord"))
