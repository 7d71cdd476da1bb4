"""Fixed-point power-iteration PCA over embedding columns.

Embedding compression / whitening wants the data's principal direction;
at corpus scale PCA is trained on a (hash-)sample and applied
everywhere. The operator here is the textbook power iteration — v ←
normalize(Cᵀ(Cv)) over the CENTERED data C — re-expressed so every
intermediate is a BIGINT both engines reproduce bit-for-bit:

- coordinates quantize globally to 1e-4 fixed point (embeddings are
  unit-scale; |x_e4| ≤ ~2·10⁴ after centering);
- the per-vector score Σ c·v downshifts by 1e6 after the multiply, so
  a 64-dim row term never exceeds ~10¹²;
- the per-dim accumulation w downshifts by a power of two derived from
  bit_length(max|w|) before squaring (the qsketch msb trick), keeping
  Σw'² inside BIGINT at any dimension ≤ 64;
- normalization divides by the EXACT integer sqrt (mixture.isqrt);
- every signed division is sign-split (sign(x)·(|x| div d)) because
  Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors —
  they agree only on non-negative operands (the package-wide oracle
  discipline, see sampling.weighted_sample).

The contract is the ALGORITHM (``iters`` steps from the uniform unit
init), not mathematical convergence — deterministic, partition- and
engine-invariant, which is what makes it oracle-checkable. 3–5 steps
separate the principal direction on anything with a dominant eigenvalue
gap; callers needing certified convergence can raise ``iters``.

Scale shape: one posexplode of the training set, one 64-row mean table
(broadcast back), then per iteration exactly two aggregates — per-id
scores (uniform key) and per-dim sums (64 keys, map-side combinable) —
plus two 1-row reductions that stay in the plan (broadcast cross
joins, never collected). The centered relation is localCheckpointed
once and reused across iterations (the bpe/pagerank discipline); the
64-row v table is checkpointed per round so the plan stays linear in
``iters``. Numeric bound: the w accumulation overflows past ~3·10⁸
training rows — train on ``sampling.hash_sample`` below that (PCA
needs nowhere near it), apply to any corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.mixture import isqrt

__all__ = ["pca_components", "power_iteration_pc1", "project_components",
           "project_pc1", "random_projection"]

E4 = 10_000
E6 = 1_000_000
_W_BITS = 28


def _sgn(x: Column) -> Column:
    return (F.when(x < 0, F.lit(-1)).when(x > 0, F.lit(1))
            .otherwise(F.lit(0)).cast("long"))


def _sdiv(a: Column, b: Column) -> Column:
    """Truncating signed division with POSITIVE divisor ``b`` — the
    only signed-division form Spark div and DuckDB // agree on."""
    return _sgn(a) * F.call_function("div", F.abs(a), b)


def v0_e6(d: int) -> int:
    """Uniform unit init per dim: floor(sqrt(1e12 / d)) ≈ 1e6/√d."""
    return math.isqrt(10 ** 12 // d)


def _power_iterate(centered: DataFrame, d: int, iters: int) -> DataFrame:
    """``iters`` power steps from the uniform unit init over a
    ``(id, dim, c)`` centered relation; returns ``(dim, v_e6)``."""
    spark = centered.sparkSession
    v = spark.createDataFrame(
        [(i, v0_e6(d)) for i in range(d)], "dim int, v_e6 long")
    for _ in range(iters):
        sc = (centered.join(F.broadcast(v), "dim")
              .groupBy("id")
              .agg(F.sum(F.col("c") * F.col("v_e6")).alias("raw"))
              .select("id", _sdiv(F.col("raw"),
                                  F.lit(E6).cast("long")).alias("sc")))
        w = (centered.join(sc, "id")
             .groupBy("dim").agg(F.sum(F.col("c") * F.col("sc"))
                                 .alias("w")))
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mw"))
        # downshift divisor 2^max(0, bitlen(mw) - 28): keeps Σw'²
        # inside BIGINT; length(bin(x)) is the shared msb primitive
        shift = F.greatest(
            F.length(F.bin(F.greatest(F.col("mw"), F.lit(1))))
            - F.lit(_W_BITS), F.lit(0)).cast("int")
        p = F.call_function("shiftleft", F.lit(1).cast("long"), shift)
        w2 = (w.crossJoin(F.broadcast(mx))
              .select("dim", _sdiv(F.col("w"), p).alias("w2")))
        nrm = w2.agg(
            F.greatest(isqrt(F.sum(F.col("w2") * F.col("w2"))),
                       F.lit(1).cast("long")).alias("nrm"))
        v = (w2.crossJoin(F.broadcast(nrm))
             .select("dim",
                     _sdiv(F.col("w2") * F.lit(E6).cast("long"),
                           F.col("nrm")).alias("v_e6"))
             .localCheckpoint())
    return v


def _centered(df: DataFrame, vec_col: str, id_col: str):
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode(F.col(vec_col)).alias("dim", "x"))
          .select("id", "dim",
                  F.floor(F.col("x").cast("double") * E4).cast("long")
                  .alias("x4")))
    means = (ex.groupBy("dim")
             .agg(F.count("*").alias("n"), F.sum("x4").alias("s"))
             .select("dim", _sdiv(F.col("s"), F.col("n")).alias("mean_e4")))
    centered = (ex.join(F.broadcast(means), "dim")
                .select("id", "dim",
                        (F.col("x4") - F.col("mean_e4")).alias("c"))
                .localCheckpoint())
    return centered, means


def power_iteration_pc1(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        iters: int = 3) -> DataFrame:
    """First principal direction of the (centered) embedding matrix.

    Returns the 1-row-per-dimension table ``(dim, mean_e4, v_e6)``:
    the per-coordinate mean (1e-4 fixed point) and the unit component
    (1e-6 fixed point, Σv² ≈ 1e12). Feed it to :func:`project_pc1`.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    centered, means = _centered(df, vec_col, id_col)
    d = df.select(F.size(F.col(vec_col))).first()[0]
    v = _power_iterate(centered, d, iters)
    return (means.join(v, "dim")
            .select(F.col("dim").cast("long"), "mean_e4", "v_e6"))


def pca_components(df: DataFrame, k: int = 2, vec_col: str = "embedding",
                   id_col: str = "vec_id", iters: int = 3) -> DataFrame:
    """Top-``k`` principal directions via deflation.

    After each component ``v`` the data deflates exactly as power
    iteration saw it: ``c ← c − (Σc·v) · v div 1e12`` (the e4·e6 raw
    score times the e6 component, rescaled back to e4 — Hotelling
    deflation in the same fixed point, so component 2 is the principal
    direction of the residual). Output: ``(component, dim, mean_e4,
    v_e6)`` with ``component`` 1-based. Numeric bound: the deflation
    product |raw·v| ≤ ~1.3·10¹⁸ stays in BIGINT for dims ≤ 64.

    Same scale shape as :func:`power_iteration_pc1` per component; the
    deflated relation re-checkpoints so the plan stays linear in
    ``k × iters``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    centered, means = _centered(df, vec_col, id_col)
    d = df.select(F.size(F.col(vec_col))).first()[0]
    out = None
    for comp in range(1, k + 1):
        v = _power_iterate(centered, d, iters)
        piece = (means.join(v, "dim")
                 .select(F.lit(comp).cast("long").alias("component"),
                         F.col("dim").cast("long"), "mean_e4", "v_e6"))
        out = piece if out is None else out.unionByName(piece)
        if comp < k:
            raw = (centered.join(F.broadcast(v), "dim")
                   .groupBy("id")
                   .agg(F.sum(F.col("c") * F.col("v_e6")).alias("raw")))
            centered = (centered.join(raw, "id")
                        .join(F.broadcast(v), "dim")
                        .select("id", "dim",
                                (F.col("c") - _sdiv(
                                    F.col("raw") * F.col("v_e6"),
                                    F.lit(10 ** 12).cast("long")))
                                .alias("c"))
                        .localCheckpoint())
    return out


def project_pc1(df: DataFrame, component: DataFrame,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Per-vector score along a trained component: ``(id, pc1_e6)``
    where ``pc1_e6 = Σ(x_e4 - mean_e4)·v_e6 div 1e4`` — the centered
    projection in 1e-6 fixed point. The component broadcasts (|dims|
    rows); the projection itself is one explode + one per-id aggregate
    on the uniform id key, so applying a sampled-trained component to
    the full corpus costs one pass."""
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode(F.col(vec_col)).alias("dim", "x"))
          .select("id", "dim",
                  F.floor(F.col("x").cast("double") * E4).cast("long")
                  .alias("x4")))
    j = ex.join(F.broadcast(component.select(
        F.col("dim").cast("int").alias("dim"), "mean_e4", "v_e6")), "dim")
    raw = (j.groupBy("id")
           .agg(F.sum((F.col("x4") - F.col("mean_e4")) * F.col("v_e6"))
                .alias("raw")))
    return raw.select(F.col("id").alias(id_col),
                      _sdiv(F.col("raw"), F.lit(E4).cast("long"))
                      .alias("pc1_e6"))


def random_projection(df: DataFrame, out_dim: int,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      salt: str = "") -> DataFrame:
    """Johnson–Lindenstrauss sign projection: ``(id, out_dim) → y_e4``.

    The data-independent complement to :func:`power_iteration_pc1`:
    ``y_j = Σ_i x_i · s_ij`` with ``s_ij ∈ {−1, +1}`` (Achlioptas 2003
    — the database-friendly JL variant; sign matrices preserve pairwise
    distances within (1±ε) at out_dim = O(log n / ε²) WITHOUT looking
    at the data, so no training pass, no drift between corpus
    snapshots, and any engine can regenerate the matrix from the
    (dim, out_dim, salt) triple alone). Signs derive from the md5
    parity of ``i-j-salt`` — the package's engine-portable hash.

    Output is LONG form, one row per (id, out dimension):
    ``(id_col, j, y_e4)`` — exploded rather than an array column so
    the oracle's multiset compare sees scalar cells.

    Scale shape: zero shuffles beyond the final per-(id, j) map-side
    aggregate on the uniform id key — the explode-join-aggregate runs
    inside the scan stage; the sign "matrix" is an expression, never a
    materialized relation.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode(F.col(vec_col)).alias("dim", "x"))
          .select("id", "dim",
                  F.floor(F.col("x").cast("double") * E4).cast("long")
                  .alias("x4")))
    j = F.explode(F.sequence(F.lit(0), F.lit(int(out_dim) - 1))).alias("j")
    cells = ex.select("id", "dim", "x4", j)
    # sign = +1 iff the first hex digit of md5("<dim>-<j>-<salt>") is even
    digit = F.conv(F.substring(F.md5(F.concat_ws(
        "-", F.col("dim").cast("string"), F.col("j").cast("string"),
        F.lit(salt))), 1, 1), 16, 10).cast("long")
    sign = F.when(digit % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    return (cells.select("id", "j", (F.col("x4") * sign).alias("t"))
            .groupBy("id", "j").agg(F.sum("t").alias("y_e4"))
            .select(F.col("id").alias(id_col), F.col("j").cast("long"),
                    F.col("y_e4")))


def project_components(df: DataFrame, components: DataFrame,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Per-vector scores along EVERY trained component — the k-dim
    compressed representation, long form: ``(id, component, score_e6)``
    with ``score_e6 = Σ(x_e4 − mean_e4)·v_e6 div 1e4`` per component.

    ``components`` is :func:`pca_components` output. NOTE the scores
    are projections of the ORIGINAL centered data onto each direction
    (the standard PCA embedding), not the residual chain the trainer
    deflated through — for near-orthogonal components the two agree up
    to the deflation error. The component table broadcasts (k·|dims|
    rows); the projection is one explode + one (id, component)
    aggregate on the uniform id key — one corpus pass regardless of k.
    """
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode(F.col(vec_col)).alias("dim", "x"))
          .select("id", "dim",
                  F.floor(F.col("x").cast("double") * E4).cast("long")
                  .alias("x4")))
    comp = components.select(F.col("component"),
                             F.col("dim").cast("int").alias("dim"),
                             "mean_e4", "v_e6")
    j = ex.join(F.broadcast(comp), "dim")
    raw = (j.groupBy("id", "component")
           .agg(F.sum((F.col("x4") - F.col("mean_e4")) * F.col("v_e6"))
                .alias("raw")))
    return raw.select(F.col("id").alias(id_col), F.col("component"),
                      _sdiv(F.col("raw"), F.lit(E4).cast("long"))
                      .alias("score_e6"))
