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

__all__ = ["DEPTH", "HLL_B", "QS_SUB", "cms_build", "cms_estimate", "hll_overlap",
           "hll_estimate", "hll_registers", "qsketch_build",
           "qsketch_quantiles"]

DEPTH = 4

# HyperLogLog geometry: m = 2^HLL_B buckets. b=6 (m=64) keeps the
# integer estimator's numerator ALPHA_E6 * m^2 * 2^CAP inside BIGINT
# (3.12e18 < 2^63); the price is the standard ±1.04/sqrt(64) ≈ 13%
# relative error — the right trade for a monitoring-grade gauge whose
# state is 64 rows per group no matter the corpus size.
HLL_B = 6
_HLL_M = 1 << HLL_B           # 64 buckets
_HLL_W = 60 - HLL_B           # value bits left after the bucket: 54
_HLL_ALPHA_E6 = 709_000       # alpha_64 = 0.709 (Flajolet et al. 2007)
_HLL_CAP = 30                 # fixed-point: bucket j contributes
_HLL_ONE = 1 << _HLL_CAP      # 2^(CAP-rho_j), rho > CAP truncates to 0
_HLL_NUM = _HLL_ALPHA_E6 * _HLL_M * _HLL_M * _HLL_ONE  # ≈3.12e18, fits


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


# --------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet, Fusy, Gandouet, Meunier 2007)
# --------------------------------------------------------------------------
#
# Exact distinct counts over 100 TB shuffle the full key domain (every
# distinct URL / token / doc hash crosses the wire once). The HLL
# register table is the fixed-size alternative: 2^b rows per group,
# merged by the same max-aggregate that builds it — union two days'
# registers and max-combine, and the estimate of the union falls out.
#
# Engine portability: the register (rho = leading-zero rank) is
# computed from the md5-derived 60-bit integer via ``bin()`` — both
# Spark and DuckDB render a non-negative BIGINT as a minimal binary
# string, so ``rho = W + 1 - length(bin(w))`` is the same integer on
# both sides (w = 0, the all-zero suffix, is the documented special
# case). The estimator itself is the RAW HLL formula in fixed point:
#
#   est = ALPHA_E6 * m^2 * 2^CAP  div  S  div  10^6,
#   S   = sum over present buckets of 2^(CAP - rho)  [0 when rho > CAP]
#       + 2^CAP per absent bucket (rho = 0).
#
# 2^(CAP-rho) is exact for rho <= CAP (a right shift, no truncation);
# rho > CAP truncates its ~2^-31 contribution to 0 — negligible mass.
# The small-range linear-counting and 2^32 large-range corrections are
# deliberately OUT of the integer subset (both need a cross-engine
# ``ln``); the raw estimator overestimates below ~2.5m distincts, which
# callers gauge with the exact count beside it (see q_hll_distinct).


def _hll_probe(term: Column, salt: str = "") -> Column:
    """struct(bucket, rho) for one item: one md5, split into a bucket
    (low b bits via %, exact in both engines on non-negative operands)
    and a W-bit value whose leading-zero rank is the register."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"hll{salt}:"), term)), 1, 15), 16, 10
    ).cast("long")
    # integer div, NOT floor(h / m): the float path rounds through a
    # 53-bit double, corrupting the low bits of a 60-bit h
    w = F.call_function("div", h, F.lit(_HLL_M))
    rho = F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin(w)))
    return F.struct((h % F.lit(_HLL_M)).alias("bucket"),
                    rho.cast("long").alias("rho"))


def hll_registers(df: DataFrame, term_col: str = "term",
                  group_cols: tuple = (), salt: str = "") -> DataFrame:
    """``(group..., bucket, rho)`` — the HLL register table, one
    max-aggregate whose key space is |groups| × 2^b. Map-side combine
    absorbs the corpus: each task reduces its items to its local
    registers before anything shuffles. Re-aggregating the union of two
    register tables with the same max is the sketch MERGE."""
    g = [F.col(c) for c in group_cols]
    probe = _hll_probe(F.col(term_col), salt).alias("_p")
    staged = df.select(*g, probe)
    return (staged.groupBy(*group_cols, F.col("_p.bucket").alias("bucket"))
            .agg(F.max("_p.rho").alias("rho")))


def hll_estimate(registers: DataFrame,
                 group_cols: tuple = ()) -> DataFrame:
    """``(group..., est_distinct)`` from a register table.

    One aggregate over <= 2^b rows per group. Absent buckets (never hit
    by any item) contribute rho = 0, folded in arithmetically as
    ``(m - n_present) * 2^CAP`` — the register table never needs
    densifying. Integer op order (div by S, then by 10^6) is part of
    the contract so the DuckDB twin reproduces the exact value.
    """
    contrib = F.when(F.col("rho") <= _HLL_CAP,
                     F.call_function("shiftright", F.lit(_HLL_ONE),
                                     F.col("rho").cast("int"))
                     ).otherwise(F.lit(0)).cast("long")
    agg = (registers.groupBy(*group_cols)
           .agg(F.sum(contrib).alias("_s_present"),
                F.count("*").alias("_n_present")))
    s = (F.col("_s_present")
         + (F.lit(_HLL_M) - F.col("_n_present")) * F.lit(_HLL_ONE))
    est = F.call_function(
        "div", F.call_function("div", F.lit(_HLL_NUM), s), F.lit(10 ** 6))
    keep = [F.col(c) for c in group_cols]
    return agg.select(*keep, est.alias("est_distinct"))


# --------------------------------------------------------------------------
# Log-binned quantile sketch (sub-divided powers of two)
# --------------------------------------------------------------------------
#
# Exact quantiles over an UNBOUNDED value domain need a global sort or
# a full value-frequency table (textstats.length_quantiles is the exact
# path — right when the domain is bounded, wrong for e.g. byte sizes up
# to 2^50). The sketch here is the histogram trick behind HDR-histogram
# and DDSketch (Masson, Rim, Lee VLDB 2019): bucket every value by its
# most-significant bit plus the next QS_SUB bits, giving a guaranteed
# RELATIVE error — the bucket's lower bound is within a factor
# (1 + 2^-QS_SUB), i.e. 6.25 % at QS_SUB=4 — with a state of at most
# 16 + 16*63 rows REGARDLESS of corpus size. Build is one map-side-
# combinable groupBy; merge of two sketches is the same groupBy-sum;
# query touches only the grid.
#
# Engine portability: msb = length(bin(x)) - 1 (both engines render a
# non-negative BIGINT minimally), sub-bin via right shift, all ranks in
# ceil fixed-point — every output is an exact integer both engines
# agree on.

QS_SUB = 4
_QS_M = 1 << QS_SUB


def _qs_bucket(x: Column) -> Column:
    """Monotone bucket id: values < 2^QS_SUB get exact unit bins
    [0, 2^QS_SUB); larger x maps to msb*2^QS_SUB + (top QS_SUB+1 bits
    - 2^QS_SUB). Monotone in x, so cumulative counts over bucket order
    are cumulative counts over value order."""
    msb = (F.length(F.bin(x)) - 1).cast("long")
    top = F.call_function("shiftright", x,
                          (msb - F.lit(QS_SUB)).cast("int"))
    return (F.when(x < _QS_M, x)
            .otherwise(msb * _QS_M + top - _QS_M).cast("long"))


def _qs_lower(bucket: Column) -> Column:
    """Exact lower bound of a bucket's value range (the estimate we
    report: an under-estimate by at most a factor 1 + 2^-QS_SUB)."""
    msb = F.call_function("div", bucket, F.lit(_QS_M))
    rem = bucket % F.lit(_QS_M)
    return (F.when(bucket < _QS_M, bucket)
            .otherwise(F.call_function(
                "shiftleft", (rem + F.lit(_QS_M)).cast("long"),
                (msb - F.lit(QS_SUB)).cast("int"))).cast("long"))


def qsketch_build(df: DataFrame, value_col: str) -> DataFrame:
    """``(bucket, cnt)`` histogram cells for a non-negative integer
    column; NULL and negative values are excluded (documented domain —
    sizes, counts, latencies). Key space <= 16*64 regardless of input,
    so the exchange moves per-task grids, never rows."""
    x = F.col(value_col).cast("long")
    staged = df.where(x >= 0).select(_qs_bucket(x).alias("bucket"))
    return staged.groupBy("bucket").agg(F.count("*").alias("cnt"))


def qsketch_quantiles(cells: DataFrame, qs_e6: list[int]) -> DataFrame:
    """``(q_e6, rank, est_lo)`` for each requested quantile.

    rank = ceil(n * q / 1e6) clamped to >= 1; est_lo = lower bound of
    the first bucket whose cumulative count reaches the rank. Runs
    entirely on the <=1040-row grid: the single-partition cumulative
    window is over the SKETCH, which is the point of having one.
    """
    from pyspark.sql import Window
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (cells.select("bucket", "cnt")
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("_n", F.sum("cnt").over(
               Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing))))
    qdf = cum.sparkSession.createDataFrame(
        [(int(q),) for q in qs_e6], "q_e6 long")
    ranked = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "rank", F.greatest(F.lit(1), F.expr("(_n * q_e6 + 999999) div 1000000")))
    hit = ranked.where(F.col("cum") >= F.col("rank"))
    return (hit.groupBy("q_e6")
            .agg(F.max("rank").alias("rank"),
                 F.min(_qs_lower(F.col("bucket"))).alias("est_lo")))


def hll_overlap(tokens: DataFrame, group_col: str = "lang",
                term_col: str = "term", salt: str = "",
                max_groups: int = 256) -> DataFrame:
    """Pairwise distinct-set overlap between groups from HLL sketches
    alone: per unordered group pair, ``est_a``, ``est_b``, the union
    estimate from the MAX-merged registers (the HLL merge law), and
    the inclusion-exclusion intersection ``est_a + est_b − est_union``
    clamped at 0 — the sketch-algebra answer to "how much vocabulary
    do these two languages/sources share" without ever materializing
    the sets. Output: ``(group_a, group_b, est_a, est_b, est_union,
    est_intersection, jaccard_est_e6)`` with group_a < group_b.

    Standard caveat, documented: inclusion-exclusion inherits BOTH
    sketches' error, so small true intersections can estimate 0 (the
    clamp) — use the exact `corpstats.source_sketch` KMV path when the
    overlap itself must be tight. Scale shape: ONE register build over
    the corpus (map-side combined, |groups|·64 rows), then everything
    is register-algebra; the pair frame is counted and guarded by
    ``max_groups`` before the quadratic join (`source_overlap`
    discipline).
    """
    regs = hll_registers(tokens, term_col, (group_col,), salt) \
        .withColumnRenamed(group_col, "g").localCheckpoint()
    n_g = regs.select("g").distinct().count()
    if n_g > max_groups:
        raise ValueError(
            f"hll_overlap: {n_g} groups exceed max_groups={max_groups};"
            " raise it deliberately or pre-group")
    singles = (hll_estimate(regs.withColumnRenamed("g", "grp"), ("grp",))
               .withColumnRenamed("grp", "g"))
    gs = regs.select("g").distinct()
    pairs = (gs.select(F.col("g").alias("ga"))
             .crossJoin(gs.select(F.col("g").alias("gb")))
             .where(F.col("ga") < F.col("gb")))
    merged = (pairs.join(regs.withColumnRenamed("g", "ga"), "ga")
              .unionByName(
                  pairs.join(regs.withColumnRenamed("g", "gb"), "gb")
                  .select("ga", "gb", "bucket", "rho"))
              .groupBy("ga", "gb", "bucket")
              .agg(F.max("rho").alias("rho")))
    uni = (hll_estimate(merged, ("ga", "gb"))
           .withColumnRenamed("est_distinct", "est_union"))
    out = (uni
           .join(singles.select(F.col("g").alias("ga"),
                                F.col("est_distinct").alias("est_a")),
                 "ga")
           .join(singles.select(F.col("g").alias("gb"),
                                F.col("est_distinct").alias("est_b")),
                 "gb"))
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0))
    return out.select(
        F.col("ga").alias("group_a"), F.col("gb").alias("group_b"),
        "est_a", "est_b", "est_union",
        inter.cast("long").alias("est_intersection"),
        F.expr("greatest(est_a + est_b - est_union, 0) * 1000000"
               " div nullif(est_union, 0)").cast("long")
        .alias("jaccard_est_e6"))
