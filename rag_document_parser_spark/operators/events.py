"""Event-stream analytics: sessionization and as-of joins.

A crawl/training pipeline's telemetry side (fetch logs, interaction
events, pipeline-stage metrics) is a timestamped stream keyed by an
entity. Two operators Spark lacks as built-ins:

- ``sessionize`` — gap-based session assignment (a new session starts
  when an entity is idle longer than ``gap_s``), the standard
  log-analytics primitive (e.g. 30-minute web sessions).
- ``asof_join`` — for every left event, the most recent right event at
  or before it for the same entity. Implemented as the UNION-AND-CARRY
  plan: tag both sides, one per-entity ordered window, carry the last
  non-null right payload forward. One shuffle on the entity key, no
  range-join row explosion (a naive ``left.ts >= right.ts`` join is
  O(|L|·|R|) per entity before its filter).

Scale & skew: both operators shuffle once, keyed by the entity. The
per-entity window is inherently sequential — session continuity and
as-of carry are order-dependent — so the straggler bound is the max
events per entity. At web scale that key is retention-bounded for
humans; a runaway bot key shows up as one long task, and the cure is
upstream per-entity capping (hash_sample on the entity), not salting
(salting would sever session continuity mid-stream).

Determinism: timestamps enter integer space as ``unix_micros`` (the
session runs in UTC; DuckDB's ``epoch_us`` reads the same parquet
micros), and every window orders by ``(ts_us, event_id)`` so ties are
stable on any partitioning. The DuckDB oracle for the as-of query uses
the engine's native ASOF JOIN — an independent algorithm agreeing on
the same semantics.

The reference has no event surface (documents only,
/root/reference/main.py:72-147); this is a SURVEY §6 pipeline-telemetry
tier over the driver testdata's ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["ab_test", "asof_join", "cohort_retention",
           "event_transitions", "funnel_counts", "session_stats",
           "sessionize"]


def _ts_us(ts_col: str) -> Column:
    # cast through TIMESTAMP: the parquet column arrives TIMESTAMP_NTZ
    # and unix_micros wants an instant; the session TZ is UTC so the
    # micros equal DuckDB's epoch_us of the same parquet value
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(df: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """``(event_id, user, ts_us, session_idx)`` — gap-based sessions.

    ``session_idx`` numbers an entity's sessions 1..n in time order: a
    running sum of new-session flags (first event, or idle gap strictly
    greater than ``gap_s``) over one per-entity window. The lag and the
    running sum share one partitioning and sort order, so the physical
    plan is two stacked Window ops over a SINGLE exchange + sort
    (asserted by test_sessionize_plan_shape).
    """
    staged = df.select(F.col(id_col).alias("event_id"),
                       F.col(user_col).alias("user"),
                       _ts_us(ts_col).alias("ts_us"))
    w = Window.partitionBy("user").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("ts_us") - prev > F.lit(gap_s * 1_000_000)),
        F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy("user").orderBy("ts_us", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = staged.select("event_id", "user", "ts_us",
                        new_session.alias("_new"))
    return out.select("event_id", "user", "ts_us",
                      F.sum("_new").over(run).cast("long")
                      .alias("session_idx"))


def session_stats(sessions: DataFrame) -> DataFrame:
    """``(user, session_idx, n_events, start_us, end_us, duration_s)``
    per session — one map-side-combinable aggregate over the
    ``sessionize`` output (the key (user, session_idx) is unique and
    uniform, so no skew beyond the entity's own session length)."""
    return (sessions.groupBy("user", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts_us").alias("start_us"),
                 F.max("ts_us").alias("end_us"))
            .select("user", "session_idx", "n_events", "start_us", "end_us",
                    F.call_function(
                        "div", F.col("end_us") - F.col("start_us"),
                        F.lit(1_000_000)).alias("duration_s")))


def asof_join(left: DataFrame, right: DataFrame,
              user_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id") -> DataFrame:
    """For every left event, the most recent right event at or before
    it (same entity): ``(event_id, user, ts_us, asof_id, asof_ts_us,
    gap_us)`` — asof columns null when no prior right event exists.

    UNION-AND-CARRY: right rows sort before left rows at equal
    timestamps (so "at or before" includes ties), and one
    ``last(..., ignorenulls)`` window carries the latest right id/ts
    onto every left row. Cost: one exchange on the entity key over
    |L| + |R| rows — independent of how many right events precede each
    left one.
    """
    l_ = left.select(F.col(id_col).alias("event_id"),
                     F.col(user_col).alias("user"),
                     _ts_us(ts_col).alias("ts_us"),
                     F.lit(1).alias("_side"))
    r_ = right.select(F.col(id_col).alias("event_id"),
                      F.col(user_col).alias("user"),
                      _ts_us(ts_col).alias("ts_us"),
                      F.lit(0).alias("_side"))
    u = l_.unionByName(r_)
    w = (Window.partitionBy("user")
         .orderBy("ts_us", "_side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r_id = F.when(F.col("_side") == 0, F.col("event_id"))
    r_ts = F.when(F.col("_side") == 0, F.col("ts_us"))
    carried = u.select(
        "event_id", "user", "ts_us", "_side",
        F.last(r_id, ignorenulls=True).over(w).alias("asof_id"),
        F.last(r_ts, ignorenulls=True).over(w).alias("asof_ts_us"))
    return (carried.where(F.col("_side") == 1)
            .select("event_id", "user", "ts_us", "asof_id", "asof_ts_us",
                    (F.col("ts_us") - F.col("asof_ts_us")).alias("gap_us")))


def funnel_counts(df: DataFrame, steps: list,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  id_col: str = "event_id") -> DataFrame:
    """Strict ordered-funnel analysis: how many entities completed
    step 1, then step 2 AFTER it, then step 3 after that — the classic
    conversion query (view → click → signup → purchase) that a naive
    per-step join answers wrongly (it ignores order). One row per
    funnel step: ``(step_idx, step, n_users, conv_from_prev_e6,
    conv_from_first_e6)``.

    Semantics: per entity, events not naming a funnel step are
    ignored; the remaining events replay in (ts, event_id) order and a
    counter advances only when the event is exactly the NEXT step —
    out-of-order or repeated steps neither advance nor reset (the
    standard strict-funnel reading). ``n_users`` counts entities whose
    counter reached the step; conversions are fixed-point ratios
    against the previous step and step 1.

    Scale shape: one scan-local filter + step mapping, one groupBy on
    the uniform entity key collecting the entity's own (bounded)
    step events, the replay as a row-local ``aggregate`` fold, then a
    |steps|-row frame with one cumulative window — the corpus never
    sorts globally and the final relation is funnel-sized.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("funnel_counts needs at least one step")
    sidx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps, start=1))):
        sidx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(sidx)
    staged = (df.select(F.col(user_col).alias("user"),
                        _ts_us(ts_col).alias("ts_us"),
                        F.col(id_col).alias("event_id"),
                        sidx.alias("_s"))
              .where(F.col("_s").isNotNull()))
    per_user = (staged.groupBy("user")
                .agg(F.array_sort(F.collect_list(F.struct(
                    "ts_us", "event_id", "_s"))).alias("_ev")))
    reached = per_user.select(F.expr("""
        aggregate(_ev, 0, (acc, e) ->
                  IF(e._s = acc + 1, acc + 1, acc))
    """).alias("_r"))
    dist = reached.groupBy("_r").agg(F.count("*").cast("long")
                                     .alias("_n"))
    spark = df.sparkSession
    frame = spark.range(1, k + 1).select(
        F.col("id").cast("int").alias("step_idx"))
    from pyspark.sql import Window as _W
    wcum = (_W.orderBy(F.col("step_idx").desc())
            .rowsBetween(_W.unboundedPreceding, _W.currentRow))
    per_step = (frame.join(dist, frame["step_idx"] == dist["_r"], "left")
                .select("step_idx",
                        F.coalesce("_n", F.lit(0)).alias("_n")))
    cum = per_step.select(
        "step_idx", F.sum("_n").over(wcum).cast("long").alias("n_users"))
    wprev = _W.orderBy("step_idx")
    names = F.element_at(F.lit([str(s) for s in steps]),
                         F.col("step_idx"))
    return (cum.select(
        F.col("step_idx").cast("long").alias("step_idx"),
        names.alias("step"), "n_users",
        F.lag("n_users").over(wprev).alias("_prev"),
        F.first("n_users").over(wprev).alias("_first"))
        .select("step_idx", "step", "n_users",
                F.expr("n_users * 1000000 div nullif(_prev, 0)")
                .cast("long").alias("conv_from_prev_e6"),
                F.expr("n_users * 1000000 div nullif(_first, 0)")
                .cast("long").alias("conv_from_first_e6")))


def cohort_retention(df: DataFrame, bucket_s: int = 7 * 86_400,
                     user_col: str = "user_id", ts_col: str = "ts",
                     max_offset: int = 12) -> DataFrame:
    """Cohort retention matrix: entities grouped by their FIRST-seen
    time bucket (default weekly), then for each later bucket offset
    the fraction of the cohort still active — the telemetry companion
    to ``funnel_counts``. One row per (cohort, offset) with activity:
    ``(cohort_bucket, bucket_offset, cohort_size, n_active,
    retention_e6)`` (the offset is in BUCKET units — weeks only at the
    default ``bucket_s``; a daily ``bucket_s=86400`` makes it a day
    offset); offset 0 is the cohort itself (retention 1e6 by
    construction), offsets beyond ``max_offset`` are dropped (the
    matrix stays bounded however long the log runs).

    Buckets are integer epoch-microsecond floors (``ts_us div
    bucket_us``) — engine-exact, no calendar arithmetic. Scale shape:
    one min-aggregate on the entity key (first-seen), one distinct on
    (entity, bucket), one broadcast-size cohort join keyed by the
    entity, and a final (cohort, offset) aggregate — every key uniform,
    the output bounded by cohorts × max_offset.
    """
    us = int(bucket_s) * 1_000_000
    staged = df.select(F.col(user_col).alias("user"),
                       _ts_us(ts_col).alias("ts_us"))
    first = (staged.groupBy("user")
             .agg(F.expr(f"min(ts_us) div {us}").alias("_cb")))
    act = (staged.select("user", F.expr(f"ts_us div {us}").alias("_ab"))
           .distinct())
    j = (act.join(first, "user")
         .select("_cb", (F.col("_ab") - F.col("_cb")).alias("_off"))
         .where((F.col("_off") >= 0) & (F.col("_off") <= max_offset)))
    cohort_sizes = first.groupBy("_cb").agg(
        F.count("*").cast("long").alias("cohort_size"))
    cells = (j.groupBy("_cb", "_off")
             .agg(F.count("*").cast("long").alias("n_active")))
    return (cells.join(cohort_sizes, "_cb")
            .select(F.col("_cb").cast("long").alias("cohort_bucket"),
                    F.col("_off").cast("long").alias("bucket_offset"),
                    "cohort_size", "n_active",
                    F.expr("n_active * 1000000 div cohort_size")
                    .cast("long").alias("retention_e6")))


def ab_test(df: DataFrame, variant_col: str = "variant",
            converted_col: str = "converted") -> DataFrame:
    """Two-variant conversion comparison with the exact 2×2 chi-square
    statistic — the experiment read-out a telemetry pipeline ships
    beside its funnel. One row: ``(n_a, n_b, conv_a, conv_b,
    rate_a_e6, rate_b_e6, chi2_e6, significant_95)``.

    The 2×2 shortcut makes the statistic exactly rational — no
    variance square roots: with a/b converted/unconverted in variant A
    and c/d in variant B,

        chi2 = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))

    computed in decimal(38,0) and floored to e6 fixed point. Numeric
    bound, documented not silent: ``n·det²·1e6`` must fit
    decimal(38,0), which holds to roughly n ≈ 4·10⁶ observations;
    past that the decimal overflows LOUDLY. The distributed work —
    the four-cell count — scales unbounded; at larger n collect the
    four cells (four scalars) and evaluate the statistic with
    arbitrary-precision ints driver-side.
    ``significant_95`` compares against the χ²₁ 95% critical value
    3.841 (3_841_000 in e6 — the textbook constant, not a computed
    CDF). Degenerate margins (an empty variant or an all/none
    conversion column) yield NULL chi2 and ``significant_95 = false``
    (an undefined test never claims significance), documented over
    hidden.

    One map-side-combinable aggregate; nothing else moves.
    """
    isa = F.col(variant_col) == F.lit("a")
    conv = F.col(converted_col).cast("long")
    agg = df.agg(
        F.sum(F.when(isa, conv).otherwise(F.lit(0))).cast("long")
        .alias("_a"),
        F.sum(F.when(isa, 1 - conv).otherwise(F.lit(0))).cast("long")
        .alias("_b"),
        F.sum(F.when(~isa, conv).otherwise(F.lit(0))).cast("long")
        .alias("_c"),
        F.sum(F.when(~isa, 1 - conv).otherwise(F.lit(0))).cast("long")
        .alias("_d"))
    chi2 = F.expr("""
      CASE WHEN (_a+_b) > 0 AND (_c+_d) > 0
                AND (_a+_c) > 0 AND (_b+_d) > 0
        THEN cast((_a+_b+_c+_d)
             * power_det * power_det * 1000000
             div (cast(_a+_b as decimal(38,0)) * (_c+_d)
                  * (_a+_c) * (_b+_d)) as bigint)
      END
    """)
    return (agg
            .withColumn("power_det", F.expr(
                "cast(_a as decimal(38,0)) * _d"
                " - cast(_b as decimal(38,0)) * _c"))
            .select(
                (F.col("_a") + F.col("_b")).alias("n_a"),
                (F.col("_c") + F.col("_d")).alias("n_b"),
                F.col("_a").alias("conv_a"), F.col("_c").alias("conv_b"),
                F.expr("_a * 1000000 div nullif(_a + _b, 0)")
                .cast("long").alias("rate_a_e6"),
                F.expr("_c * 1000000 div nullif(_c + _d, 0)")
                .cast("long").alias("rate_b_e6"),
                chi2.alias("chi2_e6"))
            .withColumn("significant_95",
                        F.coalesce(F.col("chi2_e6") >= 3_841_000,
                                   F.lit(False))))


def event_transitions(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order transition matrix over per-entity event sequences —
    the process-mining primitive behind "what do users do after X".
    One row per observed (from_type, to_type): ``(from_type, to_type,
    n, p_e6)`` with ``p_e6`` the row-normalized transition probability
    ``n(from→to) · 1e6 div n(from→·)`` in fixed point.

    Transitions pair each event with the entity's NEXT event in
    (ts, event_id) order (the deterministic tie-break every window in
    this repo uses); an entity's last event emits none. One
    entity-keyed window (the ``sessionize`` exchange), one pair
    aggregate on the bounded (from, to) type-pair key, one broadcast
    row-total join.
    """
    staged = df.select(F.col(user_col).alias("user"),
                       _ts_us(ts_col).alias("ts_us"),
                       F.col(id_col).alias("event_id"),
                       F.col(type_col).alias("_t"))
    w = Window.partitionBy("user").orderBy("ts_us", "event_id")
    pairs = (staged.select(F.col("_t").alias("from_type"),
                           F.lead("_t").over(w).alias("to_type"))
             .where(F.col("to_type").isNotNull()))
    cnt = (pairs.groupBy("from_type", "to_type")
           .agg(F.count("*").cast("long").alias("n")))
    totals = cnt.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (cnt.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n",
                    F.expr("n * 1000000 div _tot").cast("long")
                    .alias("p_e6")))
