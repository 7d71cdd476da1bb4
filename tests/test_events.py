"""Sessionization + as-of join (operators/events.py): hand-computed
fixtures for gap semantics (strictly-greater boundary, per-user
isolation, tie stability), as-of carry including equal-timestamp ties
and no-prior-event nulls, and a brute-force twin on a denser corpus."""

import datetime as dt

from pyspark.sql import functions as F

from rag_document_parser_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, user, sec, typ="x"):
    return (eid, T0 + dt.timedelta(seconds=sec), user, typ)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def test_sessionize_gap_boundary_and_isolation(spark):
    # gap=100s: a gap of exactly 100 stays in-session (strictly greater
    # starts a new one); users never share sessions
    rows = [_ev(1, 7, 0), _ev(2, 7, 100), _ev(3, 7, 201),
            _ev(4, 8, 150)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["event_id"]: (r["user"], r["session_idx"])
           for r in sessionize(df, gap_s=100).collect()}
    assert got[1] == (7, 1)
    assert got[2] == (7, 1)      # gap == 100 -> same session
    assert got[3] == (7, 2)      # gap 101 > 100 -> new session
    assert got[4] == (8, 1)


def test_session_stats_duration_and_counts(spark):
    rows = [_ev(1, 7, 0), _ev(2, 7, 50), _ev(3, 7, 95),
            _ev(4, 7, 1000)]
    df = spark.createDataFrame(rows, SCHEMA)
    stats = {(r["user"], r["session_idx"]): r
             for r in session_stats(sessionize(df, gap_s=100)).collect()}
    s1 = stats[(7, 1)]
    assert s1["n_events"] == 3 and s1["duration_s"] == 95
    s2 = stats[(7, 2)]
    assert s2["n_events"] == 1 and s2["duration_s"] == 0


def test_sessionize_brute_force_twin(spark):
    # 3 users x 40 events at varying strides; python twin recomputes
    rows, eid = [], 0
    for u in range(3):
        t = 0
        for i in range(40):
            t += (i * 7 + u * 13) % 240
            rows.append(_ev(eid, u, t))
            eid += 1
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap_s=120).collect()}
    by_user = {}
    for (e, ts, u, _t) in rows:
        by_user.setdefault(u, []).append((ts, e))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sidx, prev = 0, None
        for ts, e in evs:
            if prev is None or (ts - prev).total_seconds() > 120:
                sidx += 1
            want[e] = sidx
            prev = ts
    assert got == want


def test_asof_join_carry_ties_and_nulls(spark):
    clicks = spark.createDataFrame(
        [_ev(10, 7, 50, "click"), _ev(11, 7, 200, "click"),
         _ev(12, 8, 500, "click")], SCHEMA)
    errors = spark.createDataFrame(
        [_ev(20, 7, 40, "error"),    # before any click -> null
         _ev(21, 7, 200, "error"),   # tie with click 11 -> included
         _ev(22, 7, 300, "error"),   # after click 11
         _ev(23, 9, 100, "error")],  # user with no clicks -> null
        SCHEMA)
    got = {r["event_id"]: r for r in asof_join(errors, clicks).collect()}
    assert got[20]["asof_id"] is None and got[20]["gap_us"] is None
    assert got[21]["asof_id"] == 11 and got[21]["gap_us"] == 0
    assert got[22]["asof_id"] == 11
    assert got[22]["gap_us"] == 100 * 1_000_000
    assert got[23]["asof_id"] is None


def test_asof_join_brute_force_twin(spark):
    import random  # deterministic: seeded
    rng = random.Random(7)
    right = [(100 + i, T0 + dt.timedelta(seconds=rng.randrange(3600)),
              rng.randrange(5), "r") for i in range(60)]
    left = [(500 + i, T0 + dt.timedelta(seconds=rng.randrange(3600)),
             rng.randrange(5), "l") for i in range(60)]
    got = {r["event_id"]: (r["asof_id"], r["gap_us"]) for r in asof_join(
        spark.createDataFrame(left, SCHEMA),
        spark.createDataFrame(right, SCHEMA)).collect()}
    for (eid, ts, u, _t) in left:
        prior = [(rts, rid) for (rid, rts, ru, _x) in right
                 if ru == u and rts <= ts]
        if not prior:
            assert got[eid] == (None, None), eid
        else:
            bts, bid = max(prior)
            assert got[eid] == (
                bid, int((ts - bts).total_seconds() * 1_000_000)), eid


def test_sessionize_plan_shape(spark):
    # the lag and the running sum share one partitioning + sort order:
    # the physical plan must pay exactly ONE exchange and ONE sort, no
    # matter how Catalyst stacks the Window ops on top
    import re
    rows = [_ev(i, i % 3, i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = (sessionize(df, gap_s=100)
            ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert plan.count("Sort [") == 1, plan


def test_asof_join_plan_shape(spark):
    # union-and-carry: one entity-keyed exchange over |L|+|R| rows and
    # one Window; NO join node of any kind (the naive range join this
    # plan replaces would show as Sort/BroadcastNestedLoop join here)
    import re
    l = spark.createDataFrame([_ev(i, i % 3, i * 10) for i in range(20)],
                              SCHEMA)
    r = spark.createDataFrame([_ev(100 + i, i % 3, i * 7)
                               for i in range(20)], SCHEMA)
    plan = asof_join(l, r)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"\bWindow \[", plan)) == 1, plan
    assert "Join" not in plan, plan


# ---- strict ordered funnel ----------------------------------------------

def test_funnel_strict_order_semantics(spark):
    from rag_document_parser_spark.operators.events import funnel_counts
    import datetime as dt
    T = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, T(1), 1, "view"), (2, T(2), 1, "click"),
        (3, T(3), 1, "purchase"),                  # u1: full funnel
        (4, T(1), 2, "view"), (5, T(2), 2, "purchase"),   # u2: skips
        (6, T(1), 3, "click"), (7, T(2), 3, "view"),      # u3: reversed
        (8, T(1), 4, "view"), (9, T(2), 4, "click"),      # u4: two steps
        (10, T(1), 5, "error"),                    # u5: never enters
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = [(r["step_idx"], r["step"], r["n_users"],
            r["conv_from_prev_e6"], r["conv_from_first_e6"])
           for r in funnel_counts(df, ["view", "click", "purchase"])
           .orderBy("step_idx").collect()]
    assert got == [(1, "view", 4, None, 1_000_000),
                   (2, "click", 2, 500_000, 500_000),
                   (3, "purchase", 1, 500_000, 250_000)]


def test_funnel_partition_invariance(spark):
    from rag_document_parser_spark.operators.events import funnel_counts
    import datetime as dt
    rows = [(i, dt.datetime(2026, 1, 1, 0, i % 50), i % 9,
             ["view", "click", "signup", "purchase", "error"][i % 5])
            for i in range(120)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    steps = ["view", "click", "signup", "purchase"]
    a = sorted(map(tuple, funnel_counts(df, steps).collect()))
    b = sorted(map(tuple, funnel_counts(df.repartition(7), steps)
                   .collect()))
    assert a == b


# ---- cohort retention ----------------------------------------------------

def test_cohort_retention_matrix(spark):
    from rag_document_parser_spark.operators.events import cohort_retention
    import datetime as dt
    D = lambda d, h=0: dt.datetime(2026, 1, 1 + d, h)  # noqa: E731
    # cohort day0: u1 active days 0,1,2; u2 active day 0 only
    # cohort day1: u3 active days 1,3
    rows = [(1, D(0), 1, "view"), (2, D(1), 1, "view"),
            (3, D(2), 1, "view"), (4, D(0, 5), 2, "view"),
            (5, D(1), 3, "view"), (6, D(3), 3, "view")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {(r["cohort_bucket"] - 20454, r["bucket_offset"]):
           (r["cohort_size"], r["n_active"], r["retention_e6"])
           for r in cohort_retention(df, bucket_s=86_400).collect()}
    base = min(k[0] for k in got)
    got = {(c - base, o): v for (c, o), v in got.items()}
    assert got[(0, 0)] == (2, 2, 1_000_000)
    assert got[(0, 1)] == (2, 1, 500_000)
    assert got[(0, 2)] == (2, 1, 500_000)
    assert got[(1, 0)] == (1, 1, 1_000_000)
    assert got[(1, 2)] == (1, 1, 1_000_000)
    assert (1, 1) not in got                      # u3 idle day 2


# ---- 2x2 chi-square A/B test --------------------------------------------

def test_ab_test_exact_chi_square(spark):
    from rag_document_parser_spark.operators.events import ab_test
    # a: 30 of 100 convert; b: 50 of 100 convert
    rows = ([("a", 1)] * 30 + [("a", 0)] * 70
            + [("b", 1)] * 50 + [("b", 0)] * 50)
    df = spark.createDataFrame(rows, "variant string, converted int")
    r = ab_test(df).collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == \
        (100, 100, 30, 50)
    assert r["rate_a_e6"] == 300_000 and r["rate_b_e6"] == 500_000
    # chi2 = 200*(30*50-70*50)^2 / (100*100*80*120)
    det = 30 * 50 - 70 * 50
    want = 200 * det * det * 10**6 // (100 * 100 * 80 * 120)
    assert r["chi2_e6"] == want
    assert r["significant_95"] is True        # 8.33 > 3.84


def test_ab_test_degenerate_margin_null_not_significant(spark):
    from rag_document_parser_spark.operators.events import ab_test
    rows = [("a", 1)] * 5 + [("b", 1)] * 5     # everyone converts
    df = spark.createDataFrame(rows, "variant string, converted int")
    r = ab_test(df).collect()[0]
    assert r["chi2_e6"] is None
    assert r["significant_95"] is False


def test_ab_test_no_difference_insignificant(spark):
    from rag_document_parser_spark.operators.events import ab_test
    rows = ([("a", 1)] * 40 + [("a", 0)] * 60
            + [("b", 1)] * 40 + [("b", 0)] * 60)
    df = spark.createDataFrame(rows, "variant string, converted int")
    r = ab_test(df).collect()[0]
    assert r["chi2_e6"] == 0 and r["significant_95"] is False


# ---- first-order transition matrix --------------------------------------

def test_event_transitions_counts_and_rows_normalize(spark):
    from rag_document_parser_spark.operators.events import (
        event_transitions)
    import datetime as dt
    T = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    # u1: v -> c -> v -> c ; u2: v -> p
    rows = [(1, T(0), 1, "v"), (2, T(1), 1, "c"), (3, T(2), 1, "v"),
            (4, T(3), 1, "c"), (5, T(0), 2, "v"), (6, T(1), 2, "p")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p_e6"])
           for r in event_transitions(df).collect()}
    # from 'v': 3 transitions (c, c, p) -> v->c 2/3, v->p 1/3
    assert got[("v", "c")] == (2, 2_000_000 // 3)
    assert got[("v", "p")] == (1, 1_000_000 // 3)
    assert got[("c", "v")] == (1, 1_000_000)
    # per-row probabilities sum to ~1e6 (floor slack < n_targets)
    from collections import defaultdict
    sums = defaultdict(int)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    for f, s in sums.items():
        assert 1_000_000 - 3 <= s <= 1_000_000
