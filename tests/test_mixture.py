"""Mixture design: exact isqrt, temperature flattening, epoch caps,
and the log-binned quantile sketch's error/merge contracts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators import mixture as MX
from rag_document_parser_spark.operators import sketches as SK


def test_isqrt_exact_on_adversarial_values(spark):
    # perfect squares, off-by-one neighbours, and values near the top of
    # BIGINT where double(x) can no longer represent x exactly
    roots = [0, 1, 2, 3, 15, 16, 17, 10 ** 6, 3_037_000_498, 3_037_000_499]
    xs = sorted({r * r + d for r in roots for d in (-1, 0, 1) if r * r + d >= 0}
                | {2 ** 62 - 1, 2 ** 62, 9_200_000_000_000_000_000})
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r["x"]: r["s"] for r in
           df.select("x", MX.isqrt(F.col("x")).alias("s")).collect()}
    for x in xs:
        assert got[x] == math.isqrt(x), f"isqrt({x})"


def test_temperature_flattens_toward_uniform(spark):
    # 3 groups with mass 1 : 100 : 10000 — alpha=1/2 must lift the tail
    # shares and cut the head share, strictly
    rows = [("a", 1)] + [("b", 1)] * 100 + [("c", 1)] * 10000
    df = spark.createDataFrame(rows, "grp string, one int")
    out = {r["group"]: r for r in
           MX.temperature_weights(df, "grp", alpha="0.5").collect()}
    for g in ("a", "b"):
        assert out[g]["tempered_share_e6"] > out[g]["raw_share_e6"]
    assert out["c"]["tempered_share_e6"] < out["c"]["raw_share_e6"]
    # alpha=1 is a no-op on shares
    raw = {r["group"]: r for r in
           MX.temperature_weights(df, "grp", alpha="1").collect()}
    for g in ("a", "b", "c"):
        assert raw[g]["tempered_share_e6"] == raw[g]["raw_share_e6"]
    with pytest.raises(ValueError):
        MX.temperature_weights(df, "grp", alpha="0.7")


def test_epoch_plan_caps_and_grants(spark):
    rows = [("small", "x" * 10)] * 5 + [("big", "x" * 10)] * 1000
    df = spark.createDataFrame(rows, "grp string, text string")
    df = df.withColumn("n", F.length("text"))
    w = MX.temperature_weights(df, "grp", size_col="n", alpha="0.5")
    plan = {r["group"]: r for r in
            MX.epoch_plan(w, budget_tokens=20_000,
                          max_epochs_e6=4_000_000).collect()}
    # small group: tempered share ~ 6.6%, target ~1320 over mass 50 ->
    # >> 4 epochs -> capped, granted exactly mass * 4
    assert plan["small"]["capped"]
    assert plan["small"]["epochs_e6"] == 4_000_000
    assert plan["small"]["granted_tokens"] == plan["small"]["mass"] * 4
    assert not plan["big"]["capped"]
    assert plan["big"]["granted_tokens"] == plan["big"]["target_tokens"]
    with pytest.raises(ValueError):
        MX.epoch_plan(w, budget_tokens=10 ** 13)


def _exact_quantile(sorted_vals, q_e6):
    rank = max(1, -(-len(sorted_vals) * q_e6 // 1_000_000))
    return sorted_vals[rank - 1]


def test_qsketch_relative_error_bound(spark):
    # log-spread values: exact quantiles span 5 orders of magnitude
    vals = [int(10 ** (i / 100)) for i in range(0, 501)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cells = SK.qsketch_build(df, "v")
    qs = [10_000, 250_000, 500_000, 750_000, 990_000]
    got = {r["q_e6"]: r["est_lo"] for r in
           SK.qsketch_quantiles(cells, qs).collect()}
    svals = sorted(vals)
    for q in qs:
        exact = _exact_quantile(svals, q)
        est = got[q]
        # lower bound of the bucket containing the exact quantile:
        # est <= exact < est * (1 + 2^-QS_SUB) (+1 for unit bins)
        assert est <= exact, (q, est, exact)
        assert exact < est + max(1, est >> SK.QS_SUB) + 1, (q, est, exact)


def test_qsketch_merge_equals_single_build(spark):
    vals = list(range(1, 2001)) + [10 ** 9] * 7
    half = len(vals) // 2
    d1 = spark.createDataFrame([(v,) for v in vals[:half]], "v long")
    d2 = spark.createDataFrame([(v,) for v in vals[half:]], "v long")
    dall = spark.createDataFrame([(v,) for v in vals], "v long")
    merged = (SK.qsketch_build(d1, "v").unionByName(SK.qsketch_build(d2, "v"))
              .groupBy("bucket").agg(F.sum("cnt").alias("cnt")))
    single = SK.qsketch_build(dall, "v")
    qs = [500_000, 990_000]
    a = sorted(SK.qsketch_quantiles(merged, qs).collect())
    b = sorted(SK.qsketch_quantiles(single, qs).collect())
    assert a == b


def test_qsketch_excludes_null_and_negative(spark):
    df = spark.createDataFrame([(None,), (-5,), (3,), (100,)], "v long")
    cells = SK.qsketch_build(df, "v")
    assert cells.agg(F.sum("cnt")).collect()[0][0] == 2


def test_mixture_and_qsketch_partitioning_invariant(spark):
    # same multiset at 1 and 13 partitions — the reproducibility
    # property behind the north rule's two-cluster-size criterion
    rows = [(f"g{i % 4}", (i * 37) % 500 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, n long")

    def multiset(d):
        return sorted(tuple(r) for r in d.collect())

    for build in (
        lambda d: MX.temperature_weights(d, "grp", size_col="n",
                                         alpha="0.5"),
        lambda d: MX.epoch_plan(
            MX.temperature_weights(d, "grp", size_col="n", alpha="0.25"),
            budget_tokens=500_000),
        lambda d: SK.qsketch_quantiles(SK.qsketch_build(d, "n"),
                                       [500_000, 990_000]),
    ):
        a = multiset(build(df.repartition(1)))
        b = multiset(build(df.repartition(13)))
        assert a == b and a


def test_materialize_plan_copies_and_invariance(spark):
    rows = ([("tail", 50)] * 4) + ([("head", 50)] * 400)
    df = spark.createDataFrame(
        [(i, g, n) for i, (g, n) in enumerate(rows)],
        "doc_id long, grp string, n int")
    w = MX.temperature_weights(df, "grp", size_col="n", alpha="0.5")
    plan = MX.epoch_plan(w, budget_tokens=15_000, max_epochs_e6=4_000_000)
    pr = {r["group"]: r for r in plan.collect()}
    out = MX.materialize_plan(df, plan, group_col="grp", salt="m")
    got = out.groupBy("grp").agg(
        F.count("*").alias("n_copies"), F.sum("n").alias("toks")).collect()
    by = {r["grp"]: r for r in got}
    for g in ("tail", "head"):
        # every doc contributes floor(epochs) or floor(epochs)+1 copies,
        # so the group total brackets granted_tokens within one doc-mass
        n_docs = {"tail": 4, "head": 400}[g]
        lo = (pr[g]["epochs_e6"] // 1_000_000) * n_docs
        hi = lo + n_docs
        assert lo <= by[g]["n_copies"] <= hi
        assert abs(by[g]["toks"] - pr[g]["granted_tokens"]) <= 50 * n_docs
    # partition invariance: identical (doc_id, copy) multiset
    a = sorted((r["doc_id"], r["copy"]) for r in out.collect())
    b = sorted((r["doc_id"], r["copy"]) for r in
               MX.materialize_plan(df.repartition(13), plan,
                                   group_col="grp", salt="m").collect())
    assert a == b
    # groups absent from the plan drop entirely
    only_head = MX.materialize_plan(
        df, plan.where(F.col("group") == "head"), group_col="grp", salt="m")
    assert only_head.where(F.col("grp") == "tail").count() == 0
