"""Count-min sketch (operators/sketches.py) vs a pure-Python twin of
the same md5 grid, plus the count-min contract: estimates never
underestimate, the grid is size-bounded, sketches merge by summation,
and unseen terms estimate 0 (or collision mass only)."""

import hashlib

from pyspark.sql import functions as F

from rag_document_parser_spark.operators.sketches import (
    DEPTH,
    cms_build,
    cms_estimate,
)

WIDTH = 16  # tiny grid so collisions actually happen in the test

TOKENS = (["spark"] * 30 + ["duck"] * 20 + ["arrow"] * 9 + ["iceberg"] * 4
          + ["parquet", "orc", "avro", "csv", "json"])


def _py_bucket(term, row, width=WIDTH):
    h = int(hashlib.md5(f"cms-{row}:{term}".encode()).hexdigest()[:15], 16)
    return h % width


def _py_grid(tokens, width=WIDTH):
    grid = {}
    for t in tokens:
        for r in range(DEPTH):
            key = (r, _py_bucket(t, r, width))
            grid[key] = grid.get(key, 0) + 1
    return grid


def _py_estimate(grid, term, width=WIDTH):
    return min(grid.get((r, _py_bucket(term, r, width)), 0)
               for r in range(DEPTH))


def test_grid_matches_python_twin_and_is_bounded(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], "term string")
    got = {(r["row"], r["bucket"]): r["cnt"]
           for r in cms_build(df, width=WIDTH).collect()}
    assert got == _py_grid(TOKENS)
    assert len(got) <= DEPTH * WIDTH


def test_estimates_never_underestimate(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], "term string")
    sketch = cms_build(df, width=WIDTH)
    terms = spark.createDataFrame(
        [(t,) for t in sorted(set(TOKENS))], "term string")
    est = {r["term"]: r["est_cnt"]
           for r in cms_estimate(sketch, terms, width=WIDTH).collect()}
    exact = {t: TOKENS.count(t) for t in set(TOKENS)}
    grid = _py_grid(TOKENS)
    for t, c in exact.items():
        assert est[t] >= c, t
        assert est[t] == _py_estimate(grid, t), t


def test_unseen_term_estimates_collision_mass_only(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], "term string")
    sketch = cms_build(df, width=WIDTH)
    terms = spark.createDataFrame([("zyzzyva",)], "term string")
    [row] = cms_estimate(sketch, terms, width=WIDTH).collect()
    grid = _py_grid(TOKENS)
    assert row["est_cnt"] == _py_estimate(grid, "zyzzyva")


def test_sketches_merge_by_sum(spark):
    half = len(TOKENS) // 2
    a = spark.createDataFrame([(t,) for t in TOKENS[:half]], "term string")
    b = spark.createDataFrame([(t,) for t in TOKENS[half:]], "term string")
    merged = (cms_build(a, width=WIDTH)
              .unionByName(cms_build(b, width=WIDTH))
              .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))
    whole = cms_build(
        spark.createDataFrame([(t,) for t in TOKENS], "term string"),
        width=WIDTH)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert got == want


# -- HyperLogLog ------------------------------------------------------------

from rag_document_parser_spark.operators.sketches import (  # noqa: E402
    HLL_B,
    hll_estimate,
    hll_registers,
)

_M = 1 << HLL_B
_W = 60 - HLL_B
_CAP = 30


def _py_hll_probe(term, salt=""):
    h = int(hashlib.md5(f"hll{salt}:{term}".encode()).hexdigest()[:15], 16)
    w = h // _M
    rho = (_W + 1) if w == 0 else (_W + 1 - w.bit_length())
    return h % _M, rho


def _py_hll_regs(terms, salt=""):
    regs = {}
    for t in terms:
        b, rho = _py_hll_probe(t, salt)
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_hll_est(regs):
    s = sum((1 << (_CAP - rho)) if rho <= _CAP else 0
            for rho in regs.values())
    s += (_M - len(regs)) * (1 << _CAP)
    return 709_000 * _M * _M * (1 << _CAP) // s // 10 ** 6


def test_hll_registers_match_python_twin(spark):
    terms = [f"tok-{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r["bucket"]: r["rho"] for r in hll_registers(df).collect()}
    assert got == _py_hll_regs(terms)
    assert len(got) <= _M


def test_hll_estimate_accuracy_and_twin(spark):
    # 2000 distincts, each repeated (repeats must not move the registers)
    terms = [f"item-{i}" for i in range(2000)] * 3
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    regs = hll_registers(df)
    [row] = hll_estimate(regs).collect()
    assert row["est_distinct"] == _py_hll_est(_py_hll_regs(terms))
    # m=64 raw HLL: sigma ~13%; this deterministic corpus sits within 2 sigma
    assert 0.74 * 2000 <= row["est_distinct"] <= 1.26 * 2000, row


def test_hll_registers_merge_by_max(spark):
    terms = [f"u{i}" for i in range(300)]
    a = spark.createDataFrame([(t,) for t in terms[:200]], "term string")
    b = spark.createDataFrame([(t,) for t in terms[100:]], "term string")
    merged = (hll_registers(a).unionByName(hll_registers(b))
              .groupBy("bucket").agg(F.max("rho").alias("rho")))
    whole = hll_registers(
        spark.createDataFrame([(t,) for t in terms], "term string"))
    got = {r["bucket"]: r["rho"] for r in merged.collect()}
    want = {r["bucket"]: r["rho"] for r in whole.collect()}
    assert got == want


def test_hll_grouped_registers(spark):
    rows = [("en", f"w{i}") for i in range(100)] + \
           [("fr", f"w{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "lang string, term string")
    regs = hll_registers(df, group_cols=("lang",))
    est = {r["lang"]: r["est_distinct"]
           for r in hll_estimate(regs, group_cols=("lang",)).collect()}
    assert est["en"] == _py_hll_est(_py_hll_regs([f"w{i}" for i in range(100)]))
    assert est["fr"] == _py_hll_est(_py_hll_regs([f"w{i}" for i in range(40)]))


def test_hll_registers_plan_has_mapside_combine(spark):
    # the corpus must be absorbed map-side: a partial_max aggregate
    # below the exchange, whose key domain is (groups x 64) — the
    # exchange moves registers, never tokens
    df = spark.createDataFrame([(f"t{i}",) for i in range(100)],
                               "term string")
    plan = (hll_registers(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_max" in plan, plan


# ---- HLL pairwise overlap (inclusion-exclusion) -------------------------

def test_hll_overlap_estimates_track_truth(spark):
    from pyspark.sql import functions as F
    from rag_document_parser_spark.operators.sketches import hll_overlap
    # A and B share 300 of 500 terms each; C is disjoint
    rows = ([("A", f"shared{i}") for i in range(300)]
            + [("A", f"onlyA{i}") for i in range(200)]
            + [("B", f"shared{i}") for i in range(300)]
            + [("B", f"onlyB{i}") for i in range(200)]
            + [("C", f"onlyC{i}") for i in range(400)])
    df = spark.createDataFrame(rows, "lang string, term string")
    got = {(r["group_a"], r["group_b"]): r
           for r in hll_overlap(df, group_col="lang").collect()}
    ab = got[("A", "B")]
    # 64-register HLL: ~13% relative error; check the broad shape
    assert 300 <= ab["est_a"] <= 800 and 300 <= ab["est_b"] <= 800
    assert ab["est_union"] >= max(ab["est_a"], ab["est_b"])
    assert ab["est_intersection"] > 0
    ac = got[("A", "C")]
    # disjoint pair: intersection estimate stays far below the shared
    # pair's (I-E noise may keep it above zero at 64 registers)
    assert ac["est_intersection"] < ab["est_intersection"]
    assert 0 <= ac["jaccard_est_e6"] <= 1_000_000


def test_hll_overlap_guard_and_determinism(spark):
    import pytest as _pt
    from rag_document_parser_spark.operators.sketches import hll_overlap
    rows = [(f"g{i % 5}", f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "lang string, term string")
    with _pt.raises(ValueError, match="max_groups"):
        hll_overlap(df, group_col="lang", max_groups=2)
    a = sorted(map(tuple, hll_overlap(df, group_col="lang").collect()))
    b = sorted(map(tuple, hll_overlap(
        df.repartition(7), group_col="lang").collect()))
    assert a == b
