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
