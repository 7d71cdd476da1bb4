"""Gale-Church sentence alignment (operators/align.py): the engine DP
fold vs the pure-Python twin on hand cases and randomized inputs, the
bead-inventory semantics, the cell-cap guard, partition invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.align import (
    gale_church_align,
    python_gale_church,
)

SCHEMA = "pair_id string, la array<int>, lb array<int>"


def _run(spark, cases):
    df = spark.createDataFrame(cases, SCHEMA)
    got = {}
    for r in gale_church_align(df).collect():
        got.setdefault(r["pair_id"], []).append(
            (r["bead_idx"], r["a_start"], r["a_len"],
             r["b_start"], r["b_len"]))
    return {k: [b[1:] for b in sorted(v)] for k, v in got.items()}


def test_bead_inventory_hand_cases(spark):
    got = _run(spark, [
        ("even", [30, 40, 25], [30, 40, 25]),
        ("merge", [30, 40, 25], [72, 25]),
        ("split", [60, 20], [28, 30, 21]),
        ("del", [30], []),
        ("ins", [], [10, 20]),
        ("empty", [], [])])
    assert got["even"] == [(0, 1, 0, 1), (1, 1, 1, 1), (2, 1, 2, 1)]
    assert got["merge"] == [(0, 2, 0, 1), (2, 1, 1, 1)]   # 2-1 bead
    assert got["split"] == [(0, 1, 0, 2), (1, 1, 2, 1)]   # 1-2 bead
    assert got["del"] == [(0, 1, 0, 0)]
    assert got["ins"] == [(0, 0, 0, 1), (0, 0, 1, 1)]
    assert "empty" not in got                              # no beads


def test_matches_python_twin_randomized(spark):
    rng = random.Random(7)
    cases = []
    for p in range(25):
        n = rng.randint(0, 7)
        la = [rng.randint(5, 80) for _ in range(n)]
        # b side: random merges/splits/jitter of a
        lb, i = [], 0
        while i < n:
            r = rng.random()
            if r < 0.2 and i + 1 < n:
                lb.append(la[i] + la[i + 1] + 1)
                i += 2
            elif r < 0.35:
                h = la[i] // 2
                lb.extend([h, la[i] - h])
                i += 1
            elif r < 0.45:
                i += 1                      # deletion
            else:
                lb.append(la[i] + rng.randint(-2, 2))
                i += 1
        cases.append((f"r{p}", la, lb))
    got = _run(spark, cases)
    for pid, la, lb in cases:
        want = python_gale_church(la, lb)
        assert got.get(pid, []) == want, (pid, la, lb)


def test_beads_tile_both_sides(spark):
    """Beads are a monotone exact tiling: a-side lengths sum to n,
    b-side to m, starts are the running sums."""
    cases = [("t", [20, 31, 9, 44, 18], [19, 41, 43, 20])]
    got = _run(spark, cases)["t"]
    ca = cb = 0
    for a_start, a_len, b_start, b_len in got:
        assert (a_start, b_start) == (ca, cb)
        ca, cb = ca + a_len, cb + b_len
    assert (ca, cb) == (5, 4)


def test_max_cells_guard(spark):
    df = spark.createDataFrame(
        [("big", list(range(10, 90)), list(range(10, 90)))], SCHEMA)
    with pytest.raises(Exception, match="max_cells"):
        gale_church_align(df, max_cells=100).collect()


def test_partition_invariance_and_no_shuffle(spark):
    cases = [(f"p{i}", [10 + i, 20, 30], [10 + i, 51])
             for i in range(20)]
    df = spark.createDataFrame(cases, SCHEMA)
    a = sorted(map(tuple, gale_church_align(df).collect()))
    b = sorted(map(tuple, gale_church_align(df.repartition(7)).collect()))
    assert a == b
    # row-local DP: no exchange before the explode
    import re
    plan = gale_church_align(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
