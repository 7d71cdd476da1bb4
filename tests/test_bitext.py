"""Margin-based bitext mining (operators/bitext.py) vs a pure-Python
twin of the fixed-point margin formula, plus the semantic guarantees
the Artetxe & Schwenk recipe exists for: a planted parallel pair beats
a hub vector that is merely close to everything, each right element is
used at most once under ``unique_right``, and negative-cosine
candidates clamp to margin 0 instead of producing negative fixed-point
ratios."""

import math

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.bitext import margin_bitext_pairs


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return num / den if den else 0.0


def _python_margin(left, right, k, unique_right=True, min_margin_e6=0):
    """Pure-Python twin: identical floor/e6 integer arithmetic."""
    cos_e6 = {(x, y): math.floor(_cos(xv, yv) * 1000000)
              for x, xv in left for y, yv in right}
    fwd = {}
    for x, _ in left:
        cands = sorted(((y, cos_e6[(x, y)]) for y, _ in right),
                       key=lambda t: (-t[1], t[0]))[:k]
        fwd[x] = cands
    bwd = {}
    for y, _ in right:
        cands = sorted(((x, cos_e6[(x, y)]) for x, _ in left),
                       key=lambda t: (-t[1], t[0]))[:k]
        bwd[y] = cands
    nx = {x: (sum(c for _, c in v), len(v)) for x, v in fwd.items()}
    ny = {y: (sum(c for _, c in v), len(v)) for y, v in bwd.items()}
    best = {}
    for x, cands in fwd.items():
        scored = []
        for y, c in cands:
            sx, cx = nx[x]
            sy, cy = ny[y]
            m = (2 * max(c, 0) * cx * cy * 1000000
                 ) // max(sx * cy + sy * cx, 1)
            scored.append((y, c, m))
        scored.sort(key=lambda t: (-t[2], t[0]))
        y, c, m = scored[0]
        if m >= min_margin_e6:
            best[x] = (y, c, m)
    if unique_right:
        by_y = {}
        for x, (y, c, m) in best.items():
            by_y.setdefault(y, []).append((x, c, m))
        best = {}
        for y, rows in by_y.items():
            rows.sort(key=lambda t: (-t[2], t[0]))
            x, c, m = rows[0]
            best[x] = (y, c, m)
    return {(x, y, c, m) for x, (y, c, m) in best.items()}


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<double>")


# Planted geometry: x0<->y0 and x1<->y1 are near-identical parallel
# pairs; y9 is a hub (positive cosine with every x); x2 has no partner.
LEFT = [(0, [10, 0, 0, 1]), (1, [0, 10, 0, 1]), (2, [0, 0, 10, -4])]
RIGHT = [(100, [10, 0, 0, 2]), (101, [0, 10, 1, 1]),
         (109, [3, 3, 3, 3]),  # hub
         (110, [0, 0, -1, 8])]


def test_matches_python_twin(spark):
    got = {tuple(r) for r in margin_bitext_pairs(
        _df(spark, LEFT), _df(spark, RIGHT), k=2).collect()}
    want = _python_margin(LEFT, RIGHT, k=2)
    assert got == want
    assert len(got) > 0


def test_planted_pairs_beat_hub(spark):
    out = {r["x_id"]: r["y_id"] for r in margin_bitext_pairs(
        _df(spark, LEFT), _df(spark, RIGHT), k=2,
        min_margin_e6=1000000).collect()}
    assert out.get(0) == 100
    assert out.get(1) == 101
    # the hub never wins a planted pair's slot
    assert 109 not in (out.get(0), out.get(1))


def test_unique_right_one_use(spark):
    # two left vectors both closest to the same right vector
    left = [(0, [10, 0, 0, 0]), (1, [9, 1, 0, 0])]
    right = [(100, [10, 0, 0, 0]), (101, [0, 0, 1, 1])]
    rows = margin_bitext_pairs(_df(spark, left), _df(spark, right),
                               k=2).collect()
    y_used = [r["y_id"] for r in rows]
    assert len(y_used) == len(set(y_used))
    twin = _python_margin(left, right, k=2)
    assert {tuple(r) for r in rows} == twin


def test_negative_cosine_clamps_to_zero_margin(spark):
    left = [(0, [1, 0])]
    right = [(100, [-1, 0]), (101, [-1, -1])]
    rows = margin_bitext_pairs(_df(spark, left), _df(spark, right),
                               k=2, min_margin_e6=0).collect()
    assert all(r["margin_e6"] == 0 for r in rows)
    # and a positive floor filters them out entirely
    assert margin_bitext_pairs(_df(spark, left), _df(spark, right),
                               k=2, min_margin_e6=1).count() == 0


def test_short_pool_counts_not_k(spark):
    # |right| = 1 < k: neighbourhood average must use count 1, giving
    # the single mutual pair margin exactly 10^6 (cos == its own mean).
    left = [(0, [1.0, 0.0])]
    right = [(100, [1.0, 0.0])]
    rows = margin_bitext_pairs(_df(spark, left), _df(spark, right),
                               k=4).collect()
    assert len(rows) == 1
    assert rows[0]["margin_e6"] == 1000000


def test_broadcast_right_pool_plan(spark):
    # materialize=False keeps the scoring join visible in the plan
    # (the default lazily checkpoints it behind an RDD scan)
    plan = margin_bitext_pairs(
        _df(spark, LEFT), _df(spark, RIGHT), k=2, materialize=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_materialize_false_matches_default(spark):
    a = {tuple(r) for r in margin_bitext_pairs(
        _df(spark, LEFT), _df(spark, RIGHT), k=2).collect()}
    b = {tuple(r) for r in margin_bitext_pairs(
        _df(spark, LEFT), _df(spark, RIGHT), k=2,
        materialize=False).collect()}
    assert a == b
