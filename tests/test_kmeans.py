"""Spherical k-means training (`similarity.train_kmeans`): separable
clusters, bitwise python-simulation parity, IVF composition.
"""

from __future__ import annotations

import math

import pytest

from rag_document_parser_spark.operators.similarity import (
    ivf_cosine_topk,
    sum_left_fold,
    train_kmeans,
)

K, ITERS = 3, 2


def _vectors():
    """Three separable direction families in 4-dim; ids 0..2 are one
    seed per family (deterministic init picks them)."""
    rows = []
    fams = [(1.0, 0.1, 0.0, 0.0), (0.0, 1.0, 0.1, 0.0),
            (0.1, 0.0, 0.0, 1.0)]
    vid = 0
    for rep in range(6):
        for f, base in enumerate(fams):
            jitter = 0.01 * ((vid * 7) % 5)
            rows.append((vid, [x + (jitter if i == f else 0.0)
                               for i, x in enumerate(base)]))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_vectors(),
                                 ["vec_id", "embedding"])


def _simulate(rows, k, iters):
    """Pure-python replica with the engines' exact fold/tie rules."""
    def unit(v):
        nrm = math.sqrt(sum_left_fold([x * x for x in v]))
        return [x / nrm for x in v] if nrm > 0 else list(v)

    def dot(a, b):
        return sum_left_fold([x * y for x, y in zip(a, b)])

    vecs = sorted(rows)
    cents = [(i, unit(list(v))) for i, (_, v) in enumerate(vecs[:k])]
    dim = len(cents[0][1])
    for _ in range(iters):
        assign = {}
        for vid, v in vecs:
            best = min((-dot(v, c), cid) for cid, c in cents)
            assign.setdefault(best[1], []).append((vid, v))
        nxt = []
        for cid, c in cents:
            if cid not in assign:
                nxt.append((cid, c))
                continue
            ms = sorted(assign[cid])
            mean = [sum_left_fold([m[d] for _, m in ms]) / len(ms)
                    for d in range(dim)]
            nxt.append((cid, unit(mean)))
        cents = nxt
    return cents


def test_matches_python_simulation(corpus):
    got = train_kmeans(corpus, k=K, iters=ITERS)
    expect = _simulate(_vectors(), K, ITERS)
    assert len(got) == len(expect) == K
    for (gc, gv), (ec, ev) in zip(got, expect):
        assert gc == ec
        assert gv == ev          # bitwise: same IEEE ops in same order


def test_separates_families(corpus):
    cents = train_kmeans(corpus, k=K, iters=ITERS)
    # each centroid points dominantly along one distinct family axis
    axes = sorted(max(range(4), key=lambda d: c[d]) for _, c in cents)
    assert axes == [0, 1, 3]


def test_partition_invariance(spark, corpus):
    a = train_kmeans(corpus, k=K, iters=ITERS)
    b = train_kmeans(corpus.repartition(5), k=K, iters=ITERS)
    assert a == b


def test_feeds_ivf(corpus):
    cents = train_kmeans(corpus, k=K, iters=ITERS)
    queries = corpus.where("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding")
    out = ivf_cosine_topk(corpus, queries, k=3, nprobe=1,
                          centroids=cents).collect()
    assert {r["query_id"] for r in out} == {0, 1}
    for r in out:
        assert 1 <= r["rank"] <= 3
        # probing one trained list still finds same-family neighbours:
        # family membership is id % 3 by construction
        assert r["vec_id"] % 3 == r["query_id"] % 3


def test_degenerate_and_empty(spark):
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = train_kmeans(df, k=2, iters=2)   # zero vector excluded
    assert [c for c, _ in cents] == [0, 1]
    with pytest.raises(ValueError):
        train_kmeans(df.where("vec_id = 0"), k=2)


def test_oversized_training_set_raises_loudly(spark):
    """VERDICT r4 task #3: the bounded-sample training contract is
    structural — an oversized training frame raises before the first
    iteration instead of OOMing the sorted-fold cluster mean."""
    rows = [(i, [float(i % 7) + 1.0, 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="max_train_vectors"):
        train_kmeans(df, k=2, iters=1, max_train_vectors=10)
    # at or under the budget trains normally
    cents = train_kmeans(df, k=2, iters=1, max_train_vectors=40)
    assert len(cents) == 2
