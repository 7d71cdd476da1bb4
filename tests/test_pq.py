"""Product-quantization tier (operators/pq.py): training determinism,
encode exactness vs a pure-python replica, ADC ranking."""

import math

import pytest

from rag_document_parser_spark.operators import pq as PQ

E6 = 1_000_000


def _x6(vec):
    return [int(math.floor(float(x) * E6)) for x in vec]


def _py_nearest(sv, book):
    best = None
    for cid, c in enumerate(book):
        d = sum((x - y) * (x - y) for x, y in zip(sv, c))
        if best is None or (d, cid) < best:
            best = (d, cid)
    return best[1]


def _py_encode(vec, books, dsub):
    x = _x6(vec)
    return [_py_nearest(x[s * dsub:(s + 1) * dsub], books[s])
            for s in range(len(books))]


# three tight clusters in 8-dim, plus ids chosen so seeds span clusters
ROWS = [
    (0, [1.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0]),
    (2, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0]),
    (3, [0.9, 1.1, 0.0, 0.0, 1.1, 0.0, 0.0, 0.0]),
    (4, [0.0, 0.1, 0.9, 1.0, 0.0, 0.9, 0.0, 0.1]),
    (5, [0.1, 0.0, 0.0, 0.1, 0.0, 0.0, 0.9, 1.1]),
    (6, [1.1, 0.9, 0.1, 0.0, 0.9, 0.0, 0.1, 0.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        ROWS, "vec_id long, embedding array<float>")


def test_train_pq_deterministic_and_integer(spark, emb):
    b1 = PQ.train_pq(emb, m_sub=2, ksub=3, iters=2, dim=8)
    b2 = PQ.train_pq(emb, m_sub=2, ksub=3, iters=2, dim=8)
    assert b1 == b2
    assert len(b1) == 2 and all(len(sb) == 3 for sb in b1)
    assert all(isinstance(v, int)
               for sb in b1 for c in sb for v in c)
    # each subspace centroid has dsub = 4 coords
    assert all(len(c) == 4 for sb in b1 for c in sb)


def test_pq_encode_matches_python_replica(spark, emb):
    books = PQ.train_pq(emb, m_sub=2, ksub=3, iters=2, dim=8)
    got = {r["vec_id"]: list(r["codes"])
           for r in PQ.pq_encode(emb, books, dim=8).collect()}
    for vid, vec in ROWS:
        assert got[vid] == _py_encode(vec, books, dsub=4), vid
    # cluster-mates share codes after Lloyd convergence on this data
    assert got[0] == got[3] == got[6]
    assert got[1] == got[4]
    assert got[2] == got[5]


def test_pq_adc_topk_ranks_cluster_first(spark, emb):
    books = PQ.train_pq(emb, m_sub=2, ksub=3, iters=2, dim=8)
    q = (emb.where("vec_id = 0")
         .selectExpr("vec_id as query_id", "embedding"))
    top = PQ.pq_adc_topk(emb.where("vec_id > 0"), q, books, k=3, dim=8)
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert [r["vec_id"] for r in rows[:2]] == [3, 6]  # query's cluster
    # iscore replica: sum over subspaces of dot(q_sub, centroid(code))
    codes = _py_encode(ROWS[3][1], books, dsub=4)
    q6 = _x6(ROWS[0][1])
    want = sum(sum(a * b for a, b in
                   zip(q6[s * 4:(s + 1) * 4], books[s][codes[s]]))
               for s in range(2))
    assert rows[0]["iscore"] == want


def test_pq_validation(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        PQ.train_pq(emb, m_sub=3, ksub=2, iters=1, dim=8)
    with pytest.raises(ValueError, match="seed"):
        PQ.train_pq(emb.where("vec_id < 2"), m_sub=2, ksub=3, iters=1,
                    dim=8)
