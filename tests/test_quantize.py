"""Int8 scalar quantization + integer ANN (operators/quantize.py) vs a
pure-Python twin, plus the structural invariants: codes stay in
[-QMAX, QMAX], a zero vector quantizes to zero codes (no division
error), ranking is invariant to the query-side scale, and recall@k of
the quantized path against the exact float path is high on a spread-out
synthetic set and exact when vectors are axis-aligned."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from rag_document_parser_spark.operators.quantize import (
    QMAX,
    quantize_embeddings,
    quantized_topk,
    topk_recall,
)

E6 = 1_000_000

SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _py_quantize(vec):
    x6 = [math.floor(float(x) * E6) for x in vec]
    m = max(max((abs(v) for v in x6), default=0), 1)
    return m, [(v + m) * 2 * QMAX // (2 * m) - QMAX for v in x6]


def _vecs(n, dim=8):
    # deterministic, spread-out, UNIT-NORM: no RNG. Normalizing makes
    # dot ordering == cosine ordering, so the recall test below measures
    # pure quantization error rather than the dot-vs-cosine metric gap
    # (which on unnormalized vectors can legitimately drop recall to 0.2
    # for a query whose neighbors differ mostly by norm).
    out = []
    for i in range(n):
        v = [((i * 37 + d * 17 + (i * d) % 29) % 200 - 100) / 100.0
             for d in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append((i, [x / nrm for x in v]))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in _vecs(40)], SCHEMA)


def test_codes_match_python_twin_and_stay_bounded(spark, emb):
    rows = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    for i, v in _vecs(40):
        # float32 storage rounds the input; quantize from the same f32
        import struct
        f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        m, q = _py_quantize(f32)
        assert rows[i]["scale_e6"] == m, i
        assert rows[i]["qvec"] == q, i
        assert all(-QMAX <= c <= QMAX for c in rows[i]["qvec"])


def test_zero_vector_is_all_zero_codes(spark):
    df = spark.createDataFrame([(0, [0.0] * 4)], SCHEMA)
    row = quantize_embeddings(df).collect()[0]
    assert row["scale_e6"] == 1
    assert row["qvec"] == [0, 0, 0, 0]


def test_axis_aligned_topk_is_exact(spark):
    # one-hot corpus: quantized dot ranks identically to float dot
    dim = 6
    data = [(i, [1.0 if d == i % dim else 0.0 for d in range(dim)])
            for i in range(12)]
    df = spark.createDataFrame(data, SCHEMA)
    qz = quantize_embeddings(df)
    queries = qz.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "scale_e6", "qvec")
    top = quantized_topk(qz.where(F.col("vec_id") >= 2), queries, k=2)
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in top.collect()}
    # query 0 = axis 0 -> nearest are vec 6 (axis 0) then ties by id
    assert got[(0, 1)] == 6
    assert got[(1, 1)] == 7


def test_recall_high_on_spread_corpus(spark, emb):
    from rag_document_parser_spark.operators.similarity import (
        cosine_similarity_col, topk_per_query)

    k = 5
    qz = quantize_embeddings(emb)
    queries = qz.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "scale_e6", "qvec")
    approx = quantized_topk(qz.where(F.col("vec_id") >= 4), queries, k=k)

    qf = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q"))
    scored = (emb.where(F.col("vec_id") >= 4)
              .crossJoin(F.broadcast(qf))
              .select("query_id", "vec_id",
                      cosine_similarity_col(
                          F.col("embedding"), F.col("_q")).alias("cos")))
    exact = topk_per_query(scored, k, "query_id", "vec_id", "cos")
    rec = {r["query_id"]: r["recall_e6"]
           for r in topk_recall(approx, exact, k).collect()}
    assert set(rec) == {0, 1, 2, 3}
    # unit-norm corpus => dot ordering == cosine ordering, so any miss
    # is pure int8 quantization error; at dim 8 recall@5 is perfect on
    # this corpus (verified against the pure-Python twin).
    assert all(v >= 800_000 for v in rec.values()), rec


def test_topk_recall_counts_zero_hit_queries(spark):
    a = spark.createDataFrame([(1, 10), (1, 11), (2, 10)],
                              "query_id long, vec_id long")
    e = spark.createDataFrame([(1, 99), (2, 10)],
                              "query_id long, vec_id long")
    rec = {r["query_id"]: (r["hits"], r["recall_e6"])
           for r in topk_recall(a, e, 2).collect()}
    assert rec[1] == (0, 0)
    assert rec[2] == (1, 500_000)


def test_ivf_quantized_candidates_match_float_ivf(spark):
    """At equal (n_centroids, nprobe) the composed operator's candidate
    universe equals the float IVF's; within it, ranking follows the
    scaled integer dot. On the unit-norm corpus the two operators agree
    on the top-1 for every query."""
    from rag_document_parser_spark.operators.quantize import (
        ivf_quantized_topk)
    from rag_document_parser_spark.operators.similarity import (
        ivf_cosine_topk)

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in _vecs(40)], SCHEMA)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    qtop = ivf_quantized_topk(emb.where(F.col("vec_id") >= 3), queries,
                              k=5, n_centroids=8, nprobe=3)
    ftop = ivf_cosine_topk(emb.where(F.col("vec_id") >= 3), queries,
                           k=5, n_centroids=8, nprobe=3)
    q1 = {r["query_id"]: r["vec_id"] for r in qtop.where("rank = 1").collect()}
    f1 = {r["query_id"]: r["vec_id"] for r in ftop.where("rank = 1").collect()}
    assert q1 == f1, (q1, f1)
    # full candidate sets coincide at k >= candidate count per probe
    qall = ivf_quantized_topk(emb.where(F.col("vec_id") >= 3), queries,
                              k=50, n_centroids=8, nprobe=3)
    fall = ivf_cosine_topk(emb.where(F.col("vec_id") >= 3), queries,
                           k=50, n_centroids=8, nprobe=3)
    qs = {(r["query_id"], r["vec_id"]) for r in qall.collect()}
    fs = {(r["query_id"], r["vec_id"]) for r in fall.collect()}
    assert qs == fs


def test_ivf_quantized_excludes_degenerates(spark):
    from rag_document_parser_spark.operators.quantize import (
        ivf_quantized_topk)

    rows = [(i, [1.0 if d == i % 4 else 0.1 for d in range(4)])
            for i in range(12)] + [(90, [0.0] * 4), (91, None)]
    emb = spark.createDataFrame(rows, SCHEMA)
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_quantized_topk(emb.where(F.col("vec_id") >= 2), queries,
                             k=20, n_centroids=4, nprobe=2)
    ids = {r["vec_id"] for r in out.collect()}
    assert 90 not in ids and 91 not in ids
