"""Int8 scalar quantization of embedding columns + integer-only ANN.

At 100 TB the embedding store, not the arithmetic, is what an ANN scan
pays for: a float32[64] corpus is 256 B/row of memory bandwidth per
candidate, an int8[64] corpus is 64 B — a 4× cut in the bytes every
brute-force or post-LSH re-rank pass has to move. This tier quantizes
once (a pure scan-local projection, zero shuffles) and ranks candidates
with integer dot products that never touch a float:

- ``quantize_embeddings`` — symmetric per-vector max-abs quantization
  into ``[-QMAX, QMAX]``. Everything is fixed-point: the float enters
  integer space as ``floor(x * 10^6)`` (one IEEE double multiply both
  engines perform bit-identically), the per-vector scale is an integer
  max, and the quantized code is computed with a single NON-NEGATIVE
  integer division — ``(x6 + m) * 2*QMAX div (2*m) - QMAX`` — because
  Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors,
  and the two only agree on non-negative operands (the repo-wide rule,
  see graph._idiv).
- ``quantized_topk`` — brute-force top-k in the integer domain: the
  (small) quantized query set is broadcast, the integer dot product
  folds JVM-side (integer SUM is associative and order-free, so no
  fold-order pinning is needed, unlike the float cosine path), and the
  rank key is ``idot * corpus_scale`` — within one query the query-side
  scale is a constant positive factor, so dropping it changes no
  ranking while keeping the key BIGINT-small. Per-query top-k reuses
  similarity.topk_per_query's two-stage partial rank, so no task ever
  sorts more than its own partition's candidates.
- ``topk_recall`` — the quality gauge: per-query overlap between the
  quantized top-k and the exact float top-k, as integer recall_e6.

The reference has no vector surface (it parses documents,
/root/reference/main.py:72-147); this is a SURVEY §6 scale-path tier
like similarity.py, which it composes with (same table, same top-k
machinery).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.similarity import topk_per_query

__all__ = ["QMAX", "quantize_embeddings", "quantized_topk", "topk_recall"]

E6 = 1_000_000
QMAX = 127


def _idiv(a: Column, b: Column) -> Column:
    # exact integer division; operands here are always non-negative so
    # Spark's truncation == DuckDB's floor (same rule as graph._idiv)
    return F.call_function("div", a, b)


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """``(id, scale_e6, qvec)``: symmetric per-vector int8-range codes.

    Scan-local (zero shuffles): two stacked projections inside one
    whole-stage-codegen span. ``scale_e6`` is the vector's max-abs in
    1e-6 fixed point (floored at 1 so a degenerate all-zero vector
    quantizes to all-zero codes instead of dividing by zero); ``qvec``
    elements live in ``[-QMAX, QMAX]``. Dequantized value of code q is
    ``q * scale_e6 / (QMAX * 1e6)`` — callers only ever need the
    products of integers, never that float.
    """
    x6 = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(E6))).cast("long"))
    staged = df.select(F.col(id_col), x6.alias("_x6"))
    scale = F.greatest(
        F.aggregate("_x6", F.lit(0).cast("long"),
                    lambda acc, v: F.greatest(acc, F.abs(v))),
        F.lit(1).cast("long"))
    staged = staged.select(id_col, "_x6", scale.alias("scale_e6"))
    qvec = F.transform(
        "_x6",
        lambda v: _idiv((v + F.col("scale_e6")) * F.lit(2 * QMAX),
                        F.col("scale_e6") * F.lit(2)) - F.lit(QMAX))
    return staged.select(id_col, "scale_e6", qvec.alias("qvec"))


def _int_dot(a: Column, b: Column) -> Column:
    # |term| <= QMAX^2 = 16129, so a 64-dim dot is ~1e6 — integer SUM,
    # associative, no fold-order pinning needed
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def quantized_topk(corpus: DataFrame, queries: DataFrame, k: int,
                   id_col: str = "vec_id",
                   query_id_col: str = "query_id") -> DataFrame:
    """Integer brute-force top-k: ``(query_id, vec_id, idot, iscore,
    rank)``.

    ``corpus`` and ``queries`` are ``quantize_embeddings`` outputs (the
    query frame keyed by ``query_id_col``). The corpus side is never
    shuffled pre-rank: queries broadcast, dot + rank key computed in the
    scan's codegen span, then the two-stage partial rank bounds every
    task at k rows per (query, partition). ``iscore = idot * scale_e6``
    (corpus side) is the ranking key — monotone in the dequantized dot
    for any fixed query; ties break by ascending id so the selection is
    deterministic on any partitioning.
    """
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col("qvec").alias("_qv")))
    scored = corpus.crossJoin(q).select(
        "query_id", F.col(id_col).alias("vec_id"),
        _int_dot(F.col("qvec"), F.col("_qv")).alias("idot"),
        "scale_e6",
    ).withColumn("iscore", F.col("idot") * F.col("scale_e6"))
    top = topk_per_query(scored.select("query_id", "vec_id", "iscore",
                                       "idot"),
                         k, "query_id", "vec_id", "iscore")
    return top.select("query_id", "vec_id", "idot", "iscore", "rank")


def topk_recall(approx: DataFrame, exact: DataFrame, k: int,
                query_id_col: str = "query_id",
                id_col: str = "vec_id") -> DataFrame:
    """Per-query ``(query_id, hits, recall_e6)`` of ``approx`` against
    ``exact`` (both top-k relations over the same id space).

    One broadcast-sized join per query id — both inputs are already k
    rows per query, so this never scales with the corpus. A query whose
    approx set misses everything still gets a row (hits = 0): the left
    join keeps every approx row and the null-ignoring SUM coalesces.
    """
    hits = (approx.select(query_id_col, id_col)
            .join(exact.select(query_id_col, id_col)
                  .withColumn("_hit", F.lit(1)),
                  [query_id_col, id_col], "left")
            .groupBy(query_id_col)
            .agg(F.coalesce(F.sum("_hit"), F.lit(0))
                 .cast("long").alias("hits")))
    return hits.select(
        query_id_col, "hits",
        _idiv(F.col("hits") * F.lit(E6), F.lit(k)).alias("recall_e6"))


def ivf_quantized_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                       n_centroids: int = 16, nprobe: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       qid_col: str = "query_id") -> DataFrame:
    """IVF coarse probe + int8 integer re-rank — the composed 100 TB
    ANN architecture: ``(query_id, vec_id, idot, iscore, rank)``.

    The two scale levers stack: the inverted file cuts WHICH vectors a
    query touches (nprobe/n_centroids of the corpus, never shuffled —
    posting lists are a zero-shuffle assignment projection and the
    probe side broadcasts), and the int8 codes cut what each touched
    vector COSTS (4x less memory bandwidth than float32, integer dot,
    no libm). The coarse quantizer is similarity.ivf_cosine_topk's
    deterministic lowest-id centroid set — assignment and probing are
    IDENTICAL to the float IVF operator (cited there: a real deploy
    trains k-means offline); only the re-rank kernel changes, to
    quantized_topk's scaled integer dot. Recall < 1 from BOTH stages by
    design — gauge with topk_recall against the exact float path, as
    q_quantized_recall does for the flat scan.

    Degenerate vectors (NULL / zero norm) are excluded from index and
    queries exactly like the float operator, so the two are candidate-
    set-identical at equal (n_centroids, nprobe).
    """
    from rag_document_parser_spark.operators.similarity import (
        _centroid_scores,
        _lowest_id_centroids,
        _norm,
        ivf_assignment,
    )

    def _ok(df):
        return df.where(F.col(vec_col).isNotNull()
                        & (_norm(F.col(vec_col)) > 0))

    corpus = _ok(corpus)
    queries = _ok(queries)
    cents = _lowest_id_centroids(corpus, n_centroids, id_col, vec_col,
                                 "ivf_quantized_topk")
    qz_c = quantize_embeddings(corpus, vec_col, id_col)
    assigned = (corpus.select(
        F.col(id_col),
        ivf_assignment(F.col(vec_col), cents)["cid"].alias("_cid"))
        .join(qz_c, id_col))
    qz_q = quantize_embeddings(queries.select(
        F.col(qid_col).alias("_qid"), F.col(vec_col)), vec_col, "_qid")
    probes = queries.select(
        F.col(qid_col),
        F.slice(F.array_sort(_centroid_scores(F.col(vec_col), cents)),
                1, nprobe).alias("_probes"))
    probes = (probes.select(
        qid_col,
        F.explode(F.transform("_probes", lambda s: s["cid"])).alias("_cid"))
        .join(qz_q.select(F.col("_qid").alias(qid_col),
                          F.col("qvec").alias("_qv")), qid_col))
    cand = assigned.join(F.broadcast(probes), "_cid") \
                   .where(F.col(qid_col) != F.col(id_col))
    scored = cand.select(
        qid_col, F.col(id_col).alias("vec_id"),
        _int_dot(F.col("qvec"), F.col("_qv")).alias("idot"),
        "scale_e6",
    ).withColumn("iscore", F.col("idot") * F.col("scale_e6"))
    top = topk_per_query(scored.select(qid_col, "vec_id", "iscore", "idot"),
                         k, qid_col, "vec_id", "iscore")
    return top.select(qid_col, "vec_id", "idot", "iscore", "rank")
