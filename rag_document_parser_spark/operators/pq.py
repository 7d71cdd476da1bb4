"""Product quantization (PQ) — the 100 TB ANN memory-bandwidth tier.

IVF narrows *which* candidates a query scans (similarity.ivf_cosine_topk);
scalar int8 narrows *how many bytes per candidate* by 4× (quantize.py).
PQ (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
Neighbor Search") is the step beyond: split each D-dim vector into M
subvectors, learn a tiny k-means codebook per subspace, and store each
vector as M one-byte codes. A float32[64] corpus row is 256 B; its PQ
code with M=4 is 4 B — a 64× cut in the bytes every scan moves, which
at 100 TB is the difference between an in-memory candidate sweep and a
disk-bound one. IVF+PQ is the canonical billion-scale ANN layout
(FAISS's IVFPQ); this module supplies the PQ half with the repo's
cross-engine exactness discipline.

Everything is integer fixed point so the DuckDB oracle replays training,
encoding, and ranking bitwise:

- coordinates enter integer space as ``floor(x * 1e6)`` (one IEEE double
  multiply both engines perform identically — the quantize.py rule);
- assignment is integer squared-L2 (terms ≤ (2·1e6)² · dsub ≈ 2.6e14,
  BIGINT-safe), ties to the lowest code id;
- centroid updates are per-dimension integer means via sign-split
  truncating division (pca._sdiv — the only signed form Spark's ``div``
  and DuckDB's ``//`` agree on). Integer SUM is associative and
  order-free, so unlike the float spherical k-means in similarity.py no
  sorted-fold pinning is needed and the update is one map-side
  combinable aggregate — nothing corpus-sized is ever collected;
- ADC scoring is ``Σ_m LUT[m][code_m]`` with ``LUT[m][c] =
  dot_int(q6_sub_m, codebook[m][c])`` (≤ 64·1e12, BIGINT-safe).

Scale shape: ``train_pq`` is driver-paced Lloyd rounds (the bpe/pagerank
discipline — one assignment projection + ONE (sub, code, dim) aggregate
per round, M·ksub·dsub scalars to the driver, staged input
localCheckpointed once). Train on a bounded ``sampling.hash_sample`` —
the standard PQ recipe — then ``pq_encode`` the full corpus as a
zero-shuffle scan-local projection. ``pq_adc_topk`` broadcasts the
(small) query set with precomputed integer LUTs and reuses
similarity.topk_per_query's two-stage partial rank, so the corpus is
never shuffled before ranking and no task sorts more than its own
partition's candidates.

The reference has no vector surface (it parses documents,
/root/reference/main.py:72-147); this is a SURVEY §6 scale-path tier
composing with similarity.py / quantize.py on the same tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.pca import _sdiv
from rag_document_parser_spark.operators.similarity import topk_per_query

__all__ = ["train_pq", "pq_encode", "pq_adc_topk", "codebook_rows"]

E6 = 1_000_000


def _x6(vec: Column) -> Column:
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(E6)))
        .cast("long"))


def _clean(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    # mirrored in every SQL twin: non-null, exactly dim coordinates
    return df.where(F.col(vec_col).isNotNull()
                    & (F.size(F.col(vec_col)) == dim))


def _subvectors(df: DataFrame, m_sub: int, dim: int, vec_col: str,
                id_col: str) -> DataFrame:
    """``(_i, sub, sv)``: the doc's M dsub-long integer subvectors."""
    dsub = dim // m_sub
    staged = _clean(df, vec_col, dim).select(
        F.col(id_col).alias("_i"), _x6(F.col(vec_col)).alias("_v6"))
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda s: F.slice("_v6", s * dsub + 1, dsub))
    return staged.select(
        "_i", F.posexplode(slices).alias("sub", "sv"))


def _books_literal(books: list[list[list[int]]]) -> Column:
    """Nested literal: books[sub][cid] -> array<long> centroid."""
    return F.array(*[
        F.array(*[
            F.struct(F.lit(cid).alias("cid"),
                     F.lit([int(x) for x in c]).cast("array<long>")
                     .alias("c"))
            for cid, c in enumerate(sub_book)])
        for sub_book in books])


def _nearest_code(sv: Column, book_for_sub: Column) -> Column:
    """Lowest-(dist, cid) code id: integer squared-L2 argmin."""
    scored = F.transform(
        book_for_sub,
        lambda s: F.struct(
            F.aggregate(F.zip_with(sv, s["c"],
                                   lambda x, c: (x - c) * (x - c)),
                        F.lit(0).cast("long"),
                        lambda acc, v: acc + v).alias("dist"),
            s["cid"].alias("cid")))
    return F.element_at(F.array_sort(scored), 1)["cid"]


def train_pq(corpus: DataFrame, m_sub: int = 4, ksub: int = 8,
             iters: int = 2, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[int]]]:
    """Per-subspace Lloyd k-means in integer space; returns
    ``books[sub][cid] = [coord_e6, ...]`` (dsub longs each).

    Deterministic and oracle-replayable: init = subvectors of the ksub
    lowest-id clean vectors (seed cid = id rank); assignment ties break
    to the lowest cid; the centroid update is the per-dimension
    sign-split truncating-division mean of the assigned integer
    coordinates — order-free, so it needs no collect_list and is
    map-side combinable; an empty cluster keeps its previous centroid.

    Driver traffic per round: one (sub, code, dim) aggregate of
    M·ksub·dsub rows. TRAIN ON A BOUNDED SAMPLE (the FAISS recipe:
    ~100k-1M vectors via ``sampling.hash_sample``); full-corpus
    encoding afterwards is ``pq_encode``'s zero-shuffle projection.
    """
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    sv = _subvectors(corpus, m_sub, dim, vec_col, id_col).localCheckpoint()

    seed_ids = [r[0] for r in _clean(corpus, vec_col, dim)
                .select(id_col).orderBy(id_col).limit(ksub).collect()]
    if len(seed_ids) < ksub:
        raise ValueError(
            f"train_pq: need {ksub} clean seed vectors, found "
            f"{len(seed_ids)}")
    rank = {i: r for r, i in enumerate(seed_ids)}
    seeds = (sv.where(F.col("_i").isin(seed_ids))
             .select("_i", "sub", "sv").collect())
    books: list[list[list[int]]] = [[None] * ksub for _ in range(m_sub)]
    for r in seeds:
        books[r["sub"]][rank[r["_i"]]] = [int(x) for x in r["sv"]]

    for _ in range(iters):
        lit_books = _books_literal(books)
        assigned = sv.select(
            "sub", "sv",
            _nearest_code(F.col("sv"),
                          F.element_at(lit_books, F.col("sub") + 1))
            .alias("code"))
        agg = (assigned.select("sub", "code",
                               F.posexplode("sv").alias("d", "x"))
               .groupBy("sub", "code", "d")
               .agg(F.sum("x").alias("s"), F.count("*").alias("n")))
        got: dict[tuple[int, int], dict[int, int]] = {}
        for r in agg.collect():
            coord = ((1 if r["s"] > 0 else -1 if r["s"] < 0 else 0)
                     * (abs(r["s"]) // r["n"]))
            got.setdefault((r["sub"], r["code"]), {})[r["d"]] = coord
        books = [[([got[(s, c)][d] for d in range(dsub)]
                   if (s, c) in got else books[s][c])
                  for c in range(ksub)]
                 for s in range(m_sub)]
    return books


def codebook_rows(spark, books: list[list[list[int]]]) -> DataFrame:
    """Long-form ``(sub, cid, dim, coord_e6)`` view of a trained book."""
    rows = [(s, c, d, int(v))
            for s, sub_book in enumerate(books)
            for c, cvec in enumerate(sub_book)
            for d, v in enumerate(cvec)]
    return spark.createDataFrame(
        rows, "sub long, cid long, dim long, coord_e6 long")


def pq_encode(corpus: DataFrame, books: list[list[list[int]]],
              dim: int = 64, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """``(id, codes array<int>)`` — the M-byte row the ANN scan reads.

    Pure scan-local projection (zero shuffles, stays in the codegen
    span): codes[m] = nearest codebook entry of subspace m under
    integer squared-L2, ties to the lowest cid.
    """
    m_sub = len(books)
    dsub = dim // m_sub
    lit_books = _books_literal(books)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda s: _nearest_code(F.slice("_v6", s * dsub + 1, dsub),
                                F.element_at(lit_books, s + 1))
        .cast("int"))
    return (_clean(corpus, vec_col, dim)
            .select(F.col(id_col), _x6(F.col(vec_col)).alias("_v6"))
            .select(id_col, codes.alias("codes")))


def pq_adc_topk(corpus: DataFrame, queries: DataFrame,
                books: list[list[list[int]]], k: int = 10,
                dim: int = 64, id_col: str = "vec_id",
                query_id_col: str = "query_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance top-k: ``(query_id, vec_id, iscore, rank)``.

    The query stays un-quantized (ADC — the accurate PQ mode): each
    query precomputes an integer lookup table ``LUT[m][c] =
    dot_int(q6_sub_m, books[m][c])``, then a corpus row's score is M
    array lookups summed — no per-candidate dot product at all. The
    query side (with LUTs) broadcasts; the corpus is scanned once
    through ``pq_encode``'s projection and never shuffled before the
    two-stage partial rank. ``iscore ≈ 1e12 · dot(q, dequantized(v))``;
    ties break by ascending id so selection is partitioning-invariant.
    """
    m_sub = len(books)
    dsub = dim // m_sub
    lit_books = _books_literal(books)
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda s: F.transform(
            F.element_at(lit_books, s + 1),
            lambda st: F.aggregate(
                F.zip_with(F.slice("_q6", s * dsub + 1, dsub), st["c"],
                           lambda x, c: x * c),
                F.lit(0).cast("long"), lambda acc, v: acc + v)))
    q = (_clean(queries, vec_col, dim)
         .select(F.col(query_id_col).alias("query_id"),
                 _x6(F.col(vec_col)).alias("_q6"))
         .select("query_id", lut.alias("_lut")))
    enc = pq_encode(corpus, books, dim=dim, id_col=id_col,
                    vec_col=vec_col)
    score = F.aggregate(
        F.zip_with("_lut", "codes",
                   lambda l, c: F.element_at(l, c + 1)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (enc.crossJoin(F.broadcast(q))
              .select("query_id", F.col(id_col).alias("vec_id"),
                      score.alias("iscore")))
    return topk_per_query(scored, k, "query_id", "vec_id", "iscore")
