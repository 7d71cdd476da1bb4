"""Model-free document vectorization: the feature-hashing trick.

Maps each document's token multiset into a fixed ``dim``-dimensional
signed-count vector (Weinberger et al. 2009 "Feature Hashing for Large
Scale Multitask Learning"): every token hashes to a bucket
``md5(term) mod dim`` and a sign ±1 from an independent digest digit,
and the vector is the per-bucket signed sum. No trained model, no
vocabulary table, bounded width at any corpus size — the standard way
to get embedding-shaped inputs for the similarity/near-dup tier
(``similarity.cosine_topk``, ``embedding_near_dup``, ``semdedup``)
when no learned embeddings exist yet.

The reference has no corpus tier (per-file processing,
/root/reference/main.py:72-147); this is a scale-path addition in the
spirit of SURVEY §6's LLM-data operators. Pure Catalyst — md5 +
integer arithmetic, no UDFs — and md5-derived so the DuckDB oracle
recomputes it exactly.

Scale shape: tokenize (staged as a bound attribute), explode, then ONE
map-side-combinable groupBy on doc_id. The dense form aggregates
``dim`` conditional sums in a single pass — combiner state is ``dim``
longs per in-flight doc, no posting lists, no term-keyed shuffle at
all (the hash replaces the vocabulary join that makes bag-of-words
pipelines skew on stopwords).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words

__all__ = ["feature_hash_sparse", "feature_hash_vectors", "mean_pool",
           "truncate_normalize"]


def _bucket(term: Column, dim: int) -> Column:
    """md5-derived bucket in [0, dim): first 15 hex digits (60 bits)."""
    return F.pmod(F.conv(F.substring(F.md5(term), 1, 15), 16, 10)
                  .cast("long"), F.lit(dim))


def _sign(term: Column) -> Column:
    """±1 from the 16th hex digit's parity — independent of the bucket
    bits, which is what makes hash collisions cancel in expectation
    (the unbiasedness argument of the hashing trick)."""
    return F.when(F.pmod(F.conv(F.substring(F.md5(term), 16, 1), 16, 10)
                         .cast("long"), F.lit(2)) == 0,
                  F.lit(1)).otherwise(F.lit(-1))


def _hashed(df: DataFrame, text_col: str, id_col: str,
            dim: int) -> DataFrame:
    toks = df.select(F.col(id_col).alias("id"),
                     words(F.col(text_col)).alias("_t"))
    flat = (toks.select("id", F.explode_outer("_t").alias("term"))
            .where(F.col("term").isNotNull()))
    return flat.select("id", _bucket(F.col("term"), dim).alias("bucket"),
                       _sign(F.col("term")).alias("s"))


def feature_hash_sparse(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", dim: int = 64) -> DataFrame:
    """Sparse form: one ``(doc_id, bucket, weight)`` row per NONZERO
    bucket (signed counts can cancel to zero; those buckets are
    dropped, matching the dense form's zeros). The sparse form is the
    oracle-checked one — and the storage-efficient one when
    ``dim >> avg doc vocabulary``."""
    h = _hashed(df, text_col, id_col, dim)
    return (h.groupBy("id", "bucket")
            .agg(F.sum("s").alias("weight"))
            .where(F.col("weight") != 0)
            .select(F.col("id").alias(id_col),
                    F.col("bucket").cast("long").alias("bucket"),
                    F.col("weight").cast("long").alias("weight")))


def feature_hash_vectors(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", dim: int = 64,
                         as_float: bool = False) -> DataFrame:
    """Dense form: ``(doc_id, vec array<long>, n_tokens)`` with
    ``vec[b] = Σ sign(term)`` over the doc's tokens hashing to bucket
    ``b``. ``as_float=True`` casts to ``array<float>`` for direct use
    as the ``embedding`` column of the similarity tier.

    One groupBy(doc_id) computing ``dim`` conditional sums in a single
    aggregation pass — map-side combinable, no term-keyed shuffle.
    Docs with zero tokens still emit a row (all-zero vector) so the
    output stays 1:1 with the input corpus.
    """
    toks = df.select(F.col(id_col).alias("id"),
                     words(F.col(text_col)).alias("_t"))
    flat = toks.select("id", F.explode_outer("_t").alias("term"))
    b, s = _bucket(F.col("term"), dim), _sign(F.col("term"))
    staged = flat.select("id", F.when(F.col("term").isNotNull(), b)
                         .alias("bucket"),
                         F.when(F.col("term").isNotNull(), s).alias("s"))
    sums = [F.coalesce(F.sum(F.when(F.col("bucket") == i, F.col("s"))),
                       F.lit(0)).cast("long").alias(f"_b{i}")
            for i in range(dim)]
    agg = staged.groupBy("id").agg(
        *sums, F.count("bucket").cast("long").alias("n_tokens"))
    vec = F.array(*[F.col(f"_b{i}") for i in range(dim)])
    if as_float:
        vec = vec.cast("array<float>")
    return agg.select(F.col("id").alias(id_col), vec.alias("vec"),
                      "n_tokens")


def mean_pool(df: DataFrame, group_col: str, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Chunk→document embedding pooling: per-group per-dimension mean.

    Retrieval corpora embed CHUNKS; ranking, dedup, and clustering often
    want one vector per DOCUMENT — the standard construction is the
    mean of the document's chunk embeddings. Output is long form
    ``(group_col, dim, mean_e6, n_vecs)``: coordinates floor-quantized
    to 1e-6 fixed point before the mean (sign-split truncating division
    by the group count — the pca.py engine-parity discipline), so the
    result is an exact integer any engine reproduces.

    Scale shape: one posexplode + ONE map-side-combinable groupBy on
    (group, dim) — group keys are uniform doc ids, combiner state is a
    (sum, count) pair per in-flight (group, dim); no vector ever
    collects to the driver.
    """
    from rag_document_parser_spark.operators.pca import _sdiv

    ex = (df.select(F.col(group_col).alias("grp"),
                    F.posexplode(F.col(vec_col)).alias("dim", "x"))
          .select("grp", "dim",
                  F.floor(F.col("x").cast("double") * 1_000_000)
                  .cast("long").alias("x6")))
    agg = (ex.groupBy("grp", "dim")
           .agg(F.sum("x6").alias("s"), F.count("*").alias("n")))
    return agg.select(F.col("grp").alias(group_col),
                      F.col("dim").cast("long"),
                      _sdiv(F.col("s"), F.col("n")).alias("mean_e6"),
                      F.col("n").cast("long").alias("n_vecs"))


def truncate_normalize(df: DataFrame, m: int, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Matryoshka-style truncation: keep the first ``m`` dimensions and
    re-normalize to unit length (Kusupati et al. 2022 — MRL-trained
    embeddings keep their semantics under prefix truncation, the
    standard serving-time memory/recall dial).

    Long-form output ``(id_col, dim, val_e6)`` with
    ``val_e6 = x_e4 · 1e6 div isqrt(Σ_prefix x_e4²)`` — unit-norm in
    1e-6 fixed point via the exact integer sqrt; all-zero prefixes
    divide by a floor of 1 instead of erroring. Zero shuffles beyond
    one (id, dim)-preserving aggregate on the uniform id key.
    """
    from rag_document_parser_spark.operators.mixture import isqrt
    from rag_document_parser_spark.operators.pca import _sdiv

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode(F.slice(F.col(vec_col), 1, m))
                    .alias("dim", "x"))
          .select("id", "dim",
                  F.floor(F.col("x").cast("double") * 10_000)
                  .cast("long").alias("x4")))
    nrm = (ex.groupBy("id")
           .agg(F.greatest(isqrt(F.sum(F.col("x4") * F.col("x4"))),
                           F.lit(1).cast("long")).alias("nrm")))
    return (ex.join(nrm, "id")
            .select(F.col("id").alias(id_col), F.col("dim").cast("long"),
                    _sdiv(F.col("x4") * F.lit(1_000_000).cast("long"),
                          F.col("nrm")).alias("val_e6")))
