"""Deterministic sampling operators (operators/sampling.py)."""

import pyspark.sql.functions as F
import pytest

from rag_document_parser_spark.operators import sampling as SAM
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(r[0] for r in
               SAM.hash_sample(docs, 0.3, salt="t").select("doc_id").collect())
    b = sorted(r[0] for r in
               SAM.hash_sample(docs.repartition(13), 0.3, salt="t")
               .select("doc_id").collect())
    assert a == b and len(a) > 0
    n = docs.count()
    # 32 digest bits: observed rate within a loose binomial envelope
    assert 0.15 * n < len(a) < 0.45 * n


def test_hash_sample_salts_are_independent_draws(spark):
    docs = _docs(spark)
    a = {r[0] for r in SAM.hash_sample(docs, 0.3, salt="t1")
         .select("doc_id").collect()}
    b = {r[0] for r in SAM.hash_sample(docs, 0.3, salt="t2")
         .select("doc_id").collect()}
    assert a != b  # fresh digest bits per salt


def test_hash_sample_rate_bounds(spark):
    docs = _docs(spark)
    assert SAM.hash_sample(docs, 0.0).count() == 0
    assert SAM.hash_sample(docs, 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        SAM.hash_sample(docs, 1.5)


def test_stratified_sample_exact_quota_and_two_stage_parity(spark):
    docs = _docs(spark)
    out = SAM.stratified_sample(docs, k=5, strata_col="lang", salt="q")
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(5, n) for lang, n in sizes.items()}
    # parity with the naive single-window draw, regardless of partitioning
    naive = docs.withColumn("_k", SAM.sample_key(F.col("doc_id"), "q"))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(F.asc("_k"), F.asc("doc_id"))
    want = {(r["lang"], r["doc_id"], r["rk"]) for r in
            naive.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 5).collect()}
    got = {(r["lang"], r["doc_id"], r["sample_rank"]) for r in
           SAM.stratified_sample(docs.repartition(17), k=5,
                                 strata_col="lang", salt="q").collect()}
    assert got == want
