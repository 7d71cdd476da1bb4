"""Physical-plan shape pins for the round-4 continuation operators:
the scale claims in each docstring (broadcast join here, exactly one
exchange there) asserted structurally, so a regression that silently
degrades a broadcast to a sort-merge join or adds a shuffle fails a
test instead of a 100 TB run."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _counts(df):
    p = _plan(df)
    return {
        "exchange": len(re.findall(r"Exchange hashpartitioning", p)),
        "bcast": len(re.findall(r"BroadcastHashJoin", p)),
        "smj": len(re.findall(r"SortMergeJoin", p)),
        "window": len(re.findall(r"\bWindow \[", p)),
        "plan": p,
    }


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, " ".join(f"w{(i * j) % 17}" for j in range(30)))
         for i in range(40)],
        ["doc_id", "text"])


def test_texttiling_one_exchange_one_window(docs):
    """Gap scoring lives in the scan projection; the only shuffle is
    the per-doc depth window, and both ±p frames share ONE Window op."""
    from rag_document_parser_spark.operators.tiling import texttiling
    c = _counts(texttiling(docs, w=5, p=2))
    assert c["exchange"] == 1, c["plan"]
    assert c["window"] == 1, c["plan"]
    assert c["smj"] == 0 and c["bcast"] == 0, c["plan"]


def test_phrase_match_broadcast_never_smj(spark, docs):
    """Query terms and lengths ride broadcasts; the corpus-side
    postings never sort-merge on the Zipf-skewed term key."""
    from rag_document_parser_spark.operators.retrieval import phrase_match
    qs = spark.createDataFrame([(1, "w0 w1")], ["query_id", "text"])
    c = _counts(phrase_match(docs, qs))
    assert c["smj"] == 0, c["plan"]
    assert c["bcast"] == 2, c["plan"]          # qterms + qlen
    assert c["exchange"] <= 2, c["plan"]       # anchor agg + pair agg


def test_source_sketch_two_stage_rank(spark, docs):
    """Bottom-k per source: distinct + the two-stage partial rank —
    three exchanges, two windows, never one task sorting a whole
    source."""
    from rag_document_parser_spark.operators.corpstats import source_sketch
    sdocs = docs.withColumn("source", (F.col("doc_id") % 3).cast("string"))
    c = _counts(source_sketch(sdocs, k=4))
    assert c["exchange"] == 3, c["plan"]
    assert c["window"] == 2, c["plan"]
    assert c["smj"] == 0, c["plan"]


def test_media_remap_broadcast_map_single_regroup(spark):
    """The dup→keeper map broadcasts; re-assembly pays the one wide
    groupBy on the doc key and nothing else shuffles."""
    from rag_document_parser_spark.operators.multimodal import (
        remap_media_refs)
    from rag_document_parser_spark.schema import INPUT_SCHEMA
    spans = spark.createDataFrame(
        [("d1", [("image", None, "r1", 0)])], INPUT_SCHEMA)
    rm = spark.createDataFrame(
        [("r1", "r0", True)],
        "media_ref string, keeper_ref string, is_dup boolean")
    c = _counts(remap_media_refs(spans, rm))
    assert c["bcast"] == 1, c["plan"]
    assert c["smj"] == 0, c["plan"]
    assert c["exchange"] <= 2, c["plan"]


def test_kn_score_all_model_joins_broadcast(docs):
    """Every Kneser-Ney model table (bigram discount, lambda, cont)
    joins by broadcast under broadcast_lm=True — the corpus bigram
    stream never sort-merges on a Zipf-skewed key."""
    from rag_document_parser_spark.operators.lm import score_kn_bigram_lm
    c = _counts(score_kn_bigram_lm(docs))
    assert c["smj"] == 0, c["plan"]
    assert c["bcast"] >= 3, c["plan"]
