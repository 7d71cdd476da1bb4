"""Confusable-skeleton hardening (operators/confusables.py): the
skeleton transform vs a pure-Python twin, evasion-signal counts,
disguised-duplicate pairing (and what plain exact dedup misses),
no-false-merge on genuinely non-Latin text, and the zero-UDF plan."""

import pytest

from pyspark.sql import functions as F

from rag_document_parser_spark.operators import confusables as CF
from rag_document_parser_spark.operators.confusables import (
    INVISIBLES, SKELETON_MAP)


def _twin_skeleton(t):
    out = []
    for ch in t:
        if ch in INVISIBLES:
            continue
        out.append(SKELETON_MAP.get(ch, ch))
    return "".join(out)


DOCS = [
    ("1", "the quick brown fox jumps"),
    ("2", "the quick brоwn fоx jumps"),          # Cyrillic о ×2
    ("3", "the​ quick‍ brown fox jumps"),  # invisibles added
    ("4", "совершенно другой текст здесь"),      # real Cyrillic doc
    ("5", "the quick brown fox jumps"),          # raw-identical dup
    ("6", "αβγ δεζ real greek ϕράση"),           # real Greek doc
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_skeleton_matches_twin(spark, corpus):
    got = {r.doc_id: r.sk for r in corpus.select(
        "doc_id", CF.skeleton(F.col("text")).alias("sk")).collect()}
    for d, t in DOCS:
        assert got[d] == _twin_skeleton(t), d


def test_stats_count_rewrites(spark, corpus):
    got = {r.doc_id: r for r in CF.confusable_stats(corpus).collect()}
    assert (got["1"].n_confusables, got["1"].n_invisibles,
            got["1"].changed) == (0, 0, False)
    assert (got["2"].n_confusables, got["2"].changed) == (2, True)
    assert (got["3"].n_invisibles, got["3"].changed) == (2, True)
    assert got["4"].n_confusables > 0  # real Cyrillic also counts


def test_disguised_pairs_found_and_flagged(spark, corpus):
    pairs = {(r.id_a, r.id_b): r.disguised
             for r in CF.skeleton_dedup_pairs(corpus).collect()}
    assert pairs[("1", "2")] is True
    assert pairs[("1", "3")] is True
    assert pairs[("1", "5")] is False  # raw dup, not disguised
    # the genuinely non-Latin docs merge with nothing
    ids = {i for k in pairs for i in k}
    assert "4" not in ids and "6" not in ids
    # and plain byte-exact grouping would have missed the disguised two
    raw_groups = corpus.groupBy(F.md5("text")).count() \
        .where(F.col("count") > 1).count()
    assert raw_groups == 1  # only the 1/5 raw pair


def test_plan_zero_udf_zero_extra_shuffle(spark, corpus):
    plan = corpus.select(CF.skeleton(F.col("text"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # translate/regexp stay JVM-side
