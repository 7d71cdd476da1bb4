"""Sentence segmentation + sentence-level dedup
(operators/sentences.py): subset boundary semantics, order
preservation, every-occurrence removal, and the documented edge cases
(no boundary, empty/NULL text, min_len floor)."""

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.sentences import (
    sentence_dedup,
    sentences_expr,
    split_sentences,
)


def _split(spark, text):
    df = spark.createDataFrame([("a", text)], ["doc_id", "text"])
    return df.select(sentences_expr(F.col("text")).alias("s")) \
             .collect()[0]["s"]


def test_boundary_subset_semantics(spark):
    assert _split(spark, "One here. Two there! Three? Four") == \
        ["One here.", "Two there!", "Three?", "Four"]
    # punctuation at end-of-text: no trailing empty sentence
    assert _split(spark, "Only one.") == ["Only one."]
    # whitespace run (incl. newlines) consumed, punctuation kept
    assert _split(spark, "A.\n\n  B.") == ["A.", "B."]
    # documented subset: no abbreviation list — "Dr. Smith" splits
    assert _split(spark, "Dr. Smith arrived.") == ["Dr.", "Smith arrived."]
    # mid-word periods don't split (no following whitespace)
    assert _split(spark, "v1.2 shipped. ok") == ["v1.2 shipped.", "ok"]
    assert _split(spark, "") == []
    assert _split(spark, "no boundary at all") == ["no boundary at all"]


def test_split_sentences_rows(spark):
    df = spark.createDataFrame(
        [("d1", "Alpha. Beta! Gamma?"), ("d2", "Single"), ("d3", "")],
        ["doc_id", "text"])
    rows = [(r["doc_id"], r["sent_idx"], r["sentence"], r["n_sents"])
            for r in split_sentences(df).orderBy("doc_id",
                                                 "sent_idx").collect()]
    assert rows == [("d1", 0, "Alpha.", 3), ("d1", 1, "Beta!", 3),
                    ("d1", 2, "Gamma?", 3), ("d2", 0, "Single", 1)]


BANNER = "All rights reserved."


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", f"Unique opener one. {BANNER} Unique closer one."),
        ("d2", f"Second doc intro! {BANNER} Second doc outro?"),
        ("d3", "Totally unrelated content. Nothing shared here."),
        ("d4", BANNER),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_sentence_dedup_removes_every_occurrence(corpus):
    out = {r["doc_id"]: r for r in sentence_dedup(corpus,
                                                  min_docs=2).collect()}
    assert out["d1"]["n_sentences"] == 3 and out["d1"]["n_removed"] == 1
    assert out["d1"]["cleaned"] == "Unique opener one. Unique closer one."
    assert out["d2"]["cleaned"] == "Second doc intro! Second doc outro?"
    assert out["d3"]["n_removed"] == 0
    assert "shared here" in out["d3"]["cleaned"]
    # banner-only doc: everything removed, empty residue
    assert out["d4"] ["n_removed"] == 1 and out["d4"]["cleaned"] == ""


def test_sentence_dedup_min_docs_threshold(corpus):
    out = {r["doc_id"]: r["n_removed"]
           for r in sentence_dedup(corpus, min_docs=4).collect()}
    assert all(v == 0 for v in out.values())


def test_sentence_dedup_min_len_floor(spark):
    rows = [("a", "Hm. The real sentence stays."),
            ("b", "Hm. Another genuine sentence here.")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           sentence_dedup(df, min_docs=2, min_len=5).collect()}
    # "Hm." recurs but is below the length floor — never removed
    assert out["a"]["n_removed"] == 0 and "Hm." in out["a"]["cleaned"]
