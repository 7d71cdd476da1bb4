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


# ---------------------------------------------------------------------------
# sentence-boundary chunking
# ---------------------------------------------------------------------------


def test_sentence_chunks_greedy_packing(spark):
    from rag_document_parser_spark.operators.sentences import sentence_chunks

    # sentences of 3 / 4 / 5 / 2 tokens; max 8 -> chunks [3+4], [5+2]
    df = spark.createDataFrame(
        [(1, "one two three. four five six seven. "
             "a b c d e. tail words")],
        "doc_id long, text string")
    got = sorted((r["chunk_idx"], r["n_sents"], r["n_tok"], r["chunk_text"])
                 for r in sentence_chunks(df, max_tokens=8).collect())
    assert got == [
        (0, 2, 7, "one two three. four five six seven."),
        (1, 2, 7, "a b c d e. tail words"),
    ]


def test_sentence_chunks_never_splits_oversized_sentence(spark):
    from rag_document_parser_spark.operators.sentences import sentence_chunks

    df = spark.createDataFrame(
        [(1, "short one. " + " ".join(f"w{i}" for i in range(20))
             + ". after that")],
        "doc_id long, text string")
    got = {r["chunk_idx"]: r for r in
           sentence_chunks(df, max_tokens=8).collect()}
    # oversized middle sentence is its own chunk, intact
    assert got[1]["n_sents"] == 1 and got[1]["n_tok"] == 20
    assert got[0]["chunk_text"] == "short one."
    assert got[2]["chunk_text"] == "after that"


def test_sentence_chunks_edge_cases(spark):
    import pytest as _pt

    from rag_document_parser_spark.operators.sentences import sentence_chunks

    df = spark.createDataFrame(
        [(1, ""), (2, "no boundary here at all"), (3, None)],
        "doc_id long, text string")
    rows = sentence_chunks(df, max_tokens=8).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert 1 not in by_id and 3 not in by_id  # empty/null: no rows
    assert by_id[2]["n_sents"] == 1 and by_id[2]["n_tok"] == 5
    with _pt.raises(ValueError):
        sentence_chunks(df, max_tokens=0)


def test_sentence_chunks_zero_exchange_plan(spark):
    from rag_document_parser_spark.operators.sentences import sentence_chunks

    df = spark.createDataFrame([(1, "a b. c d.")],
                               "doc_id long, text string")
    plan = sentence_chunks(df, max_tokens=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ---- sentence-length burstiness -----------------------------------------

def test_burstiness_flat_vs_bursty(spark):
    from rag_document_parser_spark.operators.sentences import (
        sentence_burstiness)
    rows = [
        (1, "aaaa. bbbb. cccc."),                 # flat: equal lengths
        (2, "a. bbbbbbbbbbbbbbbb. cc."),           # bursty
        (3, ""),                                   # no sentences
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: (r["n_sentences"], r["mean_len_e3"], r["mad_e3"])
           for r in sentence_burstiness(df).collect()}
    # doc1 sentences: 'aaaa.', 'bbbb.', 'cccc.' -> lengths 5,5,5
    assert got[1] == (3, 5_000, 0)
    n2, mean2, mad2 = got[2]
    assert n2 == 3 and mad2 > 0
    # hand value: lengths 2,17,3 -> S=22, sum|li*3-22| = 16+29+13 = 58
    assert mean2 == 22_000 // 3
    assert mad2 == 58 * 1000 // 9
    assert got[3] == (0, None, None)
