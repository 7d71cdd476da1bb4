"""Context-window chunking (`operators.chunking`) and repeated-window
substring signals (`operators.repetition.repeated_windows`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.chunking import chunk_documents
from rag_document_parser_spark.operators.repetition import (
    repeated_window_fraction,
    repeated_windows,
)


# ---------------------------------------------------------------- chunking

@pytest.fixture(scope="module")
def chunk_corpus(spark):
    return spark.createDataFrame(
        [("d1", " ".join(f"t{i}" for i in range(1, 11))),   # 10 tokens
         ("d2", "alpha beta gamma"),                        # shorter than max
         ("d3", "")],                                       # empty
        ["doc_id", "text"])


def test_chunk_boundaries(chunk_corpus):
    out = chunk_documents(chunk_corpus, max_tokens=4, overlap=1)
    rows = sorted([(r["doc_id"], r["chunk_idx"], r["start_tok"],
                    r["n_tok"], r["chunk_text"]) for r in out.collect()])
    assert rows == [
        ("d1", 0, 0, 4, "t1 t2 t3 t4"),
        ("d1", 1, 3, 4, "t4 t5 t6 t7"),
        ("d1", 2, 6, 4, "t7 t8 t9 t10"),
        ("d2", 0, 0, 3, "alpha beta gamma"),
    ]


def test_chunk_full_coverage(spark):
    """Every token of every doc appears in some chunk; consecutive
    chunks overlap by exactly `overlap` tokens except the last."""
    docs = spark.createDataFrame(
        [(f"d{n}", " ".join(f"w{i}" for i in range(n)))
         for n in range(1, 40)], ["doc_id", "text"])
    out = chunk_documents(docs, max_tokens=7, overlap=3).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n = int(doc_id[1:])
        rows.sort(key=lambda r: r["chunk_idx"])
        covered = set()
        for r in rows:
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
            assert r["n_tok"] == len(r["chunk_text"].split())
        assert covered == set(range(n))
        for a, b in zip(rows, rows[1:]):
            assert b["start_tok"] - a["start_tok"] == 7 - 3


def test_chunk_zero_shuffle(chunk_corpus):
    plan = chunk_documents(chunk_corpus, 8, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_validation(chunk_corpus):
    with pytest.raises(ValueError):
        chunk_documents(chunk_corpus, max_tokens=4, overlap=4)


# ---------------------------------------------------- repeated windows

@pytest.fixture(scope="module")
def window_corpus(spark):
    return spark.createDataFrame(
        [("d1", "a b c d e f"),
         ("d2", "z z a b c d q"),
         ("d3", "p q r"),
         ("d4", "x y")],
        ["doc_id", "text"])


def test_repeated_windows(window_corpus):
    rep = repeated_windows(window_corpus, window=3).collect()
    # 'a b c' and 'b c d' occur in both d1 and d2; nothing else repeats
    assert sorted((r["n_docs"], r["n_occurrences"]) for r in rep) == \
        [(2, 2), (2, 2)]


def test_repeated_window_fraction(window_corpus):
    out = {r["doc_id"]: (r["n_windows"], r["n_repeated"], r["repeated_e6"])
           for r in repeated_window_fraction(window_corpus,
                                             window=3).collect()}
    assert out["d1"] == (4, 2, 2 * 1_000_000 // 4)
    assert out["d2"] == (5, 2, 2 * 1_000_000 // 5)
    assert out["d3"] == (1, 0, 0)
    assert out["d4"] == (0, 0, 0)      # shorter than one window


def test_repeated_partition_invariance(window_corpus):
    a = sorted(map(tuple, repeated_window_fraction(
        window_corpus, window=3).collect()))
    b = sorted(map(tuple, repeated_window_fraction(
        window_corpus.repartition(5), window=3).collect()))
    assert a == b


def _tokenizer_evals(df):
    """Occurrences of the words() tokenizer in the optimized plan —
    must be exactly one per scan branch (SPARK-36718 staging)."""
    return df._jdf.queryExecution().optimizedPlan().toString() \
        .count("split(lower(")


def test_plans_tokenize_once_per_scan(window_corpus):
    assert _tokenizer_evals(chunk_documents(window_corpus, 8, 2)) == 1
    assert _tokenizer_evals(repeated_windows(window_corpus, window=3)) == 1
    # fraction reads the corpus twice (blacklist + per-doc): 2 scans
    assert _tokenizer_evals(
        repeated_window_fraction(window_corpus, window=3)) == 2
