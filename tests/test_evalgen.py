"""Needle-probe generation (operators/evalgen.py): token-accurate
depth geometry, needle recoverability, short-doc exclusion."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.evalgen import needle_probes


@pytest.fixture(scope="module")
def hay(spark):
    long_doc = " ".join(f"tok{i}" for i in range(100))
    return spark.createDataFrame(
        [(1, long_doc), (2, "too short for a haystack")],
        ["doc_id", "text"])


def test_depth_geometry_exact(hay):
    out = {r["probe_id"]: r for r in
           needle_probes(hay, context_tokens=50,
                         depths=(0, 50, 100)).collect()}
    assert set(out) == {"1-0", "1-50", "1-100"}   # short doc excluded
    for pid, want_pos in [("1-0", 0), ("1-50", 25), ("1-100", 50)]:
        r = out[pid]
        assert r["insert_pos"] == want_pos
        toks = r["context"].split(" ")
        # needle's first token sits exactly after insert_pos haystack
        # tokens
        assert toks[want_pos] == "the" and "secret" in toks
        assert r["n_tokens"] == len(
            [t for t in re.split(r"[^a-z0-9]+", r["context"].lower())
             if t])


def test_answer_recoverable_and_unique(hay):
    rows = needle_probes(hay, context_tokens=50).collect()
    answers = set()
    for r in rows:
        assert f"is {r['answer']}" in r["context"]
        assert re.fullmatch(r"[0-9a-f]{12}", r["answer"])
        answers.add(r["answer"])
    assert len(answers) == len(rows)              # unique per probe


def test_haystack_tokens_preserved_around_needle(hay):
    r = [x for x in needle_probes(hay, context_tokens=50,
                                  depths=(50,)).collect()][0]
    toks = r["context"].split(" ")
    assert toks[:25] == [f"tok{i}" for i in range(25)]
    assert toks[-25:] == [f"tok{i}" for i in range(25, 50)]
