"""Luhn-validated card detection (pii.detect_cards) and the
reputation-derived source gate (textstats.source_reputation /
gate_by_source_reputation)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_document_parser_spark.operators.pii import detect_cards
from rag_document_parser_spark.operators.textstats import (
    gate_by_source_reputation, source_reputation)


def _luhn_py(digits: str) -> bool:
    """Independent pure-Python twin of the SQL Luhn fold."""
    n = len(digits)
    if not (13 <= n <= 19):
        return False
    tot = 0
    for i, ch in enumerate(digits, start=1):
        d = int(ch)
        if (n - i) % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        tot += d
    return tot % 10 == 0


CASES = [
    ("valid16", "pay 4111111111111111 now", 1, 1, "pay <CARD> now"),
    ("dashes", "c 4111-1111-1111-1111 r", 1, 1, "c <CARD> r"),
    ("spaces_bad", "n 4111 1111 1111 1112 b", 1, 0,
     "n 4111 1111 1111 1112 b"),
    ("toolong", "s 12345678901234567890 x", 0, 0,
     "s 12345678901234567890 x"),
    ("two_valid", "a 378282246310005 v 4222222222222", 2, 2,
     "a <CARD> v <CARD>"),
    ("tooshort", "q 123456789012 r", 0, 0, "q 123456789012 r"),
    ("none", "no digits here", 0, 0, "no digits here"),
]


def test_detect_cards(spark):
    df = spark.createDataFrame(
        [(k, t) for k, t, *_ in CASES], "doc_id string, text string")
    got = {r["doc_id"]: r for r in detect_cards(df).collect()}
    for k, _, nc, nv, red in CASES:
        r = got[k]
        assert (r["n_card_candidates"], r["n_card_valid"],
                r["redacted"]) == (nc, nv, red), k


def test_luhn_matches_python_twin(spark):
    # every 13..19-digit prefix of a fixed digit stream, judged by the
    # Spark fold and by the independent Python implementation
    stream = "4539578763621486" + "279927398717557"
    probes = [stream[:n] for n in range(13, 20)]
    df = spark.createDataFrame(
        [(p, f"x {p} y") for p in probes], "doc_id string, text string")
    got = {r["doc_id"]: r["n_card_valid"]
           for r in detect_cards(df).collect()}
    for p in probes:
        assert got[p] == int(_luhn_py(p)), p


def test_detect_cards_zero_exchange(spark):
    """Row-local projection: no Exchange anywhere in the plan."""
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    plan = (detect_cards(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


@pytest.fixture()
def rep_corpus(spark):
    # srcA: clean; srcB: all docs one shared body (dup block);
    # srcC: mostly junk (quality block); srcD: degraded but below the
    # min_docs support bar, must NOT block
    rows = []
    for i in range(10):
        rows.append((f"a{i}", "srcA", f"clean document body number {i} "
                     "with enough real words to pass"))
        rows.append((f"b{i}", "srcB", "same boilerplate body every time"))
        rows.append((f"c{i}", "srcC", "#@ 12" if i else
                     "one clean page with enough words here"))
    rows.append(("d0", "srcD", "#!"))
    return spark.createDataFrame(rows, "doc_id string, source string, "
                                 "text string")


def test_source_reputation(rep_corpus):
    got = {r["source"]: r for r in source_reputation(
        rep_corpus, min_docs=5).collect()}
    assert got["srcA"]["blocked"] == 0
    assert got["srcB"]["blocked"] == 1 and got["srcB"]["n_uniq"] == 1
    assert got["srcC"]["blocked"] == 1
    assert got["srcC"]["pass_rate_e6"] == 100_000
    assert got["srcD"]["blocked"] == 0  # support gate
    assert got["srcA"]["dup_rate_e6"] == 0
    assert got["srcB"]["dup_rate_e6"] == 900_000


def test_gate_by_source_reputation(rep_corpus):
    kept = gate_by_source_reputation(rep_corpus, min_docs=5)
    srcs = {r["source"] for r in kept.select("source").distinct().collect()}
    assert srcs == {"srcA", "srcD"}
    assert kept.count() == 11


def test_gate_corpus_side_is_broadcast(rep_corpus):
    """The corpus leg anti-joins the blocklist BROADCAST — the corpus
    never shuffles for the gate."""
    plan = (gate_by_source_reputation(rep_corpus, min_docs=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


# ---- IBAN detection (ISO 13616 mod-97) ----------------------------------

from rag_document_parser_spark.operators.pii import detect_ibans


def test_iban_iso_examples_validate(spark):
    rows = [
        (1, "pay GB82WEST12345698765432 now"),       # ISO example, valid
        (2, "ref GB82WEST12345698765433 here"),      # corrupted tail
        (3, "DE89370400440532013000 FR1420041010050500013M02606"),
        (4, "no ibans, THISISNOTANIBAN123 text"),
    ]
    got = {r["doc_id"]: r for r in detect_ibans(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert (got[1]["n_iban_candidates"], got[1]["n_iban_valid"]) == (1, 1)
    assert got[1]["redacted"] == "pay <IBAN> now"
    assert (got[2]["n_iban_candidates"], got[2]["n_iban_valid"]) == (1, 0)
    assert "GB82WEST" in got[2]["redacted"]          # invalid untouched
    assert got[3]["n_iban_valid"] == 2
    assert got[3]["redacted"] == "<IBAN> <IBAN>"
    assert (got[4]["n_iban_candidates"], got[4]["n_iban_valid"]) == (0, 0)


def test_iban_python_twin_mod97(spark):
    """The engine checksum equals the textbook big-integer mod-97."""
    import random
    rng = random.Random(3)
    cands = []
    for _ in range(20):
        body = "".join(rng.choice("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ")
                       for _ in range(16))
        cands.append("GB" + f"{rng.randint(0, 99):02d}" + body)

    def textbook(s):
        r = s[4:] + s[:4]
        num = "".join(str(int(ch, 36)) for ch in r)
        return int(num) % 97 == 1

    df = spark.createDataFrame(
        [(i, f"x {c} y") for i, c in enumerate(cands)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["n_iban_valid"]
           for r in detect_ibans(df).collect()}
    for i, c in enumerate(cands):
        assert got[i] == (1 if textbook(c) else 0), c
