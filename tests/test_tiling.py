"""TextTiling topical segmentation (operators/tiling.py): boundary
placement at planted topic shifts, hand-checked Jaccard gap scores, a
pure-Python twin of the depth rule, and partition invariance."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.tiling import (
    texttiling,
    texttiling_segments,
)


def _topic(base: str, n: int) -> str:
    return " ".join(f"{base}{i % 10}" for i in range(n))


@pytest.fixture(scope="module")
def tiled(spark):
    # three disjoint-vocabulary topics of 40 tokens each
    doc = " ".join([_topic("alpha", 40), _topic("beta", 40),
                    _topic("gamma", 40)])
    return spark.createDataFrame(
        [("d1", doc), ("d2", "too short to segment"), ("d3", "")],
        ["doc_id", "text"])


def test_boundaries_at_topic_shifts(tiled):
    out = texttiling(tiled, w=10, p=3, cutoff_e6=400_000)
    rows = {r["gap_token"]: r for r in
            out.where(F.col("id") == "d1").collect()}
    # topic changes at tokens 40 and 80: zero similarity, max depth
    assert rows[40]["boundary"] and rows[40]["sim_e6"] == 0
    assert rows[80]["boundary"] and rows[80]["sim_e6"] == 0
    # inside a topic the 10-token blocks repeat the same 10 words
    assert rows[10]["sim_e6"] == 1_000_000 and not rows[10]["boundary"]
    assert sum(1 for r in rows.values() if r["boundary"]) == 2


def test_short_and_empty_docs_emit_no_gaps(tiled):
    out = texttiling(tiled, w=10)
    assert out.where(F.col("id").isin("d2", "d3")).count() == 0
    seg = {r["id"]: r for r in texttiling_segments(tiled, w=10).collect()}
    assert seg["d2"]["n_segments"] == 1 and seg["d2"]["n_gaps"] == 0
    assert seg["d3"]["n_segments"] == 1


def test_gap_jaccard_hand_checked(spark):
    # blocks: [a b c d] | [c d e f] -> inter {c,d}=2, union 6 -> 333333
    df = spark.createDataFrame([("x", "a b c d c d e f")],
                               ["doc_id", "text"])
    r = texttiling(df, w=4, p=1).collect()
    assert len(r) == 1
    assert r[0]["sim_e6"] == 2 * 1_000_000 // 6
    assert r[0]["gap_token"] == 4


def _python_tiling(tokens, w, p):
    """Pure-Python twin of gap Jaccard + bounded-window depth."""
    nb = (len(tokens) + w - 1) // w
    sims = []
    for g in range(1, nb):
        a = set(tokens[(g - 1) * w: g * w])
        b = set(tokens[g * w: (g + 1) * w])
        inter = len(a & b)
        sims.append(inter * 1_000_000 // (len(a) + len(b) - inter))
    out = []
    for i, s in enumerate(sims):
        ml = max(sims[max(0, i - p): i + 1])
        mr = max(sims[i: i + p + 1])
        out.append((i + 1, s, (ml - s) + (mr - s)))
    return out


def test_matches_python_twin(spark):
    import random
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(f"doc{j}", " ".join(rng.choice(vocab) for _ in range(117)))
            for j in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {}
    for r in texttiling(df, w=7, p=2).collect():
        got.setdefault(r["id"], []).append(
            (r["gap_idx"], r["sim_e6"], r["depth_e6"]))
    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        assert sorted(got[doc_id]) == _python_tiling(toks, 7, 2)


def test_partition_invariance(tiled):
    a = sorted(map(tuple, texttiling(tiled, w=10).collect()))
    b = sorted(map(tuple, texttiling(tiled.repartition(5), w=10).collect()))
    assert a == b


# ---- materialized topical chunks ---------------------------------------

from rag_document_parser_spark.operators.tiling import tiling_chunks


def test_tiling_chunks_cut_at_boundaries(tiled):
    rows = [r for r in tiling_chunks(tiled, w=10, p=3)
            .orderBy("id", "seg_idx").collect() if r["id"] == "d1"]
    assert [(r["seg_idx"], r["start_token"], r["n_tokens"])
            for r in rows] == [(0, 0, 40), (1, 40, 40), (2, 80, 40)]
    assert rows[0]["text"].startswith("alpha0 ")
    assert rows[1]["text"].startswith("beta0 ")
    assert rows[2]["text"].startswith("gamma0 ")


def test_tiling_chunks_whole_doc_and_empty(tiled):
    out = {r["id"]: r for r in tiling_chunks(tiled, w=10).collect()
           if r["id"] in ("d2", "d3")}
    assert out["d2"]["seg_idx"] == 0 and out["d2"]["n_tokens"] == 4
    assert out["d3"]["n_tokens"] == 0 and out["d3"]["text"] == ""


def test_tiling_chunks_reassemble_to_full_token_stream(tiled):
    """Concatenating a doc's segments reproduces the tokenized doc."""
    got = {}
    for r in tiling_chunks(tiled, w=10, p=3).collect():
        got.setdefault(r["id"], []).append((r["seg_idx"], r["text"]))
    for doc_id, text in [(r["doc_id"], r["text"])
                         for r in tiled.collect()]:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        joined = " ".join(t for _, t in sorted(got[doc_id]) if t)
        assert joined == " ".join(toks)


# ---- Pk / WindowDiff segmentation agreement -----------------------------

from rag_document_parser_spark.operators.tiling import (
    segmentation_agreement,
)

SEG_SCHEMA = ("id string, n_units int, ref_bounds array<int>, "
              "hyp_bounds array<int>")


def _py_seg(n, ref, hyp):
    k = max(1, n // (2 * (len(ref) + 1)))
    if n - k < 1:
        return (k, 0, None, None)
    pk = wd = 0
    for i in range(0, n - k):
        cr = sum(1 for b in ref if i < b <= i + k)
        ch = sum(1 for b in hyp if i < b <= i + k)
        pk += (cr > 0) != (ch > 0)
        wd += cr != ch
    return (k, n - k, pk * 10**6 // (n - k), wd * 10**6 // (n - k))


def test_seg_agreement_matches_python_twin(spark):
    import random
    rng = random.Random(11)
    cases = [("perfect", 30, [10, 20], [10, 20]),
             ("near", 30, [10, 20], [11, 20]),
             ("missed", 30, [10, 20], []),
             ("over", 30, [10], [5, 10, 15, 20, 25]),
             ("degen", 1, [], [])]
    for i in range(10):
        n = rng.randint(2, 60)
        ref = sorted(rng.sample(range(1, n), min(n - 1, rng.randint(0, 4))))
        hyp = sorted(rng.sample(range(1, n), min(n - 1, rng.randint(0, 4))))
        cases.append((f"r{i}", n, ref, hyp))
    df = spark.createDataFrame(cases, SEG_SCHEMA)
    got = {r["id"]: (r["k"], r["n_windows"], r["pk_e6"],
                     r["windowdiff_e6"])
           for r in segmentation_agreement(df).collect()}
    for cid, n, ref, hyp in cases:
        assert got[cid] == _py_seg(n, ref, hyp), (cid, n, ref, hyp)


def test_seg_agreement_near_miss_beats_total_miss(spark):
    df = spark.createDataFrame(
        [("near", 40, [20], [21]), ("far", 40, [20], [])], SEG_SCHEMA)
    got = {r["id"]: r["pk_e6"]
           for r in segmentation_agreement(df).collect()}
    assert 0 < got["near"] < got["far"]   # the metric's design property
