"""Weighted Jaccard / weighted MinHash (operators/wminhash.py) vs a
pure-Python twin: clamped tf weights, the Σmin/Σmax pair scores, the
replica-expansion collision property (slot-collision rate ≈ weighted
Jaccard), identical-doc determinism, and the broadcast-anti-join skew
gate in the plan."""

import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

from rag_document_parser_spark.operators import wminhash as WM


def _shingles(t, n=3):
    w = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def _weights(t, n=3, maxw=4):
    return {s: min(c, maxw) for s, c in Counter(_shingles(t, n)).items()}


def _wjac(ta, tb, n=3, maxw=4):
    wa, wb = _weights(ta, n, maxw), _weights(tb, n, maxw)
    inter = sum(min(wa[s], wb[s]) for s in set(wa) & set(wb))
    tot = sum(wa.values()) + sum(wb.values()) - inter
    return inter, sum(wa.values()), sum(wb.values()), \
        inter * 10**6 // tot if tot else 0


DOCS = [
    ("1", "the cat sat on the mat " * 5 + "and then it left"),
    ("2", "the cat sat on the mat " * 5 + "before it arrived"),
    ("3", "a completely different document about spark plans"),
    ("4", "the cat sat on the mat " * 5 + "and then it left"),  # == 1
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_weighted_counts_clamp(spark, corpus):
    got = {(r.id, r.shingle): r.w for r in
           WM.weighted_shingle_counts(corpus, max_weight=4).collect()}
    want = {(d, s): w for d, t in DOCS
            for s, w in _weights(t, 3, 4).items()}
    assert got == want
    assert max(got.values()) == 4  # the repeated sentence hits the cap


def test_pairs_match_twin(spark, corpus):
    rows = {(r.id_a, r.id_b): r for r in WM.weighted_jaccard_pairs(
        corpus, threshold_e6=100_000, max_weight=4).collect()}
    for (a, ta), (b, tb) in [((d1, t1), (d2, t2))
                             for i, (d1, t1) in enumerate(DOCS)
                             for (d2, t2) in DOCS[i + 1:]]:
        inter, tot_a, tot_b, je6 = _wjac(ta, tb)
        key = (a, b) if a < b else (b, a)
        if je6 >= 100_000:
            r = rows[key]
            assert (r.inter_w, r.tot_a if a < b else r.tot_b,
                    r.wjaccard_e6) == (inter, tot_a, je6), key
        else:
            assert key not in rows, key
    # the identical pair scores exactly 1.0
    assert rows[("1", "4")].wjaccard_e6 == 1_000_000


def test_signature_collision_rate_estimates_wjaccard(spark, corpus):
    k = 64
    sigs = {r.id: list(r.signature) for r in
            WM.weighted_minhash_signatures(
                corpus, k=k, max_weight=4).collect()}
    assert sigs["1"] == sigs["4"]  # identical docs, identical sigs
    _, _, _, je6 = _wjac(DOCS[0][1], DOCS[1][1])
    rate = sum(a == b for a, b in zip(sigs["1"], sigs["2"])) / k
    assert abs(rate - je6 / 1e6) < 0.2  # 3+ sigma for k=64
    rate_far = sum(a == b for a, b in zip(sigs["1"], sigs["3"])) / k
    assert rate_far < 0.15  # disjoint docs share (almost) nothing


def test_plan_has_broadcast_anti_join_skew_gate(spark, corpus):
    plan = WM.weighted_jaccard_pairs(corpus) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
