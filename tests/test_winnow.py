"""Winnowing fingerprints (operators/winnow.py) vs a pure-Python twin
of the rightmost-min selection, plus the paper's two headline
properties: the (w + k - 1)-token match GUARANTEE and the ~2/(w+1)
selection density, and the stop-fingerprint blacklist in the pair
join."""

import hashlib
import re

import pytest

from rag_document_parser_spark.operators import winnow as WN

K, W = 5, 4


def _words(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _h60(s):
    return int(hashlib.md5(("win:" + s).encode()).hexdigest()[:15], 16)


def _twin(docs, k=K, w=W):
    out = []
    for d, t in docs:
        ts = _words(t)
        grams = ([" ".join(ts[i:i + k]) for i in range(len(ts) - k + 1)]
                 if len(ts) >= k else [])
        hs = [_h60(g) for g in grams]
        if not hs:
            continue
        ln = min(w, len(hs))
        sels = set()
        for i in range(len(hs) - ln + 1):
            best = (hs[i], i + 1)
            for j in range(i + 1, i + ln):
                if hs[j] <= best[0]:
                    best = (hs[j], j + 1)
            sels.add((d, best[1], best[0]))
        out.extend(sels)
    return sorted(out)


DOCS = [("d1", "alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lam mu nu xi omicron pi rho sigma tau"),
        ("d2", "intro words alpha beta gamma delta epsilon zeta eta "
               "theta different tail here"),
        ("d3", "one two three four"),
        ("d4", "a b c d e f"),
        ("d5", "")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_matches_python_twin(corpus):
    got = sorted(map(tuple, WN.winnow_fingerprints(
        corpus, k=K, w=W).collect()))
    assert got == _twin(DOCS)


def test_match_guarantee(spark):
    """Any shared substring of w + k - 1 tokens MUST yield a shared
    fingerprint hash — checked over 25 planted offset combinations."""
    shared = " ".join(f"s{i}" for i in range(W + K - 1))
    cases = []
    for a_off in range(5):
        for b_off in range(5):
            pre_a = " ".join(f"a{a_off}x{j}" for j in range(a_off + K))
            pre_b = " ".join(f"b{b_off}y{j}" for j in range(b_off + K))
            cases.append((f"a{a_off}_{b_off}", f"{pre_a} {shared} end{a_off}"))
            cases.append((f"b{a_off}_{b_off}", f"{pre_b} {shared} fin{b_off}"))
    df = spark.createDataFrame(cases, "doc_id string, text string")
    fps = WN.winnow_fingerprints(df, k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["whash"])
    for a_off in range(5):
        for b_off in range(5):
            a, b = f"a{a_off}_{b_off}", f"b{a_off}_{b_off}"
            assert by_doc[a] & by_doc[b], (a, b)


def test_selection_density(spark):
    """Expected density is 2/(w+1); allow a loose band around it."""
    import random
    rng = random.Random(7)
    text = " ".join(f"t{rng.randrange(10 ** 9)}" for _ in range(2000))
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    n_sel = WN.winnow_fingerprints(df, k=K, w=W).count()
    n_grams = 2000 - K + 1
    density = n_sel / n_grams
    assert 1 / (W + 1) < density < 3 / (W + 1)


def test_short_doc_boundaries(corpus):
    got = {r["doc_id"] for r in
           WN.winnow_fingerprints(corpus, k=K, w=W).collect()}
    assert "d3" not in got      # < k tokens: no grams
    assert "d5" not in got      # empty
    assert "d4" in got          # 2 grams < w: single-window winnow


def test_pairs_and_blacklist(spark):
    """d1/d2 share an 8-token run -> pair found; a boilerplate hash
    present in every doc is blacklisted by df_cap and produces no
    quadratic blowup pair set."""
    boiler = " ".join(f"bp{i}" for i in range(K + W - 1))
    docs = [(f"x{i}", boiler + f" unique{i} " +
             " ".join(f"u{i}w{j}" for j in range(6))) for i in range(12)]
    df = spark.createDataFrame(docs + list(DOCS[:2]),
                               "doc_id string, text string")
    pairs = WN.winnow_pairs(df, k=K, w=W, min_shared=1, df_cap=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("d1", "d2") in got
    assert not any(a.startswith("x") and b.startswith("x")
                   for a, b in got)


def test_partition_invariance(corpus):
    s1 = sorted(map(tuple, WN.winnow_fingerprints(
        corpus.repartition(1), k=K, w=W).collect()))
    s7 = sorted(map(tuple, WN.winnow_fingerprints(
        corpus.repartition(7), k=K, w=W).collect()))
    assert s1 == s7


def test_fingerprints_zero_exchange(corpus):
    """Selection is scan-local: no Exchange anywhere in the physical
    plan — docs are never shuffled to be fingerprinted."""
    plan = (WN.winnow_fingerprints(corpus, k=K, w=W)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
