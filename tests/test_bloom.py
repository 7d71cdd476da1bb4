"""Bloom filter (operators/bloom.py) vs a pure-Python twin of the same
md5 position scheme, plus the Bloom contract: zero false negatives,
bounded size, merge-by-union, and the decontamination wrapper's
integer output against a brute-force recomputation."""

import hashlib

from pyspark.sql import functions as F

from rag_document_parser_spark.operators.bloom import (
    BLOOM_K,
    bloom_build,
    bloom_decontaminate,
    bloom_probe,
)

M = 256  # tiny space so false positives actually happen in the test


def _py_positions(term, m=M, k=BLOOM_K):
    h = int(hashlib.md5(f"bloom:{term}".encode()).hexdigest()[:15], 16)
    return {(h >> (15 * i)) % m for i in range(k)}


def _py_bloom(terms, m=M, k=BLOOM_K):
    s = set()
    for t in terms:
        s |= _py_positions(t, m, k)
    return s


BUILT = [f"ref-{i}" for i in range(40)]


def test_build_matches_python_twin_and_is_bounded(spark):
    df = spark.createDataFrame([(t,) for t in BUILT], "term string")
    got = {r["pos"] for r in bloom_build(df, m_bits=M).collect()}
    assert got == _py_bloom(BUILT)
    assert len(got) <= M


def test_no_false_negatives_and_twin_verdicts(spark):
    df = spark.createDataFrame([(t,) for t in BUILT], "term string")
    bloom = bloom_build(df, m_bits=M)
    cands = BUILT[:10] + [f"other-{i}" for i in range(50)]
    out = {r["term"]: r["maybe_present"]
           for r in bloom_probe(
               spark.createDataFrame([(t,) for t in cands], "term string"),
               bloom, m_bits=M).collect()}
    pyset = _py_bloom(BUILT)
    fp = 0
    for t in cands:
        want = _py_positions(t, M) <= pyset
        assert out[t] == want, t
        if t.startswith("ref-"):
            assert out[t], f"false negative on built-in term {t}"
        elif out[t]:
            fp += 1
    # 160 bits set of 256 -> false positives must occur at this density
    assert fp > 0, "test space too sparse to exercise false positives"


def test_filters_merge_by_union(spark):
    a = spark.createDataFrame([(t,) for t in BUILT[:20]], "term string")
    b = spark.createDataFrame([(t,) for t in BUILT[20:]], "term string")
    merged = (bloom_build(a, m_bits=M).unionByName(bloom_build(b, m_bits=M))
              .distinct())
    whole = bloom_build(
        spark.createDataFrame([(t,) for t in BUILT], "term string"),
        m_bits=M)
    assert ({r["pos"] for r in merged.collect()}
            == {r["pos"] for r in whole.collect()})


def test_decontaminate_overcounts_never_undercounts(spark):
    mk = lambda i, txt: (i, txt)
    corpus = spark.createDataFrame([
        mk(1, "alpha beta gamma delta epsilon"),
        mk(2, "one two three four five six"),
        mk(3, "alpha beta gamma nine ten"),
        mk(4, "xx"),  # too short for a 3-gram: dropped
    ], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string")
    out = {r["id"]: r for r in bloom_decontaminate(
        corpus, ev, n=3, m_bits=1 << 15).collect()}
    assert set(out) == {1, 2, 3}
    # doc 1: shingles a-b-g, b-g-d, g-d-e; eval has a-b-g, b-g-d -> >= 2
    assert out[1]["n_matched"] >= 2
    assert out[1]["contaminated"] == 1
    # doc 3 shares exactly a-b-g of its 3 shingles
    assert out[3]["n_matched"] >= 1
    # large m: no false positives expected -> exact counts here
    assert out[1]["n_matched"] == 2 and out[1]["n_sh"] == 3
    assert out[2]["n_matched"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["n_matched"] == 1 and out[3]["n_sh"] == 3
    assert out[1]["contam_e6"] == 2 * 10 ** 6 // 3


def test_probe_demand_handles_position_self_collisions(spark):
    # brute-force: every candidate verdict equals the set-cover check,
    # including any term whose k hashes collide into < k positions
    df = spark.createDataFrame([(t,) for t in BUILT], "term string")
    bloom = bloom_build(df, m_bits=64)
    cands = [f"c{i}" for i in range(200)]
    pyset = _py_bloom(BUILT, 64)
    out = {r["term"]: r["maybe_present"]
           for r in bloom_probe(
               spark.createDataFrame([(t,) for t in cands], "term string"),
               bloom, m_bits=64).collect()}
    collided = [t for t in cands if len(_py_positions(t, 64)) < BLOOM_K]
    assert collided, "need at least one self-collision at m=64"
    for t in cands:
        assert out[t] == (_py_positions(t, 64) <= pyset), t


def test_decontaminate_never_shuffles_on_shingle(spark):
    # the corpus side must pass through broadcast semi-joins only: any
    # Exchange keyed on the shingle column means the vocabulary-wide
    # shuffle this plan exists to avoid is back
    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string")
    ev = spark.createDataFrame([(99, "w1 w2 w3")],
                               "doc_id long, text string")
    plan = (bloom_decontaminate(corpus, ev, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "hashpartitioning(shingle" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
