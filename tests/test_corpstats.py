"""Corpus scaling-law statistics (operators/corpstats.py) vs an
independent pure-Python simulation: rank spans from the compacted
frequency distribution, the fixed-point OLS Zipf fit (two-stage exact
long division), Heaps' first-appearance vocabulary growth, a
power-law corpus recovering its planted exponent, and the plan shape
(no window over term-scale rows)."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators import corpstats as C


def _words(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _log2_e3(n):
    il = n.bit_length() - 1
    return il * 1000 + (n * 1000) // (1 << il) - 1000


def _twin_points(docs, top_n):
    tf = Counter(w for _, t in docs for w in _words(t))
    out = []
    for rank, (_, f) in enumerate(
            sorted(tf.items(), key=lambda kv: -kv[1])[:top_n], start=1):
        out.append((rank, f))
    return out, len(tf)


def _twin_fit(docs, top_n):
    pts, n_types = _twin_points(docs, top_n)
    xs = [_log2_e3(r) for r, _ in pts]
    ys = [_log2_e3(f) for _, f in pts]
    n, sx, sy = len(pts), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = sx * sy - n * sxy, n * sxx - sx * sx

    def tdiv(a, b):  # truncate toward zero, both engines' semantics
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    q1 = tdiv(num * 1000, den)
    slope = q1 * 1000 + tdiv((num * 1000 - q1 * den) * 1000, den)
    icept = tdiv(sy + tdiv(q1 * sx, 1000), n)
    return n, n_types, slope, icept


# a corpus with a planted power law: term w_k appears ~ 1024/k times
ZIPF_DOCS = []
_k = 0
for k in range(1, 65):
    reps = 1024 // k
    ZIPF_DOCS.append((f"d{k}", " ".join(f"w{k:03d}" for _ in range(reps))))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ZIPF_DOCS, ["doc_id", "text"])


def test_zipf_points_match_twin(spark, corpus):
    pts, _ = _twin_points(ZIPF_DOCS, 40)
    got = sorted((r.rank, r.freq) for r in
                 C.zipf_points(corpus, top_n=40).collect())
    # rank->freq multiset equality (tie order inside a class is free)
    assert sorted(f for _, f in got) == sorted(f for _, f in pts)
    assert [r for r, _ in got] == list(range(1, len(pts) + 1))


def test_zipf_fit_matches_twin_and_recovers_exponent(spark, corpus):
    n, n_types, slope, icept = _twin_fit(ZIPF_DOCS, 64)
    row = C.zipf_fit(corpus, top_n=64).collect()[0]
    assert (row.n_head, row.n_types) == (n, n_types)
    assert row.neg_slope_e6 == slope
    assert row.intercept_e3 == icept
    # planted exponent is 1.0; the piecewise log bends it slightly
    assert 850_000 < row.neg_slope_e6 < 1_150_000


def test_heaps_points_match_twin(spark, corpus):
    got = {r.prefix_buckets: r for r in
           C.heaps_points(corpus, n_buckets=4, salt="t").collect()}
    assert sorted(got) == [1, 2, 3, 4]
    import hashlib
    buckets = {
        d: int(hashlib.md5((d + "t").encode()).hexdigest()[:15], 16)
        % 4 + 1 for d, _ in ZIPF_DOCS}
    for b in range(1, 5):
        pref = [(d, t) for d, t in ZIPF_DOCS if buckets[d] <= b]
        toks = [w for _, t in pref for w in _words(t)]
        assert got[b].n_docs == len(pref), b
        assert got[b].n_tokens == len(toks), b
        assert got[b].n_types == len(set(toks)), b
    # growth is monotone and ends at the full corpus
    assert got[4].n_docs == len(ZIPF_DOCS)
    assert all(got[b].n_types <= got[b + 1].n_types for b in (1, 2, 3))


def test_no_window_over_term_scale_rows(spark, corpus):
    """The rank window must run over the compacted distribution, not
    the term table: the plan's Window sits above an aggregate keyed on
    freq, and no Window consumes the raw term relation."""
    plan = C.zipf_fit(corpus, top_n=64) \
        ._jdf.queryExecution().optimizedPlan().toString()
    # term-scale explode feeds an Aggregate, never a Window directly
    assert "Window" in plan
    win_idx = plan.index("Window")
    assert "Aggregate" in plan[win_idx:], plan


# ---- KMV source-overlap matrix (Broder 1997; Beyer et al. 2007) ---------

from rag_document_parser_spark.operators.corpstats import source_overlap


@pytest.fixture(scope="module")
def multi_source(spark):
    # srcA and srcB share texts t0..t4 (of 10 each: J = 5/15);
    # srcC is disjoint from both
    rows = []
    for i in range(10):
        rows.append((f"a{i}", "srcA", f"shared text {i}" if i < 5
                     else f"alpha only {i}"))
        rows.append((f"b{i}", "srcB", f"shared text {i}" if i < 5
                     else f"beta only {i}"))
        rows.append((f"c{i}", "srcC", f"gamma only {i}"))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_source_overlap_exact_when_k_covers(multi_source):
    """k >= |union| makes the KMV estimate EXACT Jaccard."""
    out = {(r["source_a"], r["source_b"]): r
           for r in source_overlap(multi_source, k=64).collect()}
    ab = out[("srcA", "srcB")]
    assert (ab["docs_a"], ab["docs_b"]) == (10, 10)
    assert ab["k_merged"] == 15 and ab["n_both"] == 5
    assert ab["jaccard_e6"] == 5 * 1_000_000 // 15
    assert out[("srcA", "srcC")]["n_both"] == 0
    assert out[("srcB", "srcC")]["jaccard_e6"] == 0


def test_source_overlap_dedups_within_source(spark):
    """Duplicate texts inside one source count once (set semantics)."""
    df = spark.createDataFrame(
        [("1", "x", "same"), ("2", "x", "same"), ("3", "y", "same")],
        ["doc_id", "source", "text"])
    out = source_overlap(df, k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["docs_a"], r["docs_b"]) == (1, 1)
    assert r["jaccard_e6"] == 1_000_000


def test_source_overlap_sketch_is_bottom_k(multi_source):
    """With k below the union size the estimate uses the merged
    bottom-k only — still in [0, 1e6] and k_merged == k."""
    out = {(r["source_a"], r["source_b"]): r
           for r in source_overlap(multi_source, k=4).collect()}
    for r in out.values():
        assert r["k_merged"] == 4
        assert 0 <= r["jaccard_e6"] <= 1_000_000


def test_source_overlap_max_sources_guard(multi_source):
    import pytest as _pt
    with _pt.raises(ValueError, match="max_sources"):
        source_overlap(multi_source, k=4, max_sources=2)


def test_source_overlap_partition_invariance(multi_source):
    a = sorted(map(tuple, source_overlap(multi_source, k=8).collect()))
    b = sorted(map(tuple, source_overlap(
        multi_source.repartition(7), k=8).collect()))
    assert a == b


def test_source_sketch_merge_law(spark, multi_source):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    property that makes the sketch valid cross-batch state."""
    from rag_document_parser_spark.operators.corpstats import (
        merge_source_sketches, source_sketch)
    half_a = multi_source.where(F.col("doc_id").substr(2, 9).cast("int") < 5)
    half_b = multi_source.subtract(half_a)
    merged = merge_source_sketches(
        source_sketch(half_a, k=6), source_sketch(half_b, k=6), k=6)
    whole = source_sketch(multi_source, k=6)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


# ---- total-variation term-distribution distance -------------------------

def test_tv_distance_identical_zero_disjoint_full(spark):
    from rag_document_parser_spark.operators.corpstats import (
        term_distribution_distance)
    a = spark.createDataFrame([("1", "x y z x")], ["doc_id", "text"])
    same = spark.createDataFrame([("2", "x x y z")], ["doc_id", "text"])
    disj = spark.createDataFrame([("3", "p q r")], ["doc_id", "text"])
    r_same = term_distribution_distance(a, same).collect()[0]
    assert r_same["tv_e6"] == 0            # same multiset -> same dist
    r_disj = term_distribution_distance(a, disj).collect()[0]
    assert r_disj["tv_e6"] == 1_000_000    # disjoint supports
    assert r_disj["n_shared_types"] == 0


def test_tv_distance_hand_value(spark):
    from rag_document_parser_spark.operators.corpstats import (
        term_distribution_distance)
    # p = {x: 3/4, y: 1/4}; q = {x: 1/4, y: 3/4} -> TV = 1/2
    a = spark.createDataFrame([("1", "x x x y")], ["doc_id", "text"])
    b = spark.createDataFrame([("2", "x y y y")], ["doc_id", "text"])
    r = term_distribution_distance(a, b).collect()[0]
    assert r["tv_e6"] == 500_000
    assert (r["total_a"], r["total_b"]) == (4, 4)


def test_tv_distance_empty_side_null(spark):
    from rag_document_parser_spark.operators.corpstats import (
        term_distribution_distance)
    a = spark.createDataFrame([("1", "x y")], ["doc_id", "text"])
    e = spark.createDataFrame([("2", "")], ["doc_id", "text"])
    assert term_distribution_distance(a, e).collect()[0]["tv_e6"] is None


# ---- vocabulary richness (Good-Turing + Chao1) --------------------------

def test_vocab_richness_hand_counts(spark):
    from rag_document_parser_spark.operators.corpstats import (
        vocab_richness)
    # freqs: a=3, b=2, c=1, d=1 -> N=7, V=4, f1=2, f2=1
    df = spark.createDataFrame([("1", "a a a b b c d")],
                               ["doc_id", "text"])
    r = vocab_richness(df).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (7, 4, 2, 1)
    assert r["p_unseen_e6"] == 2 * 10**6 // 7
    assert r["chao1_est"] == 4 + 2 * 1 // (2 * 2)   # 4 (floor)


def test_vocab_richness_no_doubletons_defined(spark):
    from rag_document_parser_spark.operators.corpstats import (
        vocab_richness)
    df = spark.createDataFrame([("1", "p q r")], ["doc_id", "text"])
    r = vocab_richness(df).collect()[0]
    # all singletons: f2=0, the +1 correction keeps Chao1 finite
    assert (r["f1"], r["f2"]) == (3, 0)
    assert r["chao1_est"] == 3 + 3 * 2 // 2
    assert r["p_unseen_e6"] == 1_000_000


# ---- Lorenz source concentration ----------------------------------------

def test_source_concentration_ranks_and_cumulates(spark):
    from rag_document_parser_spark.reporting import source_concentration
    df = spark.createDataFrame(
        [("1", "big", "a b c d e f"),        # 6 tokens
         ("2", "big", "g h i j"),            # big total: 10
         ("3", "mid", "k l m n o"),          # 5
         ("4", "tiny", "p q r s t")],        # 5 -> tie by name: mid<tiny
        ["doc_id", "source", "text"])
    rows = [(r["rank"], r["source"], r["tokens"], r["share_e6"],
             r["cum_share_e6"])
            for r in source_concentration(df).orderBy("rank").collect()]
    assert rows == [
        (1, "big", 10, 500_000, 500_000),
        (2, "mid", 5, 250_000, 750_000),
        (3, "tiny", 5, 250_000, 1_000_000)]


def test_source_hhi_even_vs_concentrated(spark):
    from rag_document_parser_spark.reporting import source_hhi
    even = spark.createDataFrame(
        [("1", "a", "w x"), ("2", "b", "y z")],
        ["doc_id", "source", "text"])
    r = source_hhi(even).collect()[0]
    assert r["hhi_e6"] == 500_000               # two equal sources
    assert r["effective_sources_e3"] == 2_000
    conc = spark.createDataFrame(
        [("1", "a", "w x y z v u"), ("2", "b", "q")],
        ["doc_id", "source", "text"])
    r2 = source_hhi(conc).collect()[0]
    # shares 6/7 and 1/7: HHI = (36+1)*1e6 // 49
    assert r2["hhi_e6"] == 37 * 10**6 // 49
