"""Property tests for the late-round-4 numeric kernels: pure Python
vs DuckDB agreement on the exact integer expressions the oracles
replay (the piecewise-linear fixed-point logs, the Zipf two-stage
long division, Mersenne-31 minhash permutations, calibration
binning), plus algorithmic invariants no oracle covers (Viterbi
optimality vs brute force, the weighted-Jaccard replica reduction,
skeleton idempotence). No Spark needed."""

from __future__ import annotations

import hashlib
import itertools

import duckdb
from hypothesis import given, settings, strategies as st

CON = duckdb.connect()

M31 = 2 ** 31 - 1


# -- piecewise-linear integer logs (unigram.py / corpstats.py) --------------

def _log2_fix(n, scale):
    il = n.bit_length() - 1
    return il * scale + (n * scale) // (1 << il) - scale


POSITIVE = st.integers(min_value=1, max_value=9_000_000_000_000)


@settings(max_examples=200, deadline=None)
@given(POSITIVE, st.sampled_from([1000, 1000000]))
def test_log2_fix_duckdb_agreement(n, scale):
    got = CON.execute(
        f"SELECT (length(bin({n}::BIGINT)) - 1) * {scale} + "
        f"(({n}::BIGINT * {scale}) // "
        f"(1::BIGINT << (length(bin({n}::BIGINT)) - 1))) - {scale}"
    ).fetchone()[0]
    assert got == _log2_fix(n, scale)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=2**40))
def test_log2_fix_monotone_and_exact_at_powers(n):
    assert _log2_fix(n, 10**6) <= _log2_fix(n + 1, 10**6)
    k = n.bit_length() - 1
    assert _log2_fix(1 << k, 10**6) == k * 10**6


# -- Viterbi segmentation optimality (unigram.py) ---------------------------

def _viterbi(word, costs, ucost, maxlen):
    inf = 10 ** 15
    dp = [(0, 0)]
    for j in range(1, len(word) + 1):
        best = None
        for i in range(max(1, j - maxlen + 1), j + 1):
            p = word[i - 1:j]
            c = costs.get(p, ucost if len(p) == 1 else inf)
            cand = (dp[i - 1][0] + c, i - 1)
            if best is None or cand[0] < best[0]:
                best = cand
        dp.append(best)
    return dp[len(word)][0]


def _brute_min(word, costs, ucost, maxlen):
    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        tot, ok = 0, True
        for a, b in zip(bounds, bounds[1:]):
            if b - a > maxlen:
                ok = False
                break
            p = word[a:b]
            tot += costs.get(p, ucost if len(p) == 1 else 10 ** 15)
        if ok and tot < 10 ** 15 and (best is None or tot < best):
            best = tot
    return best


WORDS = st.text(alphabet="abc", min_size=1, max_size=8)
PIECES = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=3),
    st.integers(min_value=1, max_value=10**7), max_size=12)


@settings(max_examples=150, deadline=None)
@given(WORDS, PIECES, st.integers(min_value=10**6, max_value=10**7))
def test_viterbi_is_globally_optimal(word, costs, ucost):
    got = _viterbi(word, costs, ucost, 3)
    want = _brute_min(word, costs, ucost, 3)
    assert got == want


# -- weighted-Jaccard replica reduction (wminhash.py) -----------------------

WSETS = st.dictionaries(st.integers(0, 20), st.integers(1, 4),
                        max_size=12)


@settings(max_examples=200, deadline=None)
@given(WSETS, WSETS)
def test_replica_jaccard_equals_weighted_jaccard(wa, wb):
    A = {(s, r) for s, w in wa.items() for r in range(1, w + 1)}
    B = {(s, r) for s, w in wb.items() for r in range(1, w + 1)}
    inter = sum(min(wa[s], wb[s]) for s in set(wa) & set(wb))
    union = sum(wa.values()) + sum(wb.values()) - inter
    assert len(A & B) == inter
    assert len(A | B) == union


# -- Mersenne-31 permutations (dedup.py / wminhash.py) ----------------------

@settings(max_examples=100, deadline=None)
@given(st.integers(1, M31 - 1), st.integers(0, M31 - 1),
       st.lists(st.integers(0, M31 - 1), min_size=2, max_size=50,
                unique=True))
def test_m31_affine_is_injective_and_duckdb_agrees(a, b, hs):
    py = [(a * h + b) % M31 for h in hs]
    assert len(set(py)) == len(hs)  # a in [1, M31-1] => bijection
    got = CON.execute(
        f"SELECT list_transform(?::BIGINT[], h -> ({a}::BIGINT * h "
        f"+ {b}) % {M31})", [hs]).fetchone()[0]
    assert got == py


def test_m31_permutation_scrambles_order():
    """The reason for the modulus fix: under M31 the min of an affine
    image is NOT the image of the min hash (near-monotone maps pick
    the same argmin for every slot)."""
    hs = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % M31
          for i in range(200)]
    hmin = min(hs)
    same_argmin = 0
    for i in range(64):
        a = int(hashlib.md5(f"pa{i}".encode()).hexdigest()[:15], 16) \
            % (M31 - 1) + 1
        b = int(hashlib.md5(f"pb{i}".encode()).hexdigest()[:15], 16) \
            % M31
        img = [(a * h + b) % M31 for h in hs]
        if img.index(min(img)) == hs.index(hmin):
            same_argmin += 1
    # uniform argmin would hit ~64/200 < 1; monotone maps hit 64/64
    assert same_argmin <= 8


# -- skeleton idempotence (confusables.py) ----------------------------------

from rag_document_parser_spark.operators.confusables import (  # noqa: E402
    INVISIBLES, SKELETON_MAP)


def _skel(t):
    return "".join(SKELETON_MAP.get(c, c) for c in t
                   if c not in INVISIBLES)


CONF_TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefg XYZ") + list(SKELETON_MAP) + list(INVISIBLES)),
    max_size=60)


@settings(max_examples=200, deadline=None)
@given(CONF_TEXT)
def test_skeleton_idempotent_and_never_longer(t):
    s = _skel(t)
    assert _skel(s) == s  # prototypes are fixed points
    assert len(s) <= len(t)


def test_skeleton_map_targets_are_fixed_points():
    for proto in SKELETON_MAP.values():
        assert proto not in SKELETON_MAP
        assert proto not in INVISIBLES


# -- calibration binning (calibration.py) -----------------------------------

@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10**6), st.sampled_from([2, 5, 10, 20]))
def test_bin_formula_duckdb_agreement_and_range(score, n_bins):
    py = min(n_bins - 1, score * n_bins // 10**6)
    got = CON.execute(
        f"SELECT least({n_bins} - 1, {score}::BIGINT * {n_bins} "
        f"// 1000000)").fetchone()[0]
    assert got == py
    assert 0 <= py <= n_bins - 1
    if score == 10**6:
        assert py == n_bins - 1


# ---- STRAND URL pairing (Resnik & Smith 2003) ---------------------------

from rag_document_parser_spark.operators.urls import (
    strand_key,
    strand_url_pairs,
)


def test_strand_key_strips_language_markers(spark):
    from pyspark.sql import functions as F
    rows = [
        ("https://en.example.com/docs/page", "https://example.com/docs/page"),
        ("https://www.site.org/en/guide/x", "https://www.site.org/guide/x"),
        ("https://www.site.org/fr-CA/guide/x",
         "https://www.site.org/guide/x"),
        ("https://a.example/p?x=1&lang=de&y=2",
         "https://a.example/p?x=1&y=2"),
        ("https://a.example/ENGLISH/p", "https://a.example/english/p"),
    ]
    df = spark.createDataFrame(rows, ["url", "want"])
    got = df.select(strand_key(F.col("url")).alias("k"), "want").collect()
    for r in got:
        assert r["k"] == r["want"], r


def test_strand_pairs_cross_language_only(spark):
    rows = [
        (1, "en", "https://s.example/en/article-1"),
        (2, "fr", "https://s.example/fr/article-1"),
        (3, "de", "https://s.example/de/article-1"),
        (4, "en", "https://s.example/en/article-2"),   # different key
        (5, "en", "https://s.example/en/article-1"),   # same key, same lang
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "url"])
    got = sorted((r["id_a"], r["lang_a"], r["id_b"], r["lang_b"])
                 for r in strand_url_pairs(df).collect())
    # cross-lang pairs among {1,5}(en), 2(fr), 3(de) on key article-1:
    # de<en (3,1),(3,5); de<fr (3,2); en<fr (1,2),(5,2). Never en-en.
    assert got == [(1, "en", 2, "fr"), (3, "de", 1, "en"),
                   (3, "de", 2, "fr"), (3, "de", 5, "en"),
                   (5, "en", 2, "fr")]


def test_strand_hot_template_pruned(spark):
    rows = [(i, "en" if i % 2 else "fr",
             "https://hot.example/en/landing") for i in range(40)] + \
        [(100, "en", "https://cool.example/en/a"),
         (101, "fr", "https://cool.example/fr/a")]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "url"])
    got = strand_url_pairs(df, max_per_key=16).collect()
    # the 40-doc landing template is dropped before the join; the
    # legitimate one-per-language template survives
    assert [(r["id_a"], r["id_b"]) for r in got] == [(100, 101)]
