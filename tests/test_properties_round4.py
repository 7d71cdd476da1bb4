"""Property tests for the round-4 numeric kernels: pure Python vs
DuckDB agreement on the exact integer expressions the oracles replay
(quantization codes, HLL rho via bin(), Bloom digest-field positions,
weighted-sample priorities), plus the kernels' own invariants. No
Spark needed — cross-engine arithmetic agreement is the load-bearing
assumption behind every oracle_sql() entry."""

from __future__ import annotations

import hashlib
import math

import duckdb
from hypothesis import given, settings, strategies as st

CON = duckdb.connect()

E6 = 1_000_000
QMAX = 127


# -- int8 quantization -------------------------------------------------------

FLOATS = st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
                   allow_infinity=False, width=32)
VECS = st.lists(FLOATS, min_size=1, max_size=16)


def _py_codes(vec):
    x6 = [math.floor(float(x) * E6) for x in vec]
    m = max(max((abs(v) for v in x6), default=0), 1)
    return m, x6, [(v + m) * 2 * QMAX // (2 * m) - QMAX for v in x6]


@settings(max_examples=200, deadline=None)
@given(VECS)
def test_quantize_codes_duckdb_agreement_and_bounds(vec):
    m, x6, py = _py_codes(vec)
    got = CON.execute(
        "SELECT list_transform(?::BIGINT[], v -> (v + ?) * 254 // (2 * ?)"
        " - 127)", [x6, m, m]).fetchone()[0]
    assert got == py
    assert all(-QMAX <= c <= QMAX for c in py)
    # dequantization error bounded by one quantization step
    for v6, c in zip(x6, py):
        assert abs(c * m / QMAX - v6) <= m / QMAX + m / (2 * QMAX) + 1


# -- HLL rho -----------------------------------------------------------------

H60 = st.integers(min_value=0, max_value=(1 << 60) - 1)


@settings(max_examples=300, deadline=None)
@given(H60)
def test_hll_rho_duckdb_agreement(h):
    w = h // 64
    py = 55 if w == 0 else 55 - w.bit_length()
    got = CON.execute(
        "SELECT CASE WHEN ?::BIGINT // 64 = 0 THEN 55"
        " ELSE 55 - length(bin(?::BIGINT // 64)) END", [h, h]).fetchone()[0]
    assert got == py
    assert 1 <= py <= 55


# -- Bloom digest-field positions --------------------------------------------

WORDS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24)


@settings(max_examples=200, deadline=None)
@given(WORDS)
def test_bloom_positions_duckdb_agreement(term):
    h = int(hashlib.md5(f"bloom:{term}".encode()).hexdigest()[:15], 16)
    py = [(h >> (15 * i)) % 32768 for i in range(4)]
    got = CON.execute(
        "SELECT [((('0x'||substring(md5('bloom:'||?),1,15))::BIGINT >> x)"
        " % 32768) for x in [0, 15, 30, 45]]", [term]).fetchone()[0]
    assert got == py
    assert all(0 <= p < 32768 for p in py)


# -- weighted-sample priority ------------------------------------------------

KEYS = st.text(alphabet="abcdef0123456789-", min_size=1, max_size=20)
WEIGHTS = st.integers(min_value=-5, max_value=10 ** 9)


@settings(max_examples=200, deadline=None)
@given(KEYS, WEIGHTS)
def test_weighted_priority_duckdb_agreement(key, w):
    u = int(hashlib.md5(f"{key}w1".encode()).hexdigest()[:15], 16)
    py = u // max(w, 1)
    got = CON.execute(
        "SELECT ('0x'||substring(md5(? || 'w1'),1,15))::BIGINT"
        " // greatest(?::BIGINT, 1)", [key, w]).fetchone()[0]
    assert got == py


# -- exact integer sqrt (mixture tier) ---------------------------------------

B63 = st.integers(min_value=0, max_value=(1 << 63) - 1)


@settings(max_examples=300, deadline=None)
@given(B63)
def test_isqrt_sql_duckdb_agreement(x):
    from rag_document_parser_spark.operators.mixture import sql_isqrt
    got = CON.execute(
        f"SELECT {sql_isqrt('x')} FROM (SELECT ?::BIGINT AS x)",
        [x]).fetchone()[0]
    assert got == math.isqrt(x)


# -- log-binned quantile sketch buckets --------------------------------------

_QS_BUCKET_SQL = ("CASE WHEN x < 16 THEN x ELSE (length(bin(x))-1)*16"
                  " + (x >> (length(bin(x))-1-4)) - 16 END")
_QS_LOWER_SQL = ("CASE WHEN b < 16 THEN b"
                 " ELSE (b % 16 + 16) << ((b // 16) - 4) END")


def _py_qs_bucket(x):
    if x < 16:
        return x
    msb = x.bit_length() - 1
    return msb * 16 + (x >> (msb - 4)) - 16


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 50) - 1))
def test_qsketch_bucket_duckdb_agreement_and_error_bound(x):
    b = CON.execute(
        f"SELECT {_QS_BUCKET_SQL} FROM (SELECT ?::BIGINT AS x)",
        [x]).fetchone()[0]
    assert b == _py_qs_bucket(x)
    lo = CON.execute(
        f"SELECT {_QS_LOWER_SQL} FROM (SELECT ?::BIGINT AS b)",
        [b]).fetchone()[0]
    # the reported lower bound under-estimates by at most a factor 1+2^-4
    assert lo <= x
    assert x - lo <= lo // 16
    # monotone: the next value's bucket never decreases
    assert _py_qs_bucket(x + 1) >= b


# -- greedy non-splitting packing (interleave/sentence-chunk oracle) ---------

COSTS = st.lists(st.integers(min_value=0, max_value=9), min_size=1,
                 max_size=24)


def _py_greedy(costs, budget):
    cid, cur, out = 0, 0, []
    for i, c in enumerate(costs):
        if i > 0 and cur + c > budget:
            cid, cur = cid + 1, c
        else:
            cur += c
        out.append(cid)
    return out


@settings(max_examples=200, deadline=None)
@given(COSTS, st.integers(min_value=1, max_value=12))
def test_greedy_packing_recursive_cte_matches_python(costs, budget):
    vals = ", ".join(f"({i + 1}, {c})" for i, c in enumerate(costs))
    rows = CON.execute(f"""
WITH RECURSIVE sl(i, l) AS (VALUES {vals}),
st AS (
  SELECT i, l, l AS cur, 0 AS cid FROM sl WHERE i = 1
  UNION ALL
  SELECT s.i, s.l,
    CASE WHEN st.cur + s.l > {budget} THEN s.l ELSE st.cur + s.l END,
    CASE WHEN st.cur + s.l > {budget} THEN st.cid + 1 ELSE st.cid END
  FROM st JOIN sl s ON s.i = st.i + 1)
SELECT cid FROM st ORDER BY i""").fetchall()
    assert [r[0] for r in rows] == _py_greedy(costs, budget)
    # invariant: every chunk with >1 item fits the budget
    py = _py_greedy(costs, budget)
    per = {}
    for c, cid in zip(costs, py):
        per.setdefault(cid, []).append(c)
    for items in per.values():
        assert len(items) == 1 or sum(items) <= budget
