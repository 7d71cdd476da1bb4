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
