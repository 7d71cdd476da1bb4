"""Distributed BPE training (operators/bpe.py) vs an independent
pure-Python simulation of the same documented merge semantics."""

import re
from collections import Counter

from rag_document_parser_spark.operators import bpe as B
from tests.conftest import SF_DIR

TOK = re.compile(r"[a-z0-9؀-ۿ]+")


def _sim_train_full(texts, n_merges, min_count):
    wc = Counter(t for s in texts for t in TOK.findall(s.lower()))
    syms = Counter()
    for w, c in wc.items():
        if c >= min_count:
            syms[" " + " ".join(w) + " </w> "] += c
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for s, c in syms.items():
            y = s.split()
            for a, b in zip(y, y[1:]):
                pairs[f"{a} {b}"] += c
        if not pairs:
            break
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        l, r = pair.split(" ")
        merges.append((rank, l, r, cnt))
        nxt = Counter()
        for s, c in syms.items():
            nxt[s.replace(f" {l} {r} ", f" {l}{r} ")] += c
        syms = nxt
    return merges


def _docs_texts(spark, limit=200):
    rows = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(limit).collect())
    return [(r["doc_id"], r["text"]) for r in rows]


def test_train_bpe_matches_simulation(spark):
    pairs = _docs_texts(spark)
    df = spark.createDataFrame(pairs, ["doc_id", "text"])
    got = B.train_bpe(df, n_merges=6, min_count=2)
    want = _sim_train_full([t for _, t in pairs], 6, 2)
    assert got == want
    # learned merge list is deterministic across partitionings
    assert B.train_bpe(df.repartition(17), n_merges=6, min_count=2) == got


def test_train_bpe_tiny_hand_case(spark):
    # 'aaab' x3, 'ab' x2: round 1 argmax is (a,a) weight 6 over
    # ('a b', 8)? pairs: 'a a' 6, 'a b' 5, 'b </w>' 5 -> (a,a) wins;
    # round 2: ' aa a b ' pairs: 'aa a' 3, 'a b' 5, ... -> (a,b)? see sim
    texts = ["aaab aaab aaab", "ab ab"]
    df = spark.createDataFrame([("d1", texts[0]), ("d2", texts[1])],
                               ["doc_id", "text"])
    got = B.train_bpe(df, n_merges=3, min_count=1)
    want = _sim_train_full(texts, 3, 1)
    assert got == want
    assert got[0][1:3] == ("a", "a")  # (a,a) weight 6 beats (a,b) 5


def test_bpe_segment_counts(spark):
    df = spark.createDataFrame(
        [("d1", "aaab ab"), ("d2", ""), ("d3", "zzz")],
        ["doc_id", "text"])
    merges = [(1, "a", "a", 0), (2, "a", "b", 0)]
    out = {r["doc_id"]: (r["n_tokens"], r["n_subwords"])
           for r in B.bpe_segment(df, merges).collect()}
    # 'aaab': a a a b -> aa a b -> aa ab + </w> = 3 symbols... check:
    # ' a a a b </w> ' -(a,a)-> ' aa a b </w> ' -(a,b)-> ' aa ab </w> '
    # = 3 subwords; 'ab' -> ' a b </w> ' -> ' ab </w> ' = 2
    assert out["d1"] == (2, 5)
    assert out["d2"] == (0, 0)  # empty docs still emit a row
    # unseen symbols pass through: 'zzz' = z z z </w> (no merges apply)
    assert out["d3"] == (1, 4)


def test_bpe_segment_consistent_with_training(spark):
    pairs = _docs_texts(spark, limit=100)
    df = spark.createDataFrame(pairs, ["doc_id", "text"])
    merges = B.train_bpe(df, n_merges=4, min_count=2)
    out = B.bpe_segment(df, merges)
    rows = out.collect()
    assert len(rows) == len(pairs)
    # merging can only reduce symbol count: chars+1 >= n_subwords >= tokens
    for r in rows:
        assert r["n_subwords"] >= r["n_tokens"]


# --- oracle-side property: the pure-Python simulation and the DuckDB
# unrolled-CTE twin agree on random tiny corpora (no Spark needed; the
# Spark engine is pinned against the same simulation above, closing the
# sim <-> Spark <-> DuckDB triangle) -----------------------------------

import duckdb  # noqa: E402
import sys  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

sys.path.insert(0, ".")

WORDS = st.sampled_from(["a", "b", "ab", "aab", "ba", "x", "aa"])
DOC = st.lists(WORDS, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=3))
def test_bpe_oracle_sql_matches_simulation(texts):
    import __spark_entry__ as E
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    got = con.execute(E.oracle_sql()["bpe_merges"]).fetchall()
    want = [tuple(m) for m in _sim_train_full(texts, 2, 2)]
    assert [tuple(r) for r in got] == want


def test_bpe_segment_oracle_degenerate_corpus(spark):
    """All-hapax corpus: min_count=2 training learns ZERO merges, so
    segmentation must be the identity (chars + </w> per word) in BOTH
    engines — not the old oracle CROSS-JOIN wipeout that coalesced
    every doc to (0, 0) while Spark returned real counts."""
    import __spark_entry__ as E
    rows = [(0, "abc de"), (1, "xyz"), (2, "")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = sorted(map(tuple,
                     con.execute(E.oracle_sql()["bpe_segment"]).fetchall()))
    # abc -> a b c </w> (4 symbols), de -> 3, xyz -> 4, empty doc -> 0
    assert got == [(0, 2, 7), (1, 1, 4), (2, 0, 0)]
    df = spark.createDataFrame([(str(i), t) for i, t in rows],
                               ["doc_id", "text"])
    merges = B.train_bpe(df, n_merges=2, min_count=2)
    assert merges == []
    sgot = sorted((int(r["doc_id"]), r["n_tokens"], r["n_subwords"])
                  for r in B.bpe_segment(df, merges).collect())
    assert sgot == got


WORDTXT = st.lists(st.sampled_from(["a", "b", "ab", "x9", "ÿ", ""]),
                   min_size=0, max_size=10).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(WORDTXT, min_size=1, max_size=3))
def test_feature_hash_oracle_sql_matches_simulation(texts):
    """Pure-Python simulation of the hashing trick vs the DuckDB twin
    (the Spark engine is pinned to the oracle by the driver harness)."""
    import hashlib
    import re as _re

    import __spark_entry__ as E
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    got = sorted(map(tuple,
                     con.execute(E.oracle_sql()["feature_hash"]).fetchall()))
    want = {}
    for i, t in enumerate(texts):
        for tok in _re.findall(r"[a-z0-9؀-ۿ]+", t.lower()):
            d = hashlib.md5(tok.encode()).hexdigest()
            b = int(d[:15], 16) % 16
            s = 1 if int(d[15], 16) % 2 == 0 else -1
            want[(i, b)] = want.get((i, b), 0) + s
    want = sorted((i, b, w) for (i, b), w in want.items() if w != 0)
    assert got == want
