"""BM25 lexical retrieval (operators/retrieval.py) vs a pure-Python
twin of the fixed-point log-free formula, plus structural invariants:
the broadcast query-term prune never changes document frequency, the
top-k is deterministic under re-evaluation, and degenerate inputs are
no-ops rather than division errors."""

import re

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.retrieval import (
    bm25_topk,
    inverted_index,
)

CORPUS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "the quick brown cat sleeps on the warm mat"),
    ("d3", "a fox and a cat met a dog near the river"),
    ("d4", "quantum entanglement of photon pairs in free space"),
    ("d5", "the dog the dog the dog barked at the fox"),
    ("d6", ""),  # empty doc: counts toward N, owns no postings
]
QUERIES = [("q_animals", "fox dog"), ("q_physics", "photon entanglement"),
           ("q_stop", "the"), ("q_miss", "zyzzyva")]


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _python_bm25(corpus, queries, k):
    """Pure-Python twin: identical integer floor arithmetic."""
    toks = {d: _toks(t) for d, t in corpus}
    n_docs = len(corpus)
    total = sum(len(t) for t in toks.values())
    avgdl_e3 = (1000 * total) // max(n_docs, 1)
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(_toks(qtext)):
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf_e3 = (1000 * (2 * n_docs - 2 * df + 1)) // (2 * df + 1)
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                ndl_e3 = (1_000_000 * len(t)) // max(avgdl_e3, 1)
                sat_e3 = (22_000_000 * tf) // (10_000 * tf + 3_000
                                               + 9 * ndl_e3)
                nt, sc = scores.get(d, (0, 0))
                scores[d] = (nt + 1, sc + idf_e3 * sat_e3)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
        out[qid] = [(d, nt, sc, i + 1)
                    for i, (d, (nt, sc)) in enumerate(ranked[:k])]
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(QUERIES, ["query_id", "text"])


def test_bm25_matches_python_twin(corpus_df, queries_df):
    got = {}
    for r in bm25_topk(corpus_df, queries_df, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_terms"], r["score_e6"], r["rank"]))
    for qid in got:
        got[qid].sort(key=lambda x: x[3])
    expect = _python_bm25(CORPUS, QUERIES, k=3)
    assert got == {q: v for q, v in expect.items() if v}
    # semantics spot-checks: topical queries retrieve their documents
    assert got["q_physics"][0][0] == "d4"
    assert {d for d, *_ in got["q_animals"]} <= {"d1", "d3", "d5"}
    assert "q_miss" not in got  # no matching term -> no rows


def test_bm25_prune_preserves_df(spark, corpus_df):
    """df computed on query-pruned postings equals corpus df: feeding a
    prebuilt full index via ``postings=`` changes nothing."""
    q = spark.createDataFrame([("q", "fox dog the")], ["query_id", "text"])
    idx = inverted_index(corpus_df)
    a = sorted(map(tuple, bm25_topk(corpus_df, q, k=6).collect()))
    b = sorted(map(tuple, bm25_topk(corpus_df, q, k=6,
                                    postings=idx).collect()))
    assert a == b and len(a) > 0


def test_bm25_deterministic_under_repartition(corpus_df, queries_df):
    one = bm25_topk(corpus_df.repartition(7), queries_df, k=3).collect()
    two = bm25_topk(corpus_df.repartition(2), queries_df, k=3).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def test_bm25_empty_corpus_and_empty_query(spark, corpus_df):
    empty = spark.createDataFrame([], "doc_id string, text string")
    q = spark.createDataFrame([("q", "fox")], ["query_id", "text"])
    assert bm25_topk(empty, q, k=3).count() == 0
    eq = spark.createDataFrame([], "query_id string, text string")
    assert bm25_topk(corpus_df, eq, k=3).count() == 0


def test_inverted_index_shape(corpus_df):
    rows = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in inverted_index(corpus_df).collect()}
    assert rows[("dog", "d5")] == (3, 10)
    assert rows[("the", "d1")] == (2, 9)
    assert not any(d == "d6" for _, d in rows)


def test_bm25_stopword_query_broadcast_plan(corpus_df, queries_df):
    """The corpus-sized postings relation must meet the query terms via
    a BROADCAST join (the prune that keeps a stopword query from
    shuffling the whole index), and df/stats joins stay broadcast."""
    plan = bm25_topk(corpus_df, queries_df, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only SortMergeJoin-free requirement: postings never shuffle
    # against the query side
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id string,"
                                       " rank long")


def test_rrf_fuse_exact_fixed_point_scores(spark):
    from rag_document_parser_spark.operators.retrieval import rrf_fuse

    lex = _ranked(spark, [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)])
    dense = _ranked(spark, [("q", "b", 1), ("q", "d", 2), ("q", "a", 3)])
    got = {r["doc_id"]: (r["n_lists"], r["rrf_e6"], r["rank"])
           for r in rrf_fuse([lex, dense], k=10).collect()}
    c = lambda r: 1_000_000 // (60 + r)  # noqa: E731
    want = {"b": (2, c(2) + c(1)), "a": (2, c(1) + c(3)),
            "d": (1, c(2)), "c": (1, c(3))}
    order = sorted(want, key=lambda d: (-want[d][1], d))
    assert got == {d: (want[d][0], want[d][1], order.index(d) + 1)
                   for d in want}


def test_rrf_fuse_doc_in_both_lists_beats_single_list(spark):
    from rag_document_parser_spark.operators.retrieval import rrf_fuse

    # "x" is rank 2 in BOTH lists; each list's rank-1 doc is unique to
    # it. 2/(60+2) > 1/(60+1), so the consensus doc must win.
    lex = _ranked(spark, [("q", "a", 1), ("q", "x", 2)])
    dense = _ranked(spark, [("q", "b", 1), ("q", "x", 2)])
    top = rrf_fuse([lex, dense], k=1).collect()
    assert [(r["doc_id"], r["rank"]) for r in top] == [("x", 1)]


def test_rrf_fuse_respects_k_and_tie_break(spark):
    from rag_document_parser_spark.operators.retrieval import rrf_fuse

    # same rank in one list each -> equal scores; tie breaks by doc_id
    lex = _ranked(spark, [("q", "zz", 1)])
    dense = _ranked(spark, [("q", "aa", 1)])
    got = [(r["doc_id"], r["rank"])
           for r in rrf_fuse([lex, dense], k=2).orderBy("rank").collect()]
    assert got == [("aa", 1), ("zz", 2)]


def test_rrf_fuse_input_validation(spark):
    from rag_document_parser_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([_ranked(spark, [("q", "a", 1)])], k0=0)


def test_rrf_fuse_hybrid_legs_end_to_end(spark):
    """BM25 leg + dense-stand-in leg over the shared corpus fuse into
    a per-query top-k whose every (query, doc) appears in >= 1 leg."""
    from rag_document_parser_spark.operators.retrieval import rrf_fuse

    corpus = spark.createDataFrame(CORPUS, "doc_id string, text string")
    queries = spark.createDataFrame(QUERIES, "query_id string, text string")
    lex = bm25_topk(corpus, queries, k=3)
    # dense stand-in: doc length as the score (deterministic, no embeddings
    # needed) ranked per query
    from rag_document_parser_spark.operators.similarity import topk_per_query
    scored = (corpus.withColumn("s", F.length("text"))
              .crossJoin(queries.select("query_id"))
              .select("query_id", "doc_id", "s"))
    dense = topk_per_query(scored, 3, "query_id", "doc_id", "s")
    fused = rrf_fuse([lex, dense], k=3).collect()
    legs = {(r["query_id"], r["doc_id"])
            for r in lex.collect() + dense.collect()}
    assert fused and all((r["query_id"], r["doc_id"]) in legs
                         for r in fused)
    assert all(1 <= r["rank"] <= 3 and r["n_lists"] in (1, 2)
               for r in fused)


# ---------------------------------------------------------------------------
# contrastive triple mining
# ---------------------------------------------------------------------------


def test_contrastive_triples_planted_family(spark):
    """Anchor A: positive P (4 shingles each, 3 shared -> jac 600000)
    and hard negative N (1 shared of 7 -> jac 142857). P and N share
    no shingle, so only A has both legs and only A emits a triple."""
    from rag_document_parser_spark.operators.retrieval import (
        mine_contrastive_pairs)

    docs = spark.createDataFrame(
        [(1, "core words one two three four"),
         (2, "core words one two three five"),
         (3, "diff other junk two three four"),
         (4, "totally unrelated island of text")],
        "doc_id long, text string")
    rows = mine_contrastive_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.anchor, r.pos_id, r.neg_id) == (1, 2, 3)
    assert r.pos_jac_e6 == 600_000            # 3*1e6 div 5
    assert r.neg_jac_e6 == 1_000_000 // 7     # 1*1e6 div 7


def test_contrastive_tiebreaks_min_id(spark):
    """Two equally-good positives (identical clones) -> the SMALLER id
    wins via the encoded key's (1e8 - other) term."""
    from rag_document_parser_spark.operators.retrieval import (
        mine_contrastive_pairs)

    t = "core words one two three four"
    docs = spark.createDataFrame(
        [(1, t), (5, t), (9, t),
         (3, "diff other junk two three four")],
        "doc_id long, text string")
    got = {r.anchor: r for r in mine_contrastive_pairs(docs).collect()}
    # anchor 1: positives {5, 9} both jac 1e6 -> picks 5; negative 3
    assert got[1].pos_id == 5 and got[1].neg_id == 3
    assert got[5].pos_id == 1      # min-id among {1, 9}
    assert got[9].pos_id == 1


def test_contrastive_id_zero_decodes_exactly(spark):
    """id 0 as the winning positive: the tiebreak term is 1e8-1-0,
    which must NOT carry into the Jaccard digits of the encoded key
    (regression: the original 1e8-other encoding aliased id 0 into
    jac_e6+1 with pos_id=1e8)."""
    from rag_document_parser_spark.operators.retrieval import (
        mine_contrastive_pairs)

    t = "core words one two three four"
    docs = spark.createDataFrame(
        [(0, t), (1, t),
         (3, "diff other junk two three four")],
        "doc_id long, text string")
    got = {r.anchor: r for r in mine_contrastive_pairs(docs).collect()}
    assert got[1].pos_id == 0 and got[1].pos_jac_e6 == 1_000_000
    assert got[0].pos_id == 1 and got[0].neg_id == 3


# ---- positional phrase retrieval (IIR §2.4.2) ---------------------------

from rag_document_parser_spark.operators.retrieval import (
    phrase_match,
    phrase_topk,
    positional_index,
)


@pytest.fixture(scope="module")
def phrase_docs(spark):
    return spark.createDataFrame(
        [("d1", "the quick brown fox; the quick brown cat"),
         ("d2", "quick brown shoes and a Quick-Brown hat"),
         ("d3", "brown quick reversed order here"),
         ("d4", "the the the repeated stopwords the the"),
         ("d5", "")],
        ["doc_id", "text"])


def test_positional_index_positions(phrase_docs):
    idx = {(r["term"], r["doc_id"], r["pos"])
           for r in positional_index(
               phrase_docs.where(F.col("doc_id") == "d3")).collect()}
    assert idx == {("brown", "d3", 0), ("quick", "d3", 1),
                   ("reversed", "d3", 2), ("order", "d3", 3),
                   ("here", "d3", 4)}


def test_phrase_match_consecutive_only(spark, phrase_docs):
    qs = spark.createDataFrame([("q1", "quick brown")],
                               ["query_id", "text"])
    out = {(r["query_id"], r["doc_id"]): r["n_matches"]
           for r in phrase_match(phrase_docs, qs).collect()}
    # d1 has the phrase twice; d2 twice (punctuation/case fold through
    # the tokenizer); d3 has both words but REVERSED -> no match
    assert out == {("q1", "d1"): 2, ("q1", "d2"): 2}


def test_phrase_match_repeated_terms(spark, phrase_docs):
    """A phrase whose tokens repeat ('the the') must count overlapping
    starts correctly: d4 = 'the the the repeated stopwords the the'
    has starts at 0, 1, and 5."""
    qs = spark.createDataFrame([("q2", "the the")], ["query_id", "text"])
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(phrase_docs, qs).collect()}
    assert out == {"d4": 3}


def test_phrase_match_empty_phrase_absent(spark, phrase_docs):
    qs = spark.createDataFrame([("q3", ";;; ...")], ["query_id", "text"])
    assert phrase_match(phrase_docs, qs).count() == 0


def test_phrase_topk_rank_and_ties(spark, phrase_docs):
    qs = spark.createDataFrame([("q1", "quick brown")],
                               ["query_id", "text"])
    rows = phrase_topk(phrase_docs, qs, k=5).orderBy("rank").collect()
    # equal counts (2, 2) tie-break by ascending doc_id
    assert [(r["doc_id"], r["n_matches"], r["rank"]) for r in rows] == \
        [("d1", 2, 1), ("d2", 2, 2)]


def test_phrase_match_partition_invariance(spark, phrase_docs):
    qs = spark.createDataFrame(
        [("q1", "quick brown"), ("q2", "the the")], ["query_id", "text"])
    a = sorted(map(tuple, phrase_match(phrase_docs, qs).collect()))
    b = sorted(map(tuple, phrase_match(
        phrase_docs.repartition(7), qs).collect()))
    assert a == b


# ---- more-like-this (seed-doc top-terms -> BM25) ------------------------

from rag_document_parser_spark.operators.retrieval import more_like_this


@pytest.fixture(scope="module")
def mlt_docs(spark):
    return spark.createDataFrame(
        [("s1", "penguin colony antarctic ice penguin krill"),
         ("n1", "penguin krill diet in antarctic waters"),
         ("n2", "ice shelf collapse antarctic survey"),
         ("x1", "stock market prices rally on earnings"),
         ("x2", "quarterly earnings beat market estimates"),
         ("e1", "")],
        ["doc_id", "text"])


def test_mlt_finds_topical_neighbors_excludes_seed(mlt_docs):
    seeds = mlt_docs.where(F.col("doc_id") == "s1").select("doc_id")
    out = more_like_this(mlt_docs, seeds, k=3, n_terms=4).collect()
    ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert "s1" not in ids                    # self excluded
    assert set(ids[:2]) <= {"n1", "n2"}       # topical docs outrank finance
    assert "x1" not in ids[:1] and "x2" not in ids[:1]


def test_mlt_empty_seed_absent(mlt_docs):
    seeds = mlt_docs.where(F.col("doc_id") == "e1").select("doc_id")
    assert more_like_this(mlt_docs, seeds, k=3).count() == 0


def test_mlt_deterministic_and_partition_invariant(mlt_docs):
    seeds = mlt_docs.where(F.col("doc_id").isin("s1", "x1")) \
        .select("doc_id")
    a = sorted(map(tuple, more_like_this(mlt_docs, seeds, k=3).collect()))
    b = sorted(map(tuple, more_like_this(
        mlt_docs.repartition(7), seeds, k=3).collect()))
    assert a == b
