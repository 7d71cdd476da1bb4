"""Corpus keyword / distribution tier (operators/keywords.py,
textstats.length_quantiles, multimodal.media_dedup)."""

import pyspark.sql.functions as F

from rag_document_parser_spark.operators import keywords as KW
from rag_document_parser_spark.operators import multimodal as M
from rag_document_parser_spark.operators import textstats as T
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _tiny(spark):
    rows = [
        ("d1", "apple banana apple cherry"),
        ("d2", "banana cherry cherry"),
        ("d3", "apple durian"),
        ("d4", ""),  # empty doc still counts toward n_docs
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_hand_computed(spark):
    out = {(r["doc_id"], r["term"]): (r["tf"], r["df_t"], r["score_e6"],
                                      r["krank"])
           for r in KW.tfidf_keywords(_tiny(spark), top_k=5,
                                      min_df=1).collect()}
    # d1: 4 tokens, n_docs=4. apple tf=2 df=2 -> 2*4*1e6 // (2*4) = 1e6
    assert out[("d1", "apple")] == (2, 2, 1_000_000, 1)
    # d1: banana tf=1 df=2 -> 4e6 // 8 = 500000; cherry same score ->
    # lexical tie-break puts banana before cherry
    assert out[("d1", "banana")] == (1, 2, 500_000, 2)
    assert out[("d1", "cherry")] == (1, 2, 500_000, 3)
    # d3: durian tf=1 df=1, 2 tokens -> 4e6 // 2 = 2e6, outranks apple
    assert out[("d3", "durian")] == (1, 1, 2_000_000, 1)
    assert out[("d3", "apple")][3] == 2
    assert not any(doc == "d4" for doc, _ in out)


def test_tfidf_min_df_and_top_k(spark):
    out = KW.tfidf_keywords(_tiny(spark), top_k=1, min_df=2)
    rows = out.collect()
    assert all(r["df_t"] >= 2 for r in rows)  # durian (df=1) dropped
    assert all(r["krank"] == 1 for r in rows)
    per_doc = {r["doc_id"] for r in rows}
    assert per_doc == {"d1", "d2", "d3"}


def test_tfidf_partition_and_materialize_invariant(spark):
    docs = _docs(spark).limit(80)
    a = {(r["doc_id"], r["term"], r["score_e6"], r["krank"])
         for r in KW.tfidf_keywords(docs, top_k=3).collect()}
    b = {(r["doc_id"], r["term"], r["score_e6"], r["krank"])
         for r in KW.tfidf_keywords(docs.repartition(17), top_k=3,
                                    materialize=True).collect()}
    assert a == b and len(a) > 0


def test_vocab_coverage_monotone_and_complete(spark):
    out = KW.vocab_coverage(_docs(spark), top_n=20).collect()
    assert [r["vrank"] for r in out] == list(range(1, len(out) + 1))
    cnts = [r["cnt"] for r in out]
    assert cnts == sorted(cnts, reverse=True)
    ppms = [r["cum_ppm"] for r in out]
    assert ppms == sorted(ppms) and 0 < ppms[0] <= ppms[-1] <= 1_000_000
    # full-vocab coverage closes at exactly 1.0 (modulo div flooring)
    full = KW.vocab_coverage(_docs(spark), top_n=10**6).collect()
    assert full[-1]["cum_ppm"] == 1_000_000


def test_vocab_coverage_tiebreak_lexical(spark):
    df = spark.createDataFrame([("d1", "b a"), ("d2", "a b")],
                               ["doc_id", "text"])
    out = KW.vocab_coverage(df, top_n=2).collect()
    assert [(r["vrank"], r["term"]) for r in out] == [(1, "a"), (2, "b")]


def test_length_quantiles_hand_computed(spark):
    # lengths 1..10 in one group: type-1 quantiles are the ceil(p*n/100)-th
    # smallest value = p/10 for n=10
    df = spark.createDataFrame(
        [(f"d{i}", "x" * i) for i in range(1, 11)], ["doc_id", "text"])
    r = T.length_quantiles(df, group_col=None).collect()[0]
    assert (r["grp"], r["n_docs"], r["min_len"], r["max_len"]) == \
        ("all", 10, 1, 10)
    assert (r["p25"], r["p50"], r["p75"], r["p90"]) == (3, 5, 8, 9)


def test_length_quantiles_grouped_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, T.length_quantiles(docs).collect()))
    b = sorted(map(tuple,
                   T.length_quantiles(docs.repartition(13)).collect()))
    assert a == b and len(a) >= 2
    for row in a:
        n, mn, mx, p25, p50, p75, p90 = row[1:]
        assert mn <= p25 <= p50 <= p75 <= p90 <= mx


def test_media_dedup_planted_duplicates(spark):
    base = M.synthetic_media_df(spark, 12)
    clones = M.synthetic_media_df(spark, 5).withColumn(
        "media_ref", F.regexp_replace("media_ref", "/m", "/c"))
    out = M.media_dedup(base.unionByName(clones)).collect()
    assert len(out) == 17
    by_ref = {r["media_ref"]: r for r in out}
    for i in range(5):  # cloned payloads: 'c' ref wins keeper selection
        m, c = by_ref[f"img://64x64/m{i}"], by_ref[f"img://64x64/c{i}"]
        assert m["payload_sha"] == c["payload_sha"]
        assert m["n_copies"] == c["n_copies"] == 2
        assert m["is_dup"] and not c["is_dup"]
        assert m["keeper_ref"] == c["media_ref"]
    for i in range(5, 12):  # singletons keep themselves
        r = by_ref[f"img://64x64/m{i}"]
        assert r["n_copies"] == 1 and not r["is_dup"]


def test_pmi_hand_computed(spark):
    # "x y" always adjacent; "a b" never: PMI separates them
    rows = [("d%d" % i, "x y filler%d a" % i) for i in range(6)]
    rows += [("e%d" % i, "b filler%d" % i) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): r for r in
           KW.pmi_bigrams(df, min_count=2, top_n=100).collect()}
    assert ("x", "y") in out
    r = out[("x", "y")]
    # c_ab=6, c_a=6, c_b=6, n_uni = 6*4 + 6*2 = 36
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (6, 6, 6)
    assert r["score_e6"] == (6 * 1_000_000 * 36) // (6 * 6)
    assert ("a", "b") not in out  # never adjacent
    # perfectly-correlated pair outranks every filler collocation
    assert r["prank"] == min(x["prank"] for x in out.values())


def test_pmi_min_count_and_rank_contiguous(spark):
    out = KW.pmi_bigrams(_docs(spark), min_count=3, top_n=25).collect()
    assert 0 < len(out) <= 25
    assert [r["prank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["score_e6"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(r["c_ab"] >= 3 for r in out)


def test_pmi_partition_invariant(spark):
    docs = _docs(spark)
    a = [tuple(r) for r in KW.pmi_bigrams(docs, min_count=3,
                                          top_n=10).collect()]
    b = [tuple(r) for r in KW.pmi_bigrams(docs.repartition(17), min_count=3,
                                          top_n=10).collect()]
    assert a == b and len(a) > 0


def test_feature_hash_dense_matches_sparse(spark):
    from rag_document_parser_spark.operators.vectorize import (
        feature_hash_sparse, feature_hash_vectors)
    docs = _docs(spark).limit(60)
    dense = {r["doc_id"]: (list(r["vec"]), r["n_tokens"])
             for r in feature_hash_vectors(docs, dim=16).collect()}
    sparse = {}
    for r in feature_hash_sparse(docs, dim=16).collect():
        sparse.setdefault(r["doc_id"], [0] * 16)[r["bucket"]] = r["weight"]
    assert set(dense) >= set(sparse)
    for did, (vec, _) in dense.items():
        assert vec == sparse.get(did, [0] * 16)


def test_feature_hash_empty_doc_and_token_count(spark):
    from rag_document_parser_spark.operators.vectorize import (
        feature_hash_vectors)
    df = spark.createDataFrame(
        [("d1", "alpha beta alpha"), ("d2", "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           feature_hash_vectors(df, dim=8).collect()}
    assert set(out) == {"d1", "d2"}  # empty doc still emits a row
    assert out["d2"]["n_tokens"] == 0 and list(out["d2"]["vec"]) == [0] * 8
    assert out["d1"]["n_tokens"] == 3
    # signed counts conserve the L1 bound: |sum per bucket| <= tokens
    assert sum(abs(v) for v in out["d1"]["vec"]) <= 3


def test_feature_hash_feeds_similarity_tier(spark):
    from rag_document_parser_spark.operators.vectorize import (
        feature_hash_vectors)
    from rag_document_parser_spark.operators import similarity as V
    docs = _docs(spark).limit(40).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    # plant an exact textual duplicate of doc 0 under id 100000
    dup = docs.where(F.col("doc_id") == 0).select(
        F.lit(100000).cast("long").alias("doc_id"), "text")
    emb = (feature_hash_vectors(docs.unionByName(dup), dim=16,
                                as_float=True)
           .where(F.col("n_tokens") > 0)
           .select(F.col("doc_id").alias("vec_id"),
                   F.col("vec").alias("embedding")))
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    top = V.cosine_topk(emb, q, k=3).collect()
    assert len(top) == 3
    best = min(top, key=lambda r: r["rank"])
    # the duplicate's hashed vector is identical -> cosine 1.0 at rank 1
    assert best["vec_id"] == 100000 and abs(best["cosine"] - 1.0) < 1e-6
