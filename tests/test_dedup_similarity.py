"""Dedup + similarity + textstats operators vs brute-force Python oracles."""

from __future__ import annotations

import hashlib
import itertools
import math
import re

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators import dedup, similarity, textstats
from rag_document_parser_spark.operators.multimodal import (
    extract_media_features,
    fake_decode_image,
    synthetic_media_df,
)

DOCS = [
    ("a", "the quick brown fox jumps over the lazy dog"),
    ("b", "the quick brown fox jumps over the lazy dog"),        # exact dup of a
    ("c", "the quick brown fox leaps over the lazy dog"),        # near dup
    ("d", "completely different content about spark engines"),
    ("e", "the quick brown fox jumps over the lazy cat today"),  # near dup
    ("f", ""),                                                    # empty
]


def _tokens(s):
    return [t for t in re.split(r"[^a-z0-9؀-ۿ]+", s.lower()) if t]


def _shingles(s, n=3):
    t = _tokens(s)
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark, docs_df):
    rows = dedup.exact_dedup(docs_df).collect()
    assert len(rows) == 1
    assert rows[0]["n_dupes"] == 2 and rows[0]["keeper_id"] == "a"
    assert rows[0]["content_hash"] == hashlib.md5(DOCS[0][1].encode()).hexdigest()


def test_ngram_jaccard_matches_bruteforce(spark, docs_df):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.3).collect()}
    exp = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _shingles(ta), _shingles(tb)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.3 and ia < ib:
            exp[(ia, ib)] = round(j, 6)
    assert got == exp
    assert ("a", "b") in got and got[("a", "b")] == 1.0


def test_ngram_jaccard_df_cap_and_plan_shape(spark, docs_df):
    """The stop-shingle cap must be enforced via a map-side-combinable
    aggregate + broadcast anti-join — never a window over the raw shingle
    partition (a straggler holding O(corpus) rows at web scale)."""
    df = dedup.ngram_jaccard_pairs(docs_df, threshold=0.1, df_cap=1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # df_cap semantics: with a cap of 1, every shared shingle is a stop-
    # shingle, so no pair can reach any threshold
    assert dedup.ngram_jaccard_pairs(docs_df, threshold=0.1,
                                     df_cap=1).count() == 0


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs_df):
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.minhash_lsh_pairs(docs_df, k=32, bands=8).collect()}
    assert ("a", "b") in pairs  # identical docs always collide
    # LSH candidates must all share at least one shingle (sanity)
    for ia, ib in pairs:
        ta = dict(DOCS)[ia]; tb = dict(DOCS)[ib]
        assert _shingles(ta) & _shingles(tb)


def test_minhash_signature_deterministic(spark, docs_df):
    s1 = {r["id"]: r["signature"] for r in dedup.minhash_signatures(docs_df).collect()}
    s2 = {r["id"]: r["signature"] for r in dedup.minhash_signatures(docs_df).collect()}
    assert s1 == s2
    assert s1["a"] == s1["b"]  # identical text → identical signature


def test_minhash_collision_rate_estimates_jaccard(spark):
    """Slot-collision rate must track exact Jaccard — the regression
    gate for the permutation modulus: an int64-safe affine map into a
    61-bit modulus wraps at most once, is near-monotone in the base
    hash, and collapsed this rate to 0.34 on this planted J=0.77 pair
    before the Mersenne-31 modulus fix (dedup.py docstring)."""
    base = "the quick brown fox jumps over the lazy dog again and " * 4
    docs = spark.createDataFrame(
        [("x", base + "one two three"), ("y", base + "four five six")],
        ["doc_id", "text"])
    sa, sb = (_shingles(t) for _, t in docs.collect())
    j = len(sa & sb) / len(sa | sb)
    sigs = {r["id"]: list(r["signature"]) for r in
            dedup.minhash_signatures(docs, k=64).collect()}
    rate = sum(a == b for a, b in zip(sigs["x"], sigs["y"])) / 64
    assert abs(rate - j) < 0.2, (rate, j)


def test_simhash_near_pairs(spark, docs_df):
    sh = {r["id"]: r["simhash"] for r in dedup.simhash64(docs_df).collect()}
    assert sh["a"] == sh["b"]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(docs_df, max_hamming=3).collect()}
    assert pairs[("a", "b")] == 0
    # verify hamming values against python
    for (ia, ib), d in pairs.items():
        assert bin(sh[ia] ^ sh[ib]).count("1") == d <= 3


def test_cosine_topk_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    corpus = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = spark.createDataFrame(vecs[:3], ["query_id", "embedding"])
    got = similarity.cosine_topk(corpus, queries, k=5).collect()

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for qid in range(3):
        qv = dict(vecs)[qid]
        exp = sorted(((round(cos(v, qv), 6), i) for i, v in vecs if i != qid),
                     key=lambda t: (-t[0], t[1]))[:5]
        mine = sorted([(r["cosine"], r["vec_id"]) for r in got if r["query_id"] == qid],
                      key=lambda t: (-t[0], t[1]))
        assert [i for _, i in mine] == [i for _, i in exp]
        for (gc, gi), (ec, ei) in zip(mine, exp):
            assert abs(gc - ec) < 1e-4


def test_lsh_topk_subset_of_exact_ranking(spark):
    import random

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    corpus = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = spark.createDataFrame(vecs[:2], ["query_id", "embedding"])
    approx = similarity.lsh_cosine_topk(corpus, queries, k=5, n_bits=8, bands=4)
    rows = approx.collect()
    # sanity: results exist, scores are true cosines, ranks well-formed
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_language_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat is in the house and it is lazy for now"),
            ("ar", "مرحبا بالعالم مرحبا بالعالم مرحبا بالعالم"),
            ("de", "der hund ist nicht ein problem und das ist gut"),
            ("junk", "!!! ??? ,,, ;;; :::"),
        ],
        ["doc_id", "text"],
    )
    langs = {r["doc_id"]: r["lang_id"] for r in textstats.language_id(df).collect()}
    assert langs["en"] == "en" and langs["ar"] == "ar" and langs["de"] == "de"
    q = {r["doc_id"]: r for r in textstats.quality_features(df).collect()}
    assert q["en"]["quality_score"] > q["junk"]["quality_score"]
    # alpha_ratio counts letters AND spaces (the reference's readable-line
    # rule, document_parser.py:226-236), so punctuation soup with spaces
    # scores low but not zero
    assert q["junk"]["alpha_ratio"] < 0.5
    assert q["junk"]["punct_ratio"] > 0.5


def test_token_count_and_fingerprint(spark, docs_df):
    tc = {r["doc_id"]: r for r in textstats.token_count(docs_df).collect()}
    assert tc["a"]["ws_tokens"] == 9
    assert tc["f"]["ws_tokens"] == 0
    fp = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprint(docs_df).collect()}
    assert fp["a"] == fp["b"] and fp["a"] is not None
    assert fp["f"] is None


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media_df(spark, n=48)
    out = extract_media_features(media).collect()
    assert len(out) == 48
    by_ref = {r["media_ref"]: r for r in out}
    # deterministic fake decode reproducible driver-side
    sample = media.where(F.col("media_ref") == "img://64x64/m0").collect()[0]
    exp = fake_decode_image(bytes(sample["payload"]))
    got = by_ref["img://64x64/m0"]["feature"]
    assert [round(x, 6) for x in got] == [round(x, 6) for x in exp]
    assert all(r["decode_ok"] for r in out)
    assert {r["modality"] for r in out} == {"image", "audio", "video"}


def test_ivf_topk_recall_and_validity(spark):
    """IVF approximate top-k: every result is a genuine corpus vector in
    correct rank order, and recall vs the exact top-k stays high at
    nprobe=4 of 16 centroids on the driver embeddings."""
    from rag_document_parser_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id)
             for r in cosine_topk(emb, queries, k=5).collect()}
    rows = ivf_cosine_topk(emb, queries, k=5,
                           n_centroids=16, nprobe=4).collect()
    got = {(r.query_id, r.vec_id) for r in rows}
    assert len(got & exact) / len(exact) >= 0.8
    # per query: ranks are 1..n and cosines non-increasing
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for q, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        cosines = [x[1] for x in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_topk_empty_centroid_domain_raises_clearly(spark):
    """A corpus whose ids are not 0-based yields zero centroids; the
    operator must fail with a descriptive error, not an obscure
    analysis-time struct-access failure."""
    import pytest

    from rag_document_parser_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet") \
        .select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding") \
        .limit(40)
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"),
                                  "embedding")
    with pytest.raises(ValueError, match="no corpus rows"):
        ivf_cosine_topk(emb, queries, k=3, n_centroids=16)


def test_similarity_ops_tolerate_degenerate_vectors(spark):
    """NULL and zero-norm embeddings must not crash any similarity path
    (ANSI mode turns 0/0 into a task failure without try_divide) and
    must never place in results."""
    from rag_document_parser_spark.operators.similarity import (
        cosine_topk,
        embedding_near_dup_pairs,
        ivf_cosine_topk,
        lsh_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet") \
        .select("vec_id", "embedding").limit(60)
    deg = spark.createDataFrame(
        [(999901, None), (999902, [0.0] * 64)],
        "vec_id long, embedding array<float>")
    mixed = emb.unionByName(deg)
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    for fn in (cosine_topk, lsh_cosine_topk, ivf_cosine_topk):
        rows = fn(mixed, queries, k=3).collect()
        assert rows, fn.__name__
        assert all(r.vec_id < 999901 for r in rows), fn.__name__
    pairs = embedding_near_dup_pairs(mixed).collect()
    assert all(p.id_a < 999901 and p.id_b < 999901 for p in pairs)


def test_paragraph_dedup_removes_all_copies_keeps_order(spark):
    """RefinedWeb rule: every occurrence of a cross-doc repeated
    paragraph is dropped (no keeper), unique paragraphs survive in
    original order, and min_len exempts short paragraphs from both
    counting and removal."""
    from rag_document_parser_spark.operators.dedup import paragraph_dedup

    bp = "accept cookies to continue"
    docs = [
        (1, f"alpha one\n{bp}\nbeta two"),
        (2, f"{bp}\ngamma three\n{bp}"),          # twice in one doc
        (3, "delta four\nepsilon five"),
        (4, f"zz\n{bp}\nzz"),                     # 'zz' repeats only
        (5, "zz\nunique tail"),                   # ...across docs 4+5
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df, min_len=5).collect()}
    assert out[1].cleaned == "alpha one\nbeta two"
    assert (out[1].n_paragraphs, out[1].n_removed) == (3, 1)
    # both in-doc copies of the boilerplate go (count is per-occurrence)
    assert out[2].cleaned == "gamma three"
    assert out[2].n_removed == 2
    assert out[3].cleaned == "delta four\nepsilon five"
    assert out[3].n_removed == 0
    # 'zz' (len 2 < min_len 5) is cross-doc repeated but exempt
    assert out[4].cleaned == "zz\nzz"
    assert out[4].n_removed == 1
    assert out[5].cleaned == "zz\nunique tail"


def test_redact_pii_ordered_chain(spark):
    """Counts reflect the ordered chain: emails absorb their digit runs
    before later stages, SSN-shapes inside +phones never double-match,
    and clean text passes through untouched."""
    from rag_document_parser_spark.operators.pii import redact_pii

    docs = [
        (1, "mail a.user+tag@sub.example.co.uk now"),
        (2, "call +1-555-123-4567 or id 123-45-6789 at 10.0.0.1"),
        (3, "no pii here just words"),
        (4, "x@y.io and x@y.io twice"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].redacted == "mail <EMAIL> now"
    assert (out[1].n_email, out[1].n_phone) == (1, 0)
    assert out[2].redacted == "call <PHONE> or id <SSN> at <IP>"
    assert (out[2].n_ip, out[2].n_ssn, out[2].n_phone) == (1, 1, 1)
    assert out[3].redacted == docs[2][1]
    assert (out[3].n_email + out[3].n_ip + out[3].n_ssn
            + out[3].n_phone) == 0
    assert out[4].n_email == 2 and out[4].redacted == "<EMAIL> and <EMAIL> twice"


def test_dedup_clusters_chain_clique_pair(spark):
    """Min-label propagation resolves a 4-chain, a triangle, and a
    disjoint pair to their component minima; an undersized max_iter
    raises instead of returning an unconverged labelling."""
    import pytest as _pytest

    from rag_document_parser_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 9), (9, 4), (4, 7),          # chain {1,4,7,9}
         (20, 21), (21, 22), (20, 22),    # triangle {20,21,22}
         (31, 30)],                       # pair {30,31}
        "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 9: 1, 4: 1, 7: 1,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}
    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9, 0, -1)], "id_a long, id_b long")
    assert all(v == 1 for v in
               {r.id: r.cluster_id
                for r in dedup_clusters(long_chain).collect()}.values())
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(long_chain, max_iter=1)


def test_url_tier_extract_stats_block(spark):
    """URL extraction handles multiple/zero URLs per doc, domain stats
    lower-case and dedupe per-doc, and the blocklist anti-join drops
    exactly the citing docs while URL-free docs survive."""
    from rag_document_parser_spark.operators.urls import (
        block_domains, domain_stats, extract_urls)

    docs = [
        (1, "read https://a.example.com/x and https://a.example.com/y"),
        (2, "see http://B.Example.COM/z?q=1 now"),
        (3, "no links at all"),
        (4, "mixed https://bad.tracker.net/pixel https://a.example.com/"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = df.select(F.size(extract_urls(F.col("text"))).alias("n")) \
        .orderBy("n").collect()
    assert [r.n for r in n] == [0, 1, 2, 2]
    stats = {r.domain: (r.n_docs, r.n_urls)
             for r in domain_stats(df).collect()}
    assert stats["a.example.com"] == (2, 3)      # doc1 twice + doc4 once
    assert stats["b.example.com"] == (1, 1)      # lower-cased host
    assert stats["bad.tracker.net"] == (1, 1)
    bl = spark.createDataFrame([("Bad.Tracker.NET",)], "domain string")
    kept = sorted(r.doc_id for r in block_domains(df, bl).collect())
    assert kept == [1, 2, 3]


def test_segment_audio_windows_and_sample_math(spark):
    from rag_document_parser_spark.operators.multimodal import segment_audio
    out = segment_audio(synthetic_media_df(spark, n=9),
                        window_ms=300).collect()
    # audio items are i % 3 == 1 -> 3 of 9; 1000ms at 300ms windows ->
    # 4 segments, last one partial (900-1000)
    refs = {r["media_ref"] for r in out}
    assert refs == {f"img://64x64/m{i}" for i in (1, 4, 7)}
    assert len(out) == 12
    segs = sorted((r["seg_idx"], r["start_ms"], r["end_ms"], r["n_samples"])
                  for r in out if r["media_ref"] == "img://64x64/m1")
    assert segs == [(0, 0, 300, 4800), (1, 300, 600, 4800),
                    (2, 600, 900, 4800), (3, 900, 1000, 1600)]
    # per-segment digests deterministic and distinct per index
    shas = {r["seg_sha"] for r in out if r["media_ref"] == "img://64x64/m1"}
    assert len(shas) == 4


# ---------------------------------------------------------------------------
# asymmetric containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    from rag_document_parser_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs)

    body = " ".join(f"w{i} x{i} y{i}" for i in range(30))   # 90 words
    quote = " ".join(f"w{i} x{i} y{i}" for i in range(5))   # first 15
    df = spark.createDataFrame(
        [(1, body), (2, quote), (3, "totally unrelated content words "
                                    "about nothing shared with others")],
        "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r
           for r in containment_pairs(df, threshold_e6=900_000).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    # quote's shingles all inside body: containment(B side = quote) = 1.0
    assert max(r["cont_a_e6"], r["cont_b_e6"]) == 1_000_000
    assert (1, 3) not in got and (2, 3) not in got
    # the same pair is invisible to Jaccard at 0.5
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert not any(p["id_a"] == 1 and p["id_b"] == 2 for p in jac)


def test_containment_fixed_point_values(spark):
    from rag_document_parser_spark.operators.dedup import containment_pairs

    # A has 4 distinct 3-shingles (6 words), B = A's first 4 words
    # (2 shingles, both in A): cont_b = 1e6, cont_a = 2*1e6 div 4
    df = spark.createDataFrame(
        [(1, "a1 a2 a3 a4 a5 a6"), (2, "a1 a2 a3 a4")],
        "doc_id long, text string")
    r = containment_pairs(df, threshold_e6=900_000).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["inter"], row["n_a"], row["n_b"]) == (2, 4, 2)
    assert row["cont_a_e6"] == 500_000 and row["cont_b_e6"] == 1_000_000


def test_keep_best_per_cluster_score_and_tiebreak(spark):
    """Winner maximizes (score, id): component {1,4,7,9} with scores
    (5,5,9,2) keeps 7 on score; {20,21} with equal scores keeps 21 on
    the largest-id tiebreak; unpaired doc 99 never appears."""
    from rag_document_parser_spark.operators.dedup import (
        keep_best_per_cluster)

    pairs = spark.createDataFrame(
        [(1, 9), (9, 4), (4, 7), (20, 21)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(1, 5), (4, 5), (7, 9), (9, 2), (20, 3), (21, 3), (99, 100)],
        "doc_id long, q long")
    out = keep_best_per_cluster(docs, pairs, F.col("q")).collect()
    got = {r.id: (r.cluster_id, r.best_id, r.kept) for r in out}
    assert got == {1: (1, 7, False), 4: (1, 7, False), 7: (1, 7, True),
                   9: (1, 7, False), 20: (20, 21, False),
                   21: (20, 21, True)}
    assert 99 not in got


# ---------------------------------------------------------------------------
# exact edit-distance verification of candidate pairs
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    """Textbook character-based Levenshtein (the twin for unicode)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_verify_fixed_point_and_filter(spark):
    from rag_document_parser_spark.operators.dedup import edit_verify_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fix"),
         (3, "zzz entirely different"), (4, "the quick brown fox")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r
           for r in edit_verify_pairs(docs, pairs).collect()}
    # identical pair: dist 0, sim 1e6
    assert got[(1, 4)].edit_dist == 0 and got[(1, 4)].sim_e6 == 1_000_000
    # one substitution over 19 chars: 1e6 - 1e6*1 div 19
    assert got[(1, 2)].edit_dist == 1
    assert got[(1, 2)].sim_e6 == 1_000_000 - 1_000_000 // 19
    # min_sim_e6 drops the unrelated pair but keeps the near-dups
    kept = {(r.id_a, r.id_b)
            for r in edit_verify_pairs(docs, pairs,
                                       min_sim_e6=500_000).collect()}
    assert kept == {(1, 2), (1, 4)}


def test_edit_verify_unicode_char_based(spark):
    """Spark's levenshtein counts CHARACTERS, not bytes: 'café'→'cafe'
    is one substitution even though é is 2 bytes in utf-8. The pure-
    Python twin pins the char-based contract the oracle's ASCII fold
    can't exercise."""
    from rag_document_parser_spark.operators.dedup import edit_verify_pairs

    a, b = "café au lait — naïve", "cafe au lait -- naive"
    docs = spark.createDataFrame([(1, a), (2, b)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = edit_verify_pairs(docs, pairs).collect()[0]
    want = _lev(a, b)
    assert row.edit_dist == want
    assert row.sim_e6 == 1_000_000 - want * 1_000_000 // max(len(a), len(b))


def test_edit_verify_prefix_cap_bounds_work(spark):
    """prefix caps the compared text: beyond it, arbitrarily long docs
    cost the same. Distance/normalization are over the capped prefixes."""
    from rag_document_parser_spark.operators.dedup import edit_verify_pairs

    docs = spark.createDataFrame(
        [(1, "abcdefgh" * 100), (2, "abcdefgh" * 100 + "XYZ" * 200)],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = edit_verify_pairs(docs, pairs, prefix=50).collect()[0]
    assert row.edit_dist == 0 and row.sim_e6 == 1_000_000


# ---------------------------------------------------------------------------
# cross-snapshot dedup against a persisted index
# ---------------------------------------------------------------------------


def test_dedup_against_index_exact_near_fresh(spark):
    """Index = snapshot 1; snapshot 2 has an exact re-publication, a
    rotation (same 3-shingle SET -> identical MinHash signature ->
    near-dup, different md5 -> not exact), and a fresh doc."""
    from rag_document_parser_spark.operators.dedup import (
        build_dedup_index, dedup_against_index)

    # "a b c d" cycled: any window of 7 words has shingle set
    # {abc, bcd, cda, dab} regardless of rotation
    t1 = "wa wb wc wd wa wb wc"
    rot = "wb wc wd wa wb wc wd"
    corpus = spark.createDataFrame(
        [(1, t1), (2, "completely different old content here")],
        "doc_id long, text string")
    idx = build_dedup_index(corpus, k=16, bands=4)
    new = spark.createDataFrame(
        [(10, t1),                                  # exact re-publication
         (11, rot),                                 # near-dup only
         (12, "genuinely novel words qq rr ss tt")],  # fresh
        "doc_id long, text string")
    got = {r.id: (r.exact_dup, r.near_dup, r.kept)
           for r in dedup_against_index(new, idx, k=16, bands=4).collect()}
    assert got[10] == (True, True, False)
    assert got[11] == (False, True, False)
    assert got[12] == (False, False, True)
    assert len(got) == 3


def test_dedup_index_shapes_and_empty_text(spark):
    """Every doc gets exactly one exact key; band keys only when the
    doc has shingles (1 + bands rows otherwise). Empty text still
    indexes its exact hash."""
    from rag_document_parser_spark.operators.dedup import build_dedup_index

    df = spark.createDataFrame(
        [(1, "one two three four five"), (2, "")],
        "doc_id long, text string")
    rows = build_dedup_index(df, k=16, bands=4).collect()
    by = {}
    for r in rows:
        by.setdefault((r.id, r.kind), []).append(r.key)
    assert len(by[(1, "exact")]) == 1 and len(by[(1, "band")]) == 4
    assert len(by[(2, "exact")]) == 1 and (2, "band") not in by
    # short-doc in a fresh batch vs that index: exact dup of itself
    from rag_document_parser_spark.operators.dedup import dedup_against_index
    new = spark.createDataFrame([(9, "")], "doc_id long, text string")
    r = dedup_against_index(new, build_dedup_index(df, k=16, bands=4),
                            k=16, bands=4).collect()[0]
    assert (r.exact_dup, r.near_dup, r.kept) == (True, False, False)


def test_soft_dedup_weights_mass_conservation(spark):
    """Cluster {1,2,3} members each weigh 1e6 div 3; pair {10,11} each
    1e6 div 2; singleton 99 weighs 1e6 with itself as cluster_id. Each
    cluster's total weight is ~1e6 (one document's worth of mass)."""
    from rag_document_parser_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)],
                                 "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)],
                                  "id_a long, id_b long")
    got = {r.id: (r.cluster_id, r.csize, r.weight_e6)
           for r in soft_dedup_weights(docs, pairs).collect()}
    assert got[1] == (1, 3, 333333) and got[2] == (1, 3, 333333) \
        and got[3] == (1, 3, 333333)
    assert got[10] == (10, 2, 500000) and got[11] == (10, 2, 500000)
    assert got[99] == (99, 1, 1000000)
    assert len(got) == 6


def _cdc_twin(text, n=3, d=8):
    """Pure-Python CDC twin: boundary after 0-based position p iff the
    n-gram ending at p hashes to 0 mod d (60-bit md5)."""
    tk = _tokens(text)
    if not tk:
        return []
    bp = ([p for p in range(n - 1, len(tk))
           if int(hashlib.md5(" ".join(tk[p - n + 1:p + 1]).encode())
                  .hexdigest()[:15], 16) % d == 0]
          if len(tk) >= n else [])
    st = [0] + [p + 1 for p in bp]
    en = bp + [len(tk) - 1]
    return [(i, hashlib.md5(" ".join(tk[s:e + 1]).encode()).hexdigest(),
             e - s + 1)
            for i, (s, e) in enumerate(zip(st, en)) if e - s + 1 > 0]


def test_cdc_blocks_twin_parity_and_edge_cases(spark):
    """cdc_blocks matches the pure-Python twin on every doc, including
    short-doc (single block) and empty-doc (no rows) edges."""
    shared = ("the quick brown fox jumps over the lazy dog while seven "
              "wizards brew strong potions under moonlight near the "
              "river bend every autumn evening")
    cases = [(1, "alpha beta gamma " + shared + " delta epsilon"),
             (2, "one two three four five six " + shared + " seven"),
             (3, "totally unrelated content about catalyst plans"),
             (4, "hi"), (5, "")]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {}
    for r in dedup.cdc_blocks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.block_id, r.block_hash, r.block_len))
    for did, txt in cases:
        assert sorted(got.get(did, [])) == _cdc_twin(txt), f"doc {did}"


def test_cdc_block_dedup_offset_invariant_shared_mass(spark):
    """A passage embedded at DIFFERENT offsets in two docs yields
    identical interior block hashes (the CDC property), so both docs
    report the same dup_tokens mass; the unrelated doc reports zero."""
    shared = ("the quick brown fox jumps over the lazy dog while seven "
              "wizards brew strong potions under moonlight near the "
              "river bend every autumn evening")
    df = spark.createDataFrame(
        [(1, "alpha beta gamma " + shared + " delta epsilon"),
         (2, "one two three four five six " + shared + " seven eight"),
         (3, "totally unrelated content about catalyst plans")],
        "doc_id long, text string")
    blocks = dedup.cdc_blocks(df).collect()
    h1 = {r.block_hash for r in blocks if r.doc_id == 1}
    h2 = {r.block_hash for r in blocks if r.doc_id == 2}
    assert h1 & h2, "no shared blocks despite shared passage"
    stats = {r.doc_id: r for r in dedup.cdc_block_dedup(df).collect()}
    assert stats[1].dup_tokens == stats[2].dup_tokens > 0
    assert stats[3].dup_tokens == 0 and stats[3].dup_frac_e6 == 0
    # fixed-point fraction: dup_tokens * 1e6 div n_tokens
    for did in (1, 2, 3):
        r = stats[did]
        assert r.dup_frac_e6 == r.dup_tokens * 1_000_000 // r.n_tokens


def test_cdc_block_dedup_partition_invariant(spark):
    """Same result at 1 partition and highly-overpartitioned input —
    segmentation is row-local; aggregates key on content hashes."""
    rows = [(i, f"doc {i} body " + ("spark catalyst tungsten " * (i % 5)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.cdc_block_dedup(
        df.coalesce(1)).collect()))
    b = sorted(map(tuple, dedup.cdc_block_dedup(
        df.repartition(16)).collect()))
    assert a == b


def test_plan_lsh_bands_scurve_and_validation():
    """The planner picks the divisor pair whose S-curve inflection is
    closest to the target, with hand-checked values."""
    # k=16: (b,r) in {(1,16),(2,8),(4,4),(8,2),(16,1)}:
    # s* = (1/b)^(1/r) = 1.0, 0.917, 0.707, 0.354, 0.0625
    p = dedup.plan_lsh_bands(0.7, 16)
    assert (p["bands"], p["rows_per_band"]) == (4, 4)
    assert abs(p["s_star"] - 0.25 ** 0.25) < 1e-12
    # P(0.7) = 1 - (1 - 0.7^4)^4
    assert abs(p["p_candidate_at_threshold"]
               - (1 - (1 - 0.7 ** 4) ** 4)) < 1e-12
    # low threshold wants many bands
    lo = dedup.plan_lsh_bands(0.35, 16)
    assert (lo["bands"], lo["rows_per_band"]) == (8, 2)
    # high threshold wants long rows
    hi = dedup.plan_lsh_bands(0.9, 16)
    assert (hi["bands"], hi["rows_per_band"]) == (2, 8)
    import pytest as _pt
    with _pt.raises(ValueError):
        dedup.plan_lsh_bands(0.0, 16)
    with _pt.raises(ValueError):
        dedup.plan_lsh_bands(0.5, 1)


def test_edit_verify_banded_matches_unbanded(spark):
    """min_sim_e6 > 0 switches to the thresholded JVM levenshtein +
    length prefilter; the kept rows and their values must be identical
    to filtering the full unbanded distances."""
    from rag_document_parser_spark.operators.dedup import edit_verify_pairs

    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [(i, base[: 40 + (i * 7) % 60] + ("x" * (i % 9))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, j) for i in range(30) for j in range(i + 1, 30) if (i + j) % 3],
        "id_a long, id_b long")
    for m in (300_000, 700_000, 900_000, 999_999):
        full = {(r.id_a, r.id_b): (r.edit_dist, r.sim_e6)
                for r in edit_verify_pairs(docs, pairs).collect()
                if r.sim_e6 >= m}
        banded = {(r.id_a, r.id_b): (r.edit_dist, r.sim_e6)
                  for r in edit_verify_pairs(docs, pairs,
                                             min_sim_e6=m).collect()}
        assert banded == full, m


def test_hamming_near_pairs_generic_kernel(spark):
    """The generic banding kernel is complete for hamming <= k over any
    64-bit signature column (incl. sign-bit values) — brute force twin."""
    from rag_document_parser_spark.operators.dedup import hamming_near_pairs

    sigs = [0, 1, 3, 7, 15, (1 << 63) - 1, -1, -2, 1 << 40,
            (1 << 40) | 5, -9223372036854775808, -9223372036854775807]
    df = spark.createDataFrame(list(enumerate(sigs)), "id long, sig long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in hamming_near_pairs(df, max_hamming=3).collect()}
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin((sigs[i] ^ sigs[j]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want.add((i, j, h))
    assert got == want and want


# ---- semantic decontamination (embedding-space eval overlap) ------------

from rag_document_parser_spark.operators.similarity import (
    semantic_decontaminate,
)


def test_semantic_decontam_flags_eval_members_and_near(spark):
    import math
    # 8-dim unit-ish vectors: c0 IS the eval vector, c1 is a tiny
    # perturbation (cosine ~0.9997), c2 is orthogonal
    base = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    near = [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)]
    orth = [8.0, -7.0, 6.0, -5.0, 4.0, -3.0, 2.0, -1.0]
    corpus = spark.createDataFrame(
        [(0, base), (1, near), (2, orth)],
        ["vec_id", "embedding"])
    ev = spark.createDataFrame([(100, base)], ["vec_id", "embedding"])
    out = {r["id"]: r for r in
           semantic_decontaminate(corpus, ev, threshold=0.99).collect()}
    assert out[0]["contaminated"] and out[0]["max_cos_e6"] >= 999_999
    assert out[1]["contaminated"]           # paraphrase-grade near-dup
    assert not out[2]["contaminated"]
    # the orthogonal doc still appears with an explicit row
    assert out[2]["max_cos_e6"] < 500_000 or out[2]["n_candidates"] == 0


def test_semantic_decontam_zero_candidates_row(spark):
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"])
    ev = spark.createDataFrame([(9, [1.0, 0.0])], ["vec_id", "embedding"])
    out = {r["id"]: r for r in
           semantic_decontaminate(corpus, ev).collect()}
    assert len(out) == 2                    # every corpus id has a row
    assert out[0]["contaminated"]
    r1 = out[1]
    assert not r1["contaminated"]
    if r1["n_candidates"] == 0:
        assert r1["max_cos_e6"] == 0


def test_semantic_decontam_partition_invariance(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
            for i in range(40)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    ev = spark.createDataFrame(rows[:5], ["vec_id", "embedding"])
    a = sorted(map(tuple, semantic_decontaminate(corpus, ev).collect()))
    b = sorted(map(tuple, semantic_decontaminate(
        corpus.repartition(7), ev).collect()))
    assert a == b
