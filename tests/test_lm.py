"""Bigram LM likelihood scoring (`operators.lm`): fixed-point
conditional probabilities, hand-checked counts, partition invariance.
"""

from __future__ import annotations

import pytest

from rag_document_parser_spark.operators.lm import (
    score_bigram_lm,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "a b c"), ("d3", "x")],
        ["doc_id", "text"])


def test_lm_table_counts(corpus):
    lm = {r["bigram"]: r["cond_e"]
          for r in train_bigram_lm(corpus, scale=1000).collect()}
    # unigram occurrences: a=3 b=3 c=1 x=1
    # bigram occurrences: 'a b'=3 'b a'=1 'b c'=1
    assert lm == {"a b": 3 * 1000 // 3,
                  "b a": 1 * 1000 // 3,
                  "b c": 1 * 1000 // 3}


def test_scores_integer_mean(corpus):
    lm = train_bigram_lm(corpus, scale=1000)
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
           for r in score_bigram_lm(corpus, lm).collect()}
    assert out["d1"] == (3, (1000 + 333 + 1000) // 3)
    assert out["d2"] == (2, (1000 + 333) // 2)
    assert out["d3"] == (0, 0)        # <2 tokens: no bigrams, floor score


def test_min_count_prunes_hapax(corpus):
    lm = train_bigram_lm(corpus, scale=1000, min_count=2)
    assert {r["bigram"] for r in lm.collect()} == {"a b"}
    out = {r["doc_id"]: r["lm_score"]
           for r in score_bigram_lm(corpus, lm).collect()}
    assert out["d1"] == (1000 + 0 + 1000) // 3
    assert out["d2"] == 1000 // 2


def test_partition_invariance(corpus):
    lm = train_bigram_lm(corpus)
    a = sorted(map(tuple, score_bigram_lm(corpus, lm).collect()))
    b = sorted(map(tuple, score_bigram_lm(
        corpus.repartition(5), lm, broadcast_lm=False).collect()))
    assert a == b


def test_cross_corpus_scoring(spark, corpus):
    """Score one corpus against an LM trained on another (the CCNet
    pattern: trusted reference LM, web corpus scored)."""
    web = spark.createDataFrame(
        [("w1", "a b a b a b"), ("w2", "q r s")], ["doc_id", "text"])
    lm = train_bigram_lm(corpus, scale=1000)
    out = {r["doc_id"]: r["lm_score"]
           for r in score_bigram_lm(web, lm).collect()}
    assert out["w1"] > 0        # in-domain: high fit
    assert out["w2"] == 0       # out-of-domain: every bigram unseen


def test_plans_tokenize_once_per_scan(corpus):
    def evals(df):
        return df._jdf.queryExecution().optimizedPlan().toString() \
            .count("split(lower(")

    lm = train_bigram_lm(corpus)
    assert evals(lm) == 2                       # unigram + bigram scans
    assert evals(score_bigram_lm(corpus, lm)) == 3   # + the doc scan


# ---- DSIR importance resampling (Xie et al. 2023) ----------------------

from rag_document_parser_spark.operators.lm import dsir_select, dsir_weights


@pytest.fixture(scope="module")
def domains(spark):
    # target domain talks about cats; off-domain talks about stocks
    docs = spark.createDataFrame(
        [("c1", "the cat sat on the mat"),
         ("c2", "the cat ate the fish"),
         ("s1", "the stock price went up"),
         ("s2", "the stock market crashed today"),
         ("mix", "the cat bought the stock")],
        ["doc_id", "text"])
    target = spark.createDataFrame(
        [("t1", "the cat sat on the mat"),
         ("t2", "a cat and the fish")],
        ["doc_id", "text"])
    return docs, target


def test_dsir_weights_rank_target_domain_first(domains):
    docs, target = domains
    w = {r["doc_id"]: r["weight"]
         for r in dsir_weights(docs, target).collect()}
    assert len(w) == 5
    # every cat doc outranks every stock doc under the cat-domain LM
    assert min(w["c1"], w["c2"]) > max(w["s1"], w["s2"])


def test_dsir_weights_consistency(domains):
    docs, target = domains
    rows = dsir_weights(docs, target).collect()
    for r in rows:
        assert r["weight"] == r["target_score"] - r["raw_score"]
        assert r["n_bigrams"] >= 0


def test_dsir_select_topk_deterministic(domains):
    docs, target = domains
    top2 = [r["doc_id"] for r in dsir_select(docs, target, k=2).collect()]
    assert set(top2) <= {"c1", "c2"}
    again = [r["doc_id"] for r in dsir_select(docs, target, k=2).collect()]
    assert top2 == again


# ---- CCNet perplexity bucketing (Wenzek et al. 2020 §4.3) ---------------

from rag_document_parser_spark.operators.lm import perplexity_buckets


def _python_buckets(scored, head_pct=30, mid_pct=30):
    """Pure-Python twin of the value-threshold rule."""
    n = len(scored)
    from collections import Counter
    dist = Counter(s for _, s in scored)
    cum, t_head, t_mid = 0, None, None
    for s in sorted(dist, reverse=True):
        cum += dist[s]
        if 100 * cum <= head_pct * n:
            t_head = s      # keep overwriting: ends at the SMALLEST
            # qualifying score (the descending prefix property)
        if 100 * cum <= (head_pct + mid_pct) * n:
            t_mid = s
    out = {}
    for d, s in scored:
        if t_head is not None and s >= t_head:
            out[d] = "head"
        elif t_mid is not None and s >= t_mid:
            out[d] = "middle"
        else:
            out[d] = "tail"
    return out


@pytest.fixture(scope="module")
def varied(spark):
    # graded fit: doc i repeats the common phrase i times and pads with
    # unique noise, so self-LM scores vary monotonically
    rows = [(f"v{i:02d}",
             " ".join(["the cat sat on the mat"] * (i + 1))
             + f" unique{i} filler{i} noise{i}")
            for i in range(10)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_perplexity_buckets_invariants(varied):
    out = perplexity_buckets(varied).collect()
    assert len(out) == 10
    by = {}
    for r in out:
        by.setdefault(r["bucket"], []).append(r["lm_score"])
    assert set(by) <= {"head", "middle", "tail"}
    # percentile budgets are never exceeded (ties only undershoot)
    assert len(by.get("head", [])) <= 3
    assert len(by.get("head", [])) + len(by.get("middle", [])) <= 6
    # score ordering: head >= middle >= tail pointwise across buckets
    if by.get("head") and by.get("middle"):
        assert min(by["head"]) >= max(by["middle"])
    if by.get("middle") and by.get("tail"):
        assert min(by["middle"]) > max(by["tail"])


def test_perplexity_buckets_match_python_twin(varied):
    from rag_document_parser_spark.operators.lm import (
        score_bigram_lm, train_bigram_lm)
    lm = train_bigram_lm(varied)
    scored = [(r["doc_id"], r["lm_score"])
              for r in score_bigram_lm(varied, lm).collect()]
    expect = _python_buckets(scored)
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(varied).collect()}
    assert got == expect


def test_perplexity_buckets_degenerate_all_tail(spark):
    # every doc identical -> one score class covering 100% -> no
    # threshold qualifies -> everything lands in tail (documented)
    rows = [(f"e{i}", "same words every time") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = perplexity_buckets(df).collect()
    assert {r["bucket"] for r in out} == {"tail"}


# ---- Kneser-Ney smoothing (Kneser & Ney 1995; Chen & Goodman 1998) ------

from rag_document_parser_spark.operators.lm import (
    score_kn_bigram_lm,
    train_kn_bigram_lm,
)


def test_kn_table_hand_checked(corpus):
    """Every fixed-point part recomputed by hand (scale=1000, D=3/4).

    bc: 'a b'=3 'b a'=1 'b c'=1; c(a .)=3, c(b .)=2; N1+(a .)=1,
    N1+(b .)=2; N1+(. a)=N1+(. b)=N1+(. c)=1; N1+(. .)=3.
    """
    rows = {r["bigram"]: r for r in
            train_kn_bigram_lm(corpus, scale=1000).collect()}
    assert rows["a b"]["disc_e"] == (4 * 3 - 3) * 1000 // (4 * 3)   # 750
    assert rows["b a"]["disc_e"] == (4 * 1 - 3) * 1000 // (4 * 2)   # 125
    assert rows["a b"]["lambda_e"] == 3 * 1 * 1000 // (4 * 3)       # 250
    assert rows["b a"]["lambda_e"] == 3 * 2 * 1000 // (4 * 2)       # 750
    assert rows["a b"]["cont_e"] == 1 * 1000 // 3                   # 333
    assert rows["a b"]["p_kn_e"] == 750 + 250 * 333 // 1000         # 833
    assert rows["b a"]["p_kn_e"] == 125 + 750 * 333 // 1000         # 374
    assert rows["b c"]["p_kn_e"] == rows["b a"]["p_kn_e"]


def test_kn_scores_integer_mean(corpus):
    out = {r["doc_id"]: (r["n_bigrams"], r["kn_score"])
           for r in score_kn_bigram_lm(corpus, scale=1000).collect()}
    assert out["d1"] == (3, (833 + 374 + 833) // 3)
    assert out["d2"] == (2, (833 + 374) // 2)
    assert out["d3"] == (0, 0)


def test_kn_backoff_keeps_mass_for_unseen_bigrams(spark, corpus):
    """'b b' is an UNSEEN bigram of two SEEN words: the unsmoothed LM
    scores it 0, KN keeps lambda(b)*P_cont(b). Fully-novel words still
    floor at 0."""
    web = spark.createDataFrame(
        [("w1", "b b"), ("w2", "q r")], ["doc_id", "text"])
    out = {r["doc_id"]: r["kn_score"]
           for r in score_kn_bigram_lm(web, corpus, scale=1000).collect()}
    assert out["w1"] == 750 * 333 // 1000      # backoff mass, not 0
    assert out["w2"] == 0
    unsmoothed = {r["doc_id"]: r["lm_score"] for r in score_bigram_lm(
        web, train_bigram_lm(corpus, scale=1000)).collect()}
    assert unsmoothed["w1"] == 0               # the gap KN closes


def test_kn_min_count_prunes_discount_not_backoff(corpus):
    """Pruned bigrams lose their discount leg but keep backoff — and
    the KN statistics stay computed over the UNPRUNED counts."""
    lm = {r["bigram"]: r for r in
          train_kn_bigram_lm(corpus, scale=1000, min_count=2).collect()}
    assert set(lm) == {"a b"}
    assert lm["a b"]["lambda_e"] == 250        # stats unchanged by pruning
    out = {r["doc_id"]: r["kn_score"]
           for r in score_kn_bigram_lm(corpus, scale=1000,
                                       min_count=2).collect()}
    # d2: 'a b' seen (833); 'b c' pruned -> backoff only (249)
    assert out["d2"] == (833 + 750 * 333 // 1000) // 2


def test_kn_partition_invariance(corpus):
    a = sorted(map(tuple, score_kn_bigram_lm(corpus).collect()))
    b = sorted(map(tuple, score_kn_bigram_lm(
        corpus.repartition(5), broadcast_lm=False).collect()))
    assert a == b


# ---- Jelinek-Mercer deleted interpolation (EM lambda) -------------------

from rag_document_parser_spark.operators.lm import fit_jm_lambda


def test_jm_lambda_prefers_bigram_on_repetitive_data(spark):
    """A corpus whose bigrams repeat verbatim gives the bigram model
    all the held-out mass: lambda climbs above its 0.5 start."""
    train = spark.createDataFrame(
        [("t1", "the cat sat on the mat"),
         ("t2", "the cat sat on the mat again")], ["doc_id", "text"])
    held = spark.createDataFrame(
        [("h1", "the cat sat on the mat")], ["doc_id", "text"])
    rows = {r["round"]: r for r in
            fit_jm_lambda(train, held, rounds=3).collect()}
    assert rows[1]["n_scored"] == 5
    assert rows[1]["lambda_e6"] > 500_000
    assert rows[3]["lambda_e6"] >= rows[1]["lambda_e6"]   # EM monotone here


def test_jm_lambda_prefers_unigram_on_novel_pairs(spark):
    """Held-out bigrams unseen in training (words known, pairs not):
    the unigram component takes the mass and lambda falls."""
    train = spark.createDataFrame(
        [("t1", "alpha beta gamma delta")], ["doc_id", "text"])
    held = spark.createDataFrame(
        [("h1", "delta alpha gamma beta")], ["doc_id", "text"])
    rows = {r["round"]: r["lambda_e6"] for r in
            fit_jm_lambda(train, held, rounds=2).collect()}
    assert rows[1] < 500_000 and rows[2] <= rows[1]


def test_jm_lambda_empty_heldout(spark):
    train = spark.createDataFrame([("t1", "a b c")], ["doc_id", "text"])
    held = spark.createDataFrame([("h1", "")], ["doc_id", "text"])
    rows = fit_jm_lambda(train, held, rounds=2).collect()
    assert [(r["round"], r["lambda_e6"], r["n_scored"])
            for r in sorted(rows)] == [(1, 500_000, 0), (2, 500_000, 0)]
