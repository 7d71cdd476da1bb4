"""VERDICT r4 task #7: adversarial skew for the banded dedup joins.

Plant one hot key carrying >=50% of rows and verify the over-cap
valves keep the join work bounded: the blacklist/cap must eat the hot
key BEFORE the self-join (behavioral assertions), and the capped run
on the skewed corpus must stay within a small factor of the clean-
corpus baseline (timing-shape — generous bound, two full JVM-warm
runs of the same size).
"""
from __future__ import annotations

import time

from pyspark.sql import functions as F

from rag_document_parser_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

BOILER = ("this exact boilerplate footer sentence appears verbatim on "
          "more than half of all synthesized pages today")


def _corpus(spark, n_docs, hot_every=2, with_boiler=True):
    """n_docs docs of unique prose; every ``hot_every``-th doc carries
    the shared boilerplate (the planted hot shingles)."""
    uniq = F.concat(
        F.lit("unique document body number "), F.col("id").cast("string"),
        F.lit(" discussing topic "), (F.col("id") * 7 % 997).cast("string"),
        F.lit(" with enough distinct words "),
        (F.col("id") * 13 % 991).cast("string"),
        F.lit(" to shingle independently"))
    text = (F.when((F.col("id") % hot_every == 0) & F.lit(with_boiler),
                   F.concat(uniq, F.lit(" " + BOILER)))
            .otherwise(uniq))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text"))


def test_ngram_jaccard_blacklist_eats_the_hot_shingle(spark):
    """50% of docs share a boilerplate sentence; with df_cap below the
    hot shingle's document frequency the blacklist must drop it before
    the self-join: unique docs then share nothing, so no pairs — and a
    genuine near-dup pair (clones WITHOUT the hot shingles) survives."""
    n = 1200
    skewed = _corpus(spark, n)
    # a genuine duplicate pair, no boilerplate, odd ids (no hot key)
    dup = spark.createDataFrame(
        [(2_000_001, "completely separate near duplicate pair text about "
                     "glacier meltwater chemistry and isotope ratios"),
         (2_000_003, "completely separate near duplicate pair text about "
                     "glacier meltwater chemistry and isotope ratios")],
        ["doc_id", "text"])
    got = ngram_jaccard_pairs(skewed.unionByName(dup),
                              df_cap=100, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(2_000_001, 2_000_003)]


def test_ngram_jaccard_capped_skew_stays_near_clean_baseline(spark):
    """Timing-shape: the capped run over the 50%-hot-key corpus must
    not degrade to the quadratic join the blacklist exists to prevent.
    Bound is deliberately generous (3x + fixed slack) — both runs are
    same-size same-session; only a hot-key blowup can break it."""
    n = 1200
    clean = _corpus(spark, n, with_boiler=False)
    skewed = _corpus(spark, n)
    # warm the JVM/codegen on a throwaway run
    ngram_jaccard_pairs(_corpus(spark, 100), df_cap=100).count()
    t0 = time.time()
    assert ngram_jaccard_pairs(clean, df_cap=100).count() == 0
    base = time.time() - t0
    t0 = time.time()
    assert ngram_jaccard_pairs(skewed, df_cap=100).count() == 0
    hot = time.time() - t0
    assert hot <= 3 * base + 5.0, (
        f"skewed capped run {hot:.1f}s vs clean baseline {base:.1f}s — "
        "the over-cap blacklist is no longer bounding the hot shingle")


def test_minhash_bucket_cap_bounds_the_mega_group(spark):
    """600 EXACT copies of one text put 600 rows under every one of
    their 8 (band, band_sig) keys — 600^2/2 * 8 join rows uncapped.
    With bucket_cap the mega-buckets drop (the exact-dup tier upstream
    owns identical text), while a small dup group below the cap keeps
    all its pairs."""
    mega = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.lit("the one mega duplicated boilerplate page body that "
              "appears on half the crawl with identical shingles "
              "everywhere").alias("text"))
    uniq = _corpus(spark, 600, with_boiler=False).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text")
    small_dup = spark.createDataFrame(
        [(30_001, "a small duplicate family text on riverbank sediment "
                  "transport and meander formation dynamics"),
         (30_002, "a small duplicate family text on riverbank sediment "
                  "transport and meander formation dynamics"),
         (30_003, "a small duplicate family text on riverbank sediment "
                  "transport and meander formation dynamics")],
        ["doc_id", "text"])
    corpus = mega.unionByName(uniq).unionByName(small_dup)

    capped = minhash_lsh_pairs(corpus, bucket_cap=50).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    # the small family's 3 pairs all present; no mega-group pair leaked
    assert {(30_001, 30_002), (30_001, 30_003), (30_002, 30_003)} <= got
    assert not any(a < 600 and b < 600 for a, b in got)
    # and the capped candidate count is bounded far below the
    # uncapped quadratic 600*599/2 = 179,700 mega pairs
    assert len(got) < 1000

    # default (no cap) semantics unchanged: mega pairs ARE emitted
    assert minhash_lsh_pairs(
        small_dup, bucket_cap=None).count() == 3
