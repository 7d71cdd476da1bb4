"""Prefix-filtered similarity join (operators/prefixjoin.py): exact
equivalence to the full self-join answer set (the zero-false-negative
guarantee), candidate thinning, integer threshold boundaries, and
partition invariance."""

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.dedup import (
    ngram_jaccard_pairs, shingle_df)
from rag_document_parser_spark.operators.prefixjoin import (
    prefix_filter_pairs)


def _near_dup_corpus(spark, n=40):
    """Docs in near-dup families: family f has 4 members sharing a long
    base passage with per-member suffixes of varying length."""
    rows = []
    for i in range(n):
        fam, member = divmod(i, 4)
        base = " ".join(f"f{fam}w{j}" for j in range(30))
        extra = " ".join(f"m{i}x{j}" for j in range(3 * member))
        rows.append((i, f"{base} {extra}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _near_dup_corpus(spark)


@pytest.mark.parametrize("t_e6", [500_000, 700_000, 900_000])
def test_exact_equivalence_to_full_join(corpus, t_e6):
    """Same answer set as the full shingle self-join at every
    threshold — the prefix filter loses nothing."""
    pf = sorted((r["id_a"], r["id_b"], r["inter"], r["n_a"], r["n_b"])
                for r in prefix_filter_pairs(
                    corpus, threshold_e6=t_e6).collect())
    full = sorted((r["id_a"], r["id_b"], r["inter"], r["n_a"], r["n_b"])
                  for r in ngram_jaccard_pairs(
                      corpus, threshold=t_e6 / 1e6,
                      df_cap=10 ** 9).collect())
    assert pf == full
    assert pf  # non-vacuous: the families do produce pairs


def test_candidate_thinning(corpus):
    """The prefix stream the self-join reads is a strict subset of the
    full shingle stream — p = n - ceil(t*n) + 1 per doc."""
    t_e6 = 800_000
    sh = shingle_df(corpus, "text", "doc_id", 3, drop_empty=True)
    sizes = {r["id"]: r["n"] for r in
             sh.select("id", F.size("shingles").alias("n")).collect()}
    full_rows = sum(sizes.values())
    pre_rows = sum(n - (t_e6 * n + 999_999) // 1_000_000 + 1
                   for n in sizes.values())
    assert pre_rows < full_rows * 0.35


def test_threshold_boundary_exact(spark):
    """inter=2, n_a=n_b=3 -> jaccard = 2/4 = exactly 0.5: kept at
    t=0.5, dropped at t_e6=500_001 — integer cross-multiplication,
    no float rounding."""
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")],  # 3-shingles: 3 each, 2 shared
        "doc_id long, text string")
    at = prefix_filter_pairs(df, threshold_e6=500_000).collect()
    assert len(at) == 1 and at[0]["jaccard_e6"] == 500_000
    above = prefix_filter_pairs(df, threshold_e6=500_001).collect()
    assert not above


def test_partition_invariance(corpus):
    a = sorted(map(tuple, prefix_filter_pairs(
        corpus.repartition(1), threshold_e6=600_000).collect()))
    b = sorted(map(tuple, prefix_filter_pairs(
        corpus.repartition(7), threshold_e6=600_000).collect()))
    assert a == b
