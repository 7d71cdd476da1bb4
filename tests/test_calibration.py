"""Calibration + retention (operators/calibration.py) vs a
pure-Python twin: exact integer binning (score 10^6 lands in the top
bin), per-bin confidence/accuracy, bin-weighted ECE, the suffix-
cumulative retention identity, deterministic n_bins-row shape with
empty bins, and the plan shape (windows only over the bin frame)."""

import pytest

from pyspark.sql import functions as F

from rag_document_parser_spark.operators import calibration as C

ROWS = [
    # (score_e6, correct, weight) — crafted so bins 0,3,7 are empty
    (150_000, False, 10), (180_000, True, 20),      # bin 1
    (250_000, False, 30),                           # bin 2
    (450_000, True, 40), (499_999, False, 50),      # bin 4
    (500_000, True, 60),                            # bin 5
    (690_000, True, 70),                            # bin 6
    (810_000, True, 80), (880_000, False, 90),      # bin 8
    (950_000, True, 100), (1_000_000, True, 110),   # bin 9 (incl. max)
]


def _twin_bins(rows, n_bins=10):
    out = {}
    for s, c, w in rows:
        b = min(n_bins - 1, s * n_bins // 10**6)
        n, sc, pos, wt = out.get(b, (0, 0, 0, 0))
        out[b] = (n + 1, sc + s, pos + int(c), wt + w)
    return out


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(
        [(i, s, c, w) for i, (s, c, w) in enumerate(ROWS)],
        ["doc_id", "score_e6", "correct", "n_tokens"])


def test_reliability_bins_match_twin(spark, scored):
    twin = _twin_bins(ROWS)
    got = {r.bin: r for r in C.reliability_bins(scored).collect()}
    assert sorted(got) == list(range(10))  # all bins emit a row
    for b in range(10):
        r = got[b]
        if b not in twin:
            assert (r.n, r.conf_e6, r.acc_e6) == (0, None, None), b
            continue
        n, sc, pos, _ = twin[b]
        assert r.n == n
        assert r.conf_e6 == sc // n
        assert r.acc_e6 == pos * 10**6 // n
        assert r.gap_e6 == abs(sc // n - pos * 10**6 // n)
    assert got[9].n == 2  # score == 10^6 joins bin 9, no phantom bin


def test_ece_matches_twin(spark, scored):
    twin = _twin_bins(ROWS)
    gaps = {b: abs(sc // n - pos * 10**6 // n)
            for b, (n, sc, pos, _) in twin.items()}
    n_tot = sum(n for n, _, _, _ in twin.values())
    ece = sum(n * gaps[b] for b, (n, _, _, _) in twin.items()) // n_tot
    row = C.expected_calibration_error(scored).collect()[0]
    assert (row.n_docs, row.ece_e6, row.max_gap_e6) == \
        (n_tot, ece, max(gaps.values()))


def test_retention_curve_suffix_identity(spark, scored):
    got = {r.step: r for r in C.retention_curve(
        scored, weight_col="n_tokens").collect()}
    assert sorted(got) == list(range(10))
    for k in range(10):
        kept = [(s, w) for s, _, w in ROWS
                if min(9, s * 10 // 10**6) >= k]
        assert got[k].docs_kept == len(kept), k
        assert got[k].weight_kept == sum(w for _, w in kept), k
        assert got[k].docs_frac_e6 == \
            len(kept) * 10**6 // len(ROWS), k
    assert got[0].docs_frac_e6 == 1_000_000  # threshold 0 keeps all
    # monotone non-increasing retention
    assert all(got[k].docs_kept >= got[k + 1].docs_kept
               for k in range(9))


def test_windows_only_over_bin_frame(spark, scored):
    """The corpus-scale relation must reach a hash aggregate before
    any Window: the suffix-cumulative runs over the 10-row frame."""
    plan = C.retention_curve(scored, weight_col="n_tokens") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the plan prints root-first: the Window (a later stage) must sit
    # ABOVE the corpus HashAggregate it consumes, and the frame join
    # must broadcast the aggregated side, never sort-merge the corpus
    assert plan.index("Window") < plan.index("HashAggregate"), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---- exact ROC-AUC (Mann-Whitney with midranks) -------------------------

from rag_document_parser_spark.operators.calibration import roc_auc


def _py_auc(pairs):
    """Textbook twin: average over all (pos, neg) pairs of
    1[s+ > s-] + 0.5·1[s+ = s-], in e6 integer floor."""
    pos = [s for s, c in pairs if c]
    neg = [s for s, c in pairs if not c]
    if not pos or not neg:
        return None
    num = 0
    for p in pos:
        for n in neg:
            num += 2 if p > n else (1 if p == n else 0)
    return num * 10**6 // (2 * len(pos) * len(neg))


def test_auc_hand_cases(spark):
    cases = {
        "perfect": [(90, True), (80, True), (20, False), (10, False)],
        "inverted": [(10, True), (20, True), (80, False), (90, False)],
        "ties": [(50, True), (50, False), (50, True), (50, False)],
        "mixed": [(90, True), (60, False), (60, True), (30, False),
                  (10, True)],
    }
    for name, pairs in cases.items():
        df = spark.createDataFrame(pairs, "score_e6 long, correct boolean")
        r = roc_auc(df).collect()[0]
        assert r["auc_e6"] == _py_auc(pairs), name
    assert _py_auc(cases["perfect"]) == 1_000_000
    assert _py_auc(cases["inverted"]) == 0
    assert _py_auc(cases["ties"]) == 500_000


def test_auc_degenerate_single_class_null(spark):
    df = spark.createDataFrame([(10, True), (20, True)],
                               "score_e6 long, correct boolean")
    r = roc_auc(df).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_e6"]) == (2, 0, None)


def test_auc_randomized_matches_pairwise_twin(spark):
    import random
    rng = random.Random(13)
    pairs = [(rng.randint(0, 20), rng.random() < 0.5) for _ in range(80)]
    df = spark.createDataFrame(pairs, "score_e6 long, correct boolean")
    assert roc_auc(df.repartition(7)).collect()[0]["auc_e6"] == \
        _py_auc(pairs)


def test_brier_hand_values(spark):
    from rag_document_parser_spark.operators.calibration import (
        brier_score)
    rows = [(1_000_000, True), (0, False)]       # perfect: 0
    df = spark.createDataFrame(rows, "score_e6 long, correct boolean")
    assert brier_score(df).collect()[0]["brier_e6"] == 0
    rows = [(1_000_000, False), (0, True)]       # maximally wrong: 1e6
    df = spark.createDataFrame(rows, "score_e6 long, correct boolean")
    assert brier_score(df).collect()[0]["brier_e6"] == 1_000_000
    rows = [(500_000, True), (500_000, False)]   # hedged: 0.25
    df = spark.createDataFrame(rows, "score_e6 long, correct boolean")
    assert brier_score(df).collect()[0]["brier_e6"] == 250_000
