"""Classifier calibration + threshold retention planning: the
decision layer between a trained quality/language classifier
(``classify.py``, ``lm.py`` perplexity buckets) and the filter that
acts on its scores. Before a 100 TB run keeps or drops documents on a
confidence threshold, an operator needs to know (a) whether the
scores MEAN anything — reliability bins and expected calibration
error (Guo et al. 2017, "On Calibration of Modern Neural Networks",
the standard binned-ECE recipe) — and (b) what each candidate
threshold COSTS — the retention curve of docs and token mass kept.
The reference has no classifier tier (/root/reference/main.py:302-342
reports per-run success totals only).

All integer fixed point, e6 scores in [0, 10^6]; the binning
predicate is the exact integer form ``bin = least(n_bins−1,
score·n_bins div 10^6)`` so Spark and the DuckDB oracle agree
bit-for-bit (scores of exactly 10^6 land in the top bin, not a
phantom n-th bin).

Scale shape: one map-side-combined aggregate keyed on the bin id
(n_bins distinct values — uniform by construction after aggregation,
and the per-bin partial combine means the skew of the score
distribution never concentrates rows on a task), a static n_bins-row
frame join so empty bins still emit rows (deterministic output
shape), and windows ONLY over the n_bins-row frame. The corpus is
scanned once per curve; nothing corpus-scale ever sorts or windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["reliability_bins", "expected_calibration_error",
           "retention_curve",
           "brier_score", "roc_auc"]


def _binned(df: DataFrame, score_col: str, n_bins: int) -> DataFrame:
    return df.withColumn(
        "bin", F.expr(f"least({int(n_bins)} - 1, "
                      f"{score_col} * {int(n_bins)} div 1000000)")
        .cast("long"))


def _frame(df: DataFrame, n_bins: int) -> DataFrame:
    return (df.sparkSession.range(0, n_bins)
            .select(F.col("id").cast("long").alias("bin")))


def reliability_bins(df: DataFrame, score_col: str = "score_e6",
                     label_col: str = "correct",
                     n_bins: int = 10) -> DataFrame:
    """Per-confidence-bin reliability: ``(bin, n, conf_e6, acc_e6,
    gap_e6)`` — mean claimed confidence vs observed accuracy and the
    absolute gap, one row per bin 0..n_bins−1 (empty bins emit n=0
    with NULL conf/acc/gap). A calibrated scorer shows conf ≈ acc in
    every populated bin."""
    agg = (_binned(df, score_col, n_bins)
           .groupBy("bin")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum(score_col).cast("long").alias("_sc"),
                F.sum(F.col(label_col).cast("long")).cast("long")
                .alias("_pos")))
    return (_frame(df, n_bins).join(F.broadcast(agg), "bin", "left")
            .select("bin",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"),
                    F.expr("_sc div nullif(n, 0)").cast("long")
                    .alias("conf_e6"),
                    F.expr("_pos * 1000000 div nullif(n, 0)")
                    .cast("long").alias("acc_e6"),
                    F.expr("abs(_sc div nullif(n, 0) "
                           "- _pos * 1000000 div nullif(n, 0))")
                    .cast("long").alias("gap_e6")))


def expected_calibration_error(df: DataFrame,
                               score_col: str = "score_e6",
                               label_col: str = "correct",
                               n_bins: int = 10) -> DataFrame:
    """One row: ``(n_docs, ece_e6, max_gap_e6)`` — the bin-weighted
    mean and max |confidence − accuracy| over the reliability bins
    (empty bins carry zero weight by construction)."""
    bins = reliability_bins(df, score_col, label_col, n_bins)
    return (bins.where(F.col("n") > 0)
            .agg(F.sum("n").cast("long").alias("n_docs"),
                 F.expr("sum(n * gap_e6) div sum(n)").cast("long")
                 .alias("ece_e6"),
                 F.max("gap_e6").cast("long").alias("max_gap_e6")))


def retention_curve(df: DataFrame, score_col: str = "score_e6",
                    weight_col: str | None = None,
                    n_steps: int = 10) -> DataFrame:
    """What each threshold keeps: ``(step, threshold_e6, docs_kept,
    docs_frac_e6[, weight_kept, weight_frac_e6])`` for steps
    0..n_steps−1, where step k retains exactly the rows whose bin
    ``score·n_steps div 10^6`` is ≥ k (the integer form of score ≥
    k/n_steps; ``threshold_e6 = k·10^6 div n_steps`` is reported for
    reading). Retention is the suffix-cumulative of the per-bin
    masses — one corpus aggregate, one n_steps-row window."""
    aggs = [F.count("*").cast("long").alias("_d")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("long").alias("_w"))
    agg = _binned(df, score_col, n_steps).groupBy("bin").agg(*aggs)
    full = _frame(df, n_steps).join(F.broadcast(agg), "bin", "left")
    w = (Window.orderBy(F.col("bin").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = (Window.orderBy(F.col("bin").desc())
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    staged = full.select(
        F.col("bin").alias("step"),
        F.sum(F.coalesce("_d", F.lit(0))).over(w).cast("long")
        .alias("_dk"),
        F.sum(F.coalesce("_d", F.lit(0))).over(wall).cast("long")
        .alias("_dt"),
        *([F.sum(F.coalesce("_w", F.lit(0))).over(w).cast("long")
           .alias("_wk"),
           F.sum(F.coalesce("_w", F.lit(0))).over(wall).cast("long")
           .alias("_wt")] if weight_col is not None else []))
    return staged.select(
        "step",
        F.expr(f"step * 1000000 div {int(n_steps)}").cast("long")
        .alias("threshold_e6"),
        F.col("_dk").alias("docs_kept"),
        F.expr("_dk * 1000000 div nullif(_dt, 0)").cast("long")
        .alias("docs_frac_e6"),
        *([F.col("_wk").alias("weight_kept"),
           F.expr("_wk * 1000000 div nullif(_wt, 0)").cast("long")
           .alias("weight_frac_e6")]
          if weight_col is not None else []))


def roc_auc(df: DataFrame, score_col: str = "score_e6",
            label_col: str = "correct") -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank statistic with midrank
    tie handling (Hanley & McNeil 1982: AUC = P(s⁺ > s⁻) + ½P(s⁺ =
    s⁻)) — the threshold-free discrimination number next to ECE's
    calibration number. One row: ``(n_pos, n_neg, auc_e6)``.

    Integer-exact: the score column compacts to one row per DISTINCT
    value (the ``length_quantiles`` discipline — the window runs over
    |score classes| rows, never the corpus); each class carries
    ``r2 = 2·midrank = 2·cum_before + class_size + 1``, and

        auc_e6 = (Σ n_pos(s)·r2(s) − n_pos·(n_pos+1)) · 1e6
                 div (2 · n_pos · n_neg)

    with the numerator widened to decimal(38,0) (Σ n_pos·r2 ≤ 2n², so
    the e6-scaled product would pass BIGINT near n ≈ 2·10⁶). A
    single-class input (no positives or no negatives) reports NULL
    auc — there is no ranking to score, documented over hidden.
    """
    d = (df.groupBy(F.col(score_col).alias("_s"))
         .agg(F.sum(F.col(label_col).cast("long")).alias("_np"),
              F.sum((~F.col(label_col)).cast("long")).alias("_nn"),
              F.count("*").cast("long").alias("_t")))
    w = (Window.orderBy(F.col("_s").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = d.select(
        "_np", "_nn", "_t",
        (F.sum("_t").over(w) - F.col("_t")).alias("_cb"))
    agg = ranked.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.sum(F.expr("_np * (2 * _cb + _t + 1)")).cast("long")
        .alias("_s2"))
    return agg.select(
        "n_pos", "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.expr("cast((cast(_s2 as decimal(38,0))"
                      " - cast(n_pos as decimal(38,0)) * (n_pos + 1))"
                      " * 1000000"
                      " div (cast(n_pos as decimal(38,0)) * 2 * n_neg)"
                      " as bigint)"))
        .alias("auc_e6"))


def brier_score(df: DataFrame, score_col: str = "score_e6",
                label_col: str = "correct") -> DataFrame:
    """Exact Brier score (Brier 1950): the mean squared gap between
    the claimed probability and the 0/1 outcome — the proper scoring
    rule beside ECE's binned gaps and AUC's ranking. One row:
    ``(n_items, brier_e6)`` with ``brier_e6 = Σ(s − l)² div (n·1e6)``
    over e6-scaled scores and labels (0 = perfectly sharp and right,
    1e6 = confidently wrong everywhere). Squared e6 terms widen to
    decimal(38,0) — exact past 10¹² items. Empty input yields NULL.
    """
    d = df.select(
        (F.col(score_col).cast("long")
         - F.col(label_col).cast("long") * 1_000_000).alias("_g"))
    return (d.agg(F.count("*").cast("long").alias("n_items"),
                  F.sum(F.expr("cast(_g as decimal(38,0)) * _g"))
                  .alias("_s"))
            .select("n_items",
                    F.when(F.col("n_items") > 0, F.expr(
                        "cast(_s div (cast(n_items as decimal(38,0))"
                        " * 1000000) as bigint)"))
                    .alias("brier_e6")))
