"""Supervised class-profile text classification (fixed-point).

The labeled-data leg of the quality tier: train per-label token
profiles from a labeled reference set (language labels, quality
verdicts, domain buckets), then assign every corpus document the
best-fitting label by PER-TERM LABEL-SHARE VOTING: each model term
distributes ``scale`` mass among the labels proportional to its
class-conditional frequency, and a document's label score sums the
shares of its token occurrences. Terms spread evenly across classes
vote ~uniformly (they cancel in the argmax); distinctive terms vote
nearly all their mass — the fixed-point analog of Naive Bayes's
log-likelihood-ratio emphasis on discriminative terms, without the
non-portable ``ln`` (libm and DuckDB differ in the last bit; integer
``div`` does not — the same substitution ``lm.score_bigram_lm``
documents). A plain class-conditional frequency SUM was measured to
drown rare-but-distinctive terms under shared-filler noise (planted
two-token markers: sum rule ~30% accuracy, share voting 100%).

Scale shape mirrors ``lm.py``: training is two map-side-combinable
aggregates over the labeled set (which is a sample — thousands to
millions of rows, not the corpus); the model is |labels|×|vocab| rows,
hapax-pruned and BROADCAST, so classification is one scan-local join
plus one groupBy on (doc, label) that partial-aggregates inside each
task. The corpus never shuffles on the Zipf-skewed term key.

No reference analog — scale-path training-data operator per SURVEY.md,
same status as the sampling/LM tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from rag_document_parser_spark.operators.dedup import words

__all__ = ["classify", "train_class_profiles"]


def train_class_profiles(labeled: DataFrame, label_col: str = "lang",
                         text_col: str = "text", scale: int = 1_000_000,
                         min_count: int = 2) -> DataFrame:
    """Model table ``(label, term, freq_e, share_e)`` from a labeled
    corpus: ``freq_e = count(term in label) * scale div tokens(label)``
    is the fixed-point class-conditional unigram frequency, and
    ``share_e = freq_e * scale div Σ_labels freq_e`` is the term's vote
    share for the label (the scoring weight). ``min_count`` prunes
    terms seen fewer times within a label (keeps the broadcast model
    vocabulary-bounded).

    Shapes: two map-side-combinable aggregates plus a per-term share
    normalization — the share groupBy keys on the term over the
    ALREADY-AGGREGATED (label, term) table, so a stopword costs
    |labels| rows there, never a posting list."""
    staged = labeled.select(F.col(label_col).alias("label"),
                            words(F.col(text_col)).alias("_t"))
    flat = (staged.select("label", F.explode_outer("_t").alias("term"))
            .where(F.col("term").isNotNull()))
    per = (flat.groupBy("label", "term").agg(F.count("*").alias("tc"))
           .where(F.col("tc") >= min_count))
    mass = flat.groupBy("label").agg(F.count("*").alias("lc"))
    # label-mass side is |labels| rows — broadcast, never shuffle on it
    freq = (per.join(F.broadcast(mass), "label")
            .select("label", "term",
                    F.expr(f"tc * {int(scale)} div lc").alias("freq_e"))
            # drop fixed-point-underflowed rows (tc*scale < lc — labels
            # with token mass > tc*scale): they would vote 0 anyway, and
            # keeping them lets a term whose EVERY label leg underflows
            # reach the share division with _tot = 0 (NULL share in
            # Spark, a hard error in the DuckDB oracle). Survivors
            # guarantee _tot >= 1.
            .where(F.col("freq_e") > 0))
    tot = freq.groupBy("term").agg(F.sum("freq_e").alias("_tot"))
    return (freq.join(tot, "term")
            .select("label", "term", "freq_e",
                    F.expr(f"freq_e * {int(scale)} div _tot")
                    .alias("share_e")))


def classify(df: DataFrame, model: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             broadcast_model: bool = True) -> DataFrame:
    """Best-fitting label per document: ``(doc_id, label_pred,
    n_tokens, score_e6)`` where the per-label score sums ``share_e``
    over the doc's token OCCURRENCES (out-of-vocabulary terms
    contribute 0 to every label) and ``score_e6 = sum div n_tokens``
    reports the winning label's mean vote. Ties break lexically on the
    label; docs whose tokens match no model term at all (or empty
    docs) get label_pred NULL with score 0.

    ``broadcast_model=False`` degrades to a shuffle join on the term
    key for models beyond executor memory — keep AQE skew-join on
    there (the term key is Zipf-skewed).
    """
    staged = df.select(F.col(id_col), words(F.col(text_col)).alias("_t"))
    ex = staged.select(
        F.col(id_col), F.size("_t").alias("_n"),
        F.explode_outer("_t").alias("term"))
    side = F.broadcast(model) if broadcast_model else model
    # inner join: terms outside the model vocabulary contribute 0 to
    # every label, so dropping them cannot change the argmax
    hits = ex.where(F.col("term").isNotNull()).join(side, "term")
    per_label = (hits.groupBy(id_col, "label")
                 .agg(F.max("_n").alias("_n"),
                      F.sum("share_e").alias("_s")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_s").desc(), F.col("label").asc())
    best = (per_label.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select(F.col(id_col), F.col("label").alias("label_pred"),
                    F.col("_n").cast("long").alias("n_tokens"),
                    F.when(F.col("_n") > 0, F.expr("_s div _n"))
                    .otherwise(F.lit(0)).cast("long").alias("score_e6")))
    # docs with no model-vocabulary hits still emit a row
    alldocs = staged.select(F.col(id_col),
                            F.size("_t").cast("long").alias("_an"))
    return (alldocs.join(best, id_col, "left")
            .select(id_col,
                    "label_pred",
                    F.coalesce("n_tokens", F.col("_an")).alias("n_tokens"),
                    F.coalesce("score_e6", F.lit(0).cast("long"))
                    .alias("score_e6")))
