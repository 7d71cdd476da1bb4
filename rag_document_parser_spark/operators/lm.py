"""Corpus-trained bigram language-model likelihood scoring.

The CCNet/RefinedWeb quality recipe scores each document against a
language model trained on trusted text and drops the tail (gibberish,
boilerplate soup, OCR noise score far from in-domain text). This module
is that filter re-expressed as pure DataFrame algebra:

- ``train``: unigram + bigram counts over a reference corpus — two
  ``groupBy`` aggregates, map-side combinable, skew-immune (the same
  shape this repo uses for paragraph and shingle document frequencies;
  a stop-bigram partial-aggregates inside every task).
- ``score``: each document's bigram occurrences join the LM table and
  average the scaled conditional probabilities.

All arithmetic is INTEGER (``div``, never float): the per-bigram score
is ``count(w1 w2) * scale div count(w1)`` — a fixed-point conditional
probability — and the doc score is the integer mean over its bigram
occurrences. log-likelihoods would be the textbook form, but ``ln`` is
not bitwise-portable across engines (libm vs DuckDB last-bit rounding),
and a monotone fixed-point mean ranks documents identically for
threshold purposes while letting the DuckDB oracle reproduce every
score exactly.

At 100 TB: the LM table is vocabulary-sized (≪ corpus); the doc-bigram
join shuffles on the bigram key, which is Zipf-skewed — AQE skew-join
splits the hot keys, and ``min_count`` prunes the hapax tail of the LM
table before the join. Training on a 1% ``hash_sample`` of the corpus
(the CCNet pattern) bounds LM size independently of corpus size.

No reference analog — scale-path training-data operator per SURVEY.md,
same status as the sampling/repetition tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words


def _bigrams(toks) -> "F.Column":
    """Adjacent token pairs joined by one space (occurrence list).

    ``toks`` MUST be a bound attribute (a staged column, not the
    ``words()`` expression tree): the tokenizer inside this per-element
    lambda would otherwise re-run once per bigram — the O(n·grams)
    re-evaluation ``dedup.shingle_df`` exists to prevent.
    """
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                               F.element_at(toks, i + 1))),
    ).otherwise(F.expr("cast(array() as array<string>)"))


def _staged_tokens(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """Stage the tokenizer ONCE behind a generator-safe projection."""
    return df.select(*keep, words(F.col(text_col)).alias("_t"))


def train_bigram_lm(reference: DataFrame, text_col: str = "text",
                    scale: int = 1_000_000,
                    min_count: int = 1) -> DataFrame:
    """LM table ``(bigram, cond_e)`` from a reference corpus:
    ``cond_e = count(w1 w2) * scale div count(w1)`` — the fixed-point
    conditional probability P(w2|w1). ``min_count`` drops bigrams seen
    fewer times (hapax pruning keeps the table broadcastable)."""
    staged = _staged_tokens(reference, text_col)
    # explode_outer + null filter (not plain explode): keeps
    # InferFiltersFromGenerate from re-inlining the tokenizer into a
    # pushed-down size() scan filter
    uni = (staged.select(F.explode_outer("_t").alias("w1"))
           .where(F.col("w1").isNotNull())
           .groupBy("w1").agg(F.count("*").alias("uc")))
    bi = (staged.select(
              F.explode_outer(_bigrams(F.col("_t"))).alias("bigram"))
          .where(F.col("bigram").isNotNull())
          .groupBy("bigram").agg(F.count("*").alias("bc"))
          .where(F.col("bc") >= min_count))
    # broadcast the unigram side: it is vocabulary-sized (≪ the bigram
    # table), and a shuffle join here would key on Zipf-skewed w1
    return (bi.withColumn("w1", F.split_part("bigram", F.lit(" "), F.lit(1)))
            .join(F.broadcast(uni), "w1")
            .select("bigram",
                    F.expr(f"bc * {int(scale)} div uc").alias("cond_e")))


def score_bigram_lm(df: DataFrame, lm: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    broadcast_lm: bool = True) -> DataFrame:
    """Per-doc LM fit: ``(id_col, n_bigrams, lm_score)`` where
    ``lm_score`` is the integer mean of ``cond_e`` over the doc's
    bigram OCCURRENCES (unseen bigrams score 0, the unsmoothed floor);
    docs with fewer than two tokens score 0 over 0 bigrams.

    ``broadcast_lm=False`` drops the hint when the LM exceeds executor
    memory (untrimmed web vocabulary) and degrades to a shuffle join on
    the bigram key — Zipf-skewed, so keep AQE skew-join on there.
    """
    ex = _staged_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.posexplode_outer(_bigrams(F.col("_t"))).alias("_pos", "bigram"))
    side = F.broadcast(lm) if broadcast_lm else lm
    joined = ex.join(side, "bigram", "left")
    return (joined.groupBy(id_col)
            .agg(F.count("bigram").alias("n_bigrams"),
                 F.sum(F.coalesce("cond_e", F.lit(0))).alias("_s"))
            .select(id_col, "n_bigrams",
                    F.when(F.col("n_bigrams") > 0,
                           F.expr("_s div n_bigrams"))
                    .otherwise(F.lit(0)).cast("long").alias("lm_score")))


def dsir_weights(df: DataFrame, target: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", scale: int = 1_000_000,
                 min_count: int = 1,
                 broadcast_lm: bool = True) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): every document of
    ``df`` is scored against an LM trained on the TARGET domain and an
    LM trained on the RAW corpus; ``weight = target_score - raw_score``
    is the fixed-point analog of the paper's log importance ratio
    (documented delta: integer mean conditional probabilities instead
    of log-likelihoods — ``ln`` is not bitwise-portable across engines;
    the difference is the same monotone ranking signal the paper
    thresholds on).

    Plan shape at 100 TB: both LM tables are vocabulary-sized
    broadcasts; the corpus explodes its bigrams ONCE and joins both
    LMs in the same stage (no second pass over the text, unlike the
    naive ``score_bigram_lm`` twice); the aggregate is one
    map-side-combinable groupBy on ``id_col``.
    """
    lm_t = (train_bigram_lm(target, text_col, scale, min_count)
            .withColumnRenamed("cond_e", "cond_t"))
    lm_r = (train_bigram_lm(df, text_col, scale, min_count)
            .withColumnRenamed("cond_e", "cond_r"))
    ex = _staged_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.posexplode_outer(_bigrams(F.col("_t"))).alias("_pos", "bigram"))
    t_side = F.broadcast(lm_t) if broadcast_lm else lm_t
    r_side = F.broadcast(lm_r) if broadcast_lm else lm_r
    joined = ex.join(t_side, "bigram", "left").join(r_side, "bigram", "left")
    agg = (joined.groupBy(id_col)
           .agg(F.count("bigram").alias("n_bigrams"),
                F.sum(F.coalesce("cond_t", F.lit(0))).alias("_st"),
                F.sum(F.coalesce("cond_r", F.lit(0))).alias("_sr")))
    nz = F.col("n_bigrams") > 0
    tgt = (F.when(nz, F.expr("_st div n_bigrams"))
           .otherwise(F.lit(0)).cast("long"))
    raw = (F.when(nz, F.expr("_sr div n_bigrams"))
           .otherwise(F.lit(0)).cast("long"))
    return agg.select(
        F.col(id_col), F.col("n_bigrams").cast("long").alias("n_bigrams"),
        tgt.alias("target_score"), raw.alias("raw_score"),
        (tgt - raw).alias("weight"))


def perplexity_buckets(df: DataFrame, lm: DataFrame | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       head_pct: int = 30, mid_pct: int = 30,
                       scale: int = 1_000_000, min_count: int = 1,
                       broadcast_lm: bool = True) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): score
    every document against ``lm`` (trained on ``df`` itself when None —
    pass an LM trained on trusted text for the paper's exact setup) and
    bucket by corpus-level score percentile — ``head`` is the
    best-fitting ``head_pct`` percent, ``middle`` the next ``mid_pct``,
    ``tail`` the rest.

    Thresholds are SCORE VALUES derived from the exact score
    distribution, not row ranks: ``t_head = min{s : 100·c(s) <=
    head_pct·n}`` where ``c(s)`` counts docs scoring >= s — so ties
    land in one bucket and both engines agree bit-exactly (the
    ``length_quantiles`` discipline; no percentile_approx, no float).
    Degenerate corpora (every doc one score) have no qualifying
    threshold: the NULL comparison sends every doc to ``tail``,
    documented over hidden. Buckets can undershoot their percent by at
    most one tie-class — the deterministic cost of value thresholds.

    Scale shape: the score distribution compacts to one row per
    DISTINCT score — bounded by ``scale``, not the corpus — before the
    single-partition cumulative window runs; the two thresholds then
    ride a broadcast 1-row cross join back onto the scored docs. No
    corpus-sized sort, no driver collect.
    """
    if lm is None:
        lm = train_bigram_lm(df, text_col, scale, min_count)
    scored = score_bigram_lm(df, lm, text_col, id_col, broadcast_lm)
    from pyspark.sql import Window
    dist = scored.groupBy("lm_score").agg(F.count("*").alias("_c"))
    w = Window.orderBy(F.col("lm_score").desc())
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = dist.select(
        "lm_score", F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"))
    thr = cum.agg(
        F.min(F.when(100 * F.col("_cum") <= head_pct * F.col("_n"),
                     F.col("lm_score"))).alias("_t_head"),
        F.min(F.when(100 * F.col("_cum") <=
                     (head_pct + mid_pct) * F.col("_n"),
                     F.col("lm_score"))).alias("_t_mid"))
    bucket = (F.when(F.col("lm_score") >= F.col("_t_head"), F.lit("head"))
              .when(F.col("lm_score") >= F.col("_t_mid"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (scored.crossJoin(F.broadcast(thr))
            .select(id_col, "n_bigrams", "lm_score",
                    bucket.alias("bucket")))


def dsir_select(df: DataFrame, target: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                scale: int = 1_000_000, min_count: int = 1,
                broadcast_lm: bool = True) -> DataFrame:
    """Top-``k`` documents by DSIR importance weight (ties broken by
    ``id_col`` so selection is deterministic in every engine).

    Documented delta from the paper: deterministic top-k instead of
    Gumbel-noise resampling — noise is not engine-portable; compose
    with the md5-keyed ``sampling`` tier when a stochastic draw is
    wanted. ``orderBy().limit()`` compiles to TakeOrderedAndProject:
    every task keeps k rows, the driver merges k, nothing global-sorts.
    """
    w = dsir_weights(df, target, text_col, id_col, scale, min_count,
                     broadcast_lm)
    return w.orderBy(F.col("weight").desc(), F.col(id_col)).limit(k)
