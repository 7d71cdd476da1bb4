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


def _kn_tables(reference: DataFrame, text_col: str, scale: int,
               d_num: int, d_den: int, min_count: int):
    """The three Kneser-Ney model tables, derived from ONE bigram-count
    aggregate over the reference corpus:

    - ``bigr(bigram, disc_e)`` — the discounted-ML term per SEEN bigram,
      ``max(d_den·bc − d_num, 0) · scale div (d_den · c(w1 ·))``, pruned
      to ``bc >= min_count`` (pruned bigrams back off like unseen ones,
      the standard pruned-LM semantics; the STATISTICS below are always
      computed over the unpruned counts).
    - ``lam(w1, lambda_e)`` — the interpolation mass left for the
      continuation distribution: ``d_num · N1+(w1 ·) · scale div
      (d_den · c(w1 ·))``.
    - ``cont(w2, cont_e)`` — the continuation probability ``N1+(· w2) ·
      scale div N1+(· ·)`` (how many distinct contexts precede w2, not
      how often it occurs — THE Kneser-Ney idea).

    ``c(w1 ·)`` is the bigram-occurrence mass of the context (sum of bc
    over bigrams starting w1), so numerator and denominator count the
    same events and the fixed-point probabilities sum below 1.
    """
    staged = _staged_tokens(reference, text_col)
    bi = (staged.select(
              F.explode_outer(_bigrams(F.col("_t"))).alias("bigram"))
          .where(F.col("bigram").isNotNull())
          .groupBy("bigram").agg(F.count("*").alias("bc"))
          .select("bigram", "bc",
                  F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"),
                  F.split_part("bigram", F.lit(" "), F.lit(2)).alias("w2")))
    follow = (bi.groupBy("w1")
              .agg(F.sum("bc").alias("uc1"),
                   F.count("*").alias("n1f")))
    lam = follow.select(
        "w1", F.expr(f"{int(d_num)} * n1f * {int(scale)}"
                     f" div ({int(d_den)} * uc1)").alias("lambda_e"))
    types = bi.agg(F.count("*").alias("_nt"))
    cont = (bi.groupBy("w2").agg(F.count("*").alias("n1p"))
            .crossJoin(F.broadcast(types))
            .select("w2", F.expr(f"n1p * {int(scale)} div _nt")
                    .alias("cont_e")))
    bigr = (bi.where(F.col("bc") >= min_count)
            .join(F.broadcast(follow), "w1")
            .select("bigram", "w1", "w2",
                    F.expr(f"greatest({int(d_den)} * bc - {int(d_num)}, 0)"
                           f" * {int(scale)} div ({int(d_den)} * uc1)")
                    .alias("disc_e")))
    return bigr, lam, cont


def train_kn_bigram_lm(reference: DataFrame, text_col: str = "text",
                       scale: int = 1_000_000, d_num: int = 3,
                       d_den: int = 4, min_count: int = 1) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1998 §4.1.6) — the smoothing KenLM implements and the
    CCNet recipe trains its quality filter with. One row per kept
    bigram: ``(bigram, disc_e, lambda_e, cont_e, p_kn_e)`` where

        p_kn_e = disc_e + lambda_e · cont_e div scale

    is the fixed-point interpolated probability ``max(c−D,0)/c(w1·) +
    λ(w1)·P_cont(w2)`` with absolute discount ``D = d_num/d_den``
    (Chen & Goodman's 0.75 default). Documented deltas from the
    textbook form, both shared bit-exactly with the DuckDB oracle:
    fixed-point integer arithmetic instead of floats (engine-portable),
    and a constant discount instead of the count-of-counts estimate
    (the paper's own recommended simplification).

    Scale shape: one bigram-count aggregate over the corpus (map-side
    combinable, the shingle-df discipline); every derived table is
    bigram-type- or vocabulary-sized, never corpus-sized; the two
    stat joins broadcast the vocabulary side.
    """
    bigr, lam, cont = _kn_tables(reference, text_col, scale,
                                 d_num, d_den, min_count)
    return (bigr.join(F.broadcast(lam), "w1")
            .join(F.broadcast(cont), "w2")
            .select("bigram", "disc_e", "lambda_e", "cont_e",
                    (F.col("disc_e")
                     + F.expr(f"lambda_e * cont_e div {int(scale)}"))
                    .alias("p_kn_e")))


def score_kn_bigram_lm(df: DataFrame, reference: DataFrame | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       scale: int = 1_000_000, d_num: int = 3,
                       d_den: int = 4, min_count: int = 1,
                       broadcast_lm: bool = True) -> DataFrame:
    """Per-doc Kneser-Ney fit: ``(id_col, n_bigrams, kn_score)`` — the
    integer mean of interpolated-KN occurrence probabilities. Unlike
    the unsmoothed ``score_bigram_lm`` (unseen bigram → hard 0), every
    occurrence keeps its backoff mass ``λ(w1)·P_cont(w2)``: a doc full
    of fluent-but-novel word pairs scores well above gibberish whose
    WORDS are novel too — the reason KN is the standard scoring LM.

    The occurrence score is one branch-free expression over three left
    joins (seen-bigram discount, context λ, continuation P_cont):
    ``coalesce(disc,0) + coalesce(λ,0)·coalesce(cont,0) div scale`` —
    for a seen bigram that IS the interpolated probability; for an
    unseen one the disc leg is null and only backoff mass remains.

    Scale shape: the doc bigrams explode once; λ and cont are
    vocabulary-sized broadcasts; the bigram join broadcasts when the
    pruned table fits (``broadcast_lm``), else shuffles on the
    Zipf-skewed bigram key (keep AQE skew-join on). One map-side
    combinable groupBy closes it.
    """
    if reference is None:
        reference = df
    bigr, lam, cont = _kn_tables(reference, text_col, scale,
                                 d_num, d_den, min_count)
    ex = _staged_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.posexplode_outer(_bigrams(F.col("_t"))).alias("_pos", "bigram"))
    ex = ex.select(
        id_col, "bigram",
        F.split_part("bigram", F.lit(" "), F.lit(1)).alias("_w1"),
        F.split_part("bigram", F.lit(" "), F.lit(2)).alias("_w2"))
    b_side = bigr.select("bigram", "disc_e")
    if broadcast_lm:
        b_side = F.broadcast(b_side)
    joined = (ex.join(b_side, "bigram", "left")
              .join(F.broadcast(lam.withColumnRenamed("w1", "_w1")),
                    "_w1", "left")
              .join(F.broadcast(cont.withColumnRenamed("w2", "_w2")),
                    "_w2", "left"))
    occ = (F.coalesce("disc_e", F.lit(0))
           + F.expr(f"coalesce(lambda_e, 0) * coalesce(cont_e, 0)"
                    f" div {int(scale)}"))
    return (joined.groupBy(id_col)
            .agg(F.count("bigram").alias("n_bigrams"),
                 F.sum(occ).alias("_s"))
            .select(id_col, "n_bigrams",
                    F.when(F.col("n_bigrams") > 0,
                           F.expr("_s div n_bigrams"))
                    .otherwise(F.lit(0)).cast("long").alias("kn_score")))


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


def fit_jm_lambda(train: DataFrame, heldout: DataFrame,
                  text_col: str = "text", rounds: int = 3,
                  scale: int = 1_000_000, min_count: int = 1,
                  lambda0_e6: int = 500_000,
                  broadcast_lm: bool = True) -> DataFrame:
    """Jelinek-Mercer interpolation weight by deleted-interpolation EM
    (Jelinek & Mercer 1980; the classic held-out recipe): fit the λ in
    ``p(w2|w1) = λ·p_bigram + (1−λ)·p_unigram`` that maximizes
    held-out likelihood. Each EM round computes, per held-out bigram
    occurrence, the bigram component's responsibility ``r = λ·p_bi /
    (λ·p_bi + (1−λ)·p_uni)`` and sets λ to the mean responsibility —
    all in e6 fixed point with per-occurrence floors, so the DuckDB
    oracle unrolls the identical rounds. Returns one row per round:
    ``(round, lambda_e6, n_scored)``.

    Occurrences where BOTH probabilities are zero (novel word pairs
    over a pruned model) carry no signal and are excluded from
    ``n_scored``, the standard deleted-interpolation convention.

    Scale shape: the held-out corpus explodes its bigrams ONCE and
    joins both model tables (broadcast), then the scored occurrence
    table is ``localCheckpoint``-staged — each round after that is ONE
    map-side-combinable aggregate and one driver scalar (the
    bpe/pagerank pacing discipline).
    """
    spark = train.sparkSession
    lm = train_bigram_lm(train, text_col, scale, min_count) \
        .withColumnRenamed("cond_e", "_pb")
    toks = _staged_tokens(train, text_col)
    uni = (toks.select(F.explode_outer("_t").alias("w2"))
           .where(F.col("w2").isNotNull())
           .groupBy("w2").agg(F.count("*").alias("_uc")))
    tot = uni.agg(F.sum("_uc").alias("_tt"))
    puni = (uni.crossJoin(F.broadcast(tot))
            .select("w2", F.expr(f"_uc * {int(scale)} div _tt")
                    .alias("_pu")))
    ex = _staged_tokens(heldout, text_col).select(
        F.posexplode_outer(_bigrams(F.col("_t"))).alias("_pos", "bigram"))
    ex = ex.select("bigram",
                   F.split_part("bigram", F.lit(" "), F.lit(2))
                   .alias("_w2"))
    b_side = F.broadcast(lm) if broadcast_lm else lm
    occ = (ex.join(b_side, "bigram", "left")
           .join(F.broadcast(puni.withColumnRenamed("w2", "_w2")),
                 "_w2", "left")
           .select(F.coalesce("_pb", F.lit(0)).cast("long").alias("pb"),
                   F.coalesce("_pu", F.lit(0)).cast("long").alias("pu"))
           .where(F.col("pb") + F.col("pu") > 0)
           .localCheckpoint())
    n = occ.count()
    hist = []
    lam = int(lambda0_e6)
    for r in range(1, max(int(rounds), 0) + 1):
        if n == 0:
            hist.append((r, lam, 0))
            continue
        s = occ.agg(F.sum(F.expr(
            f"{lam} * pb * 1000000"
            f" div ({lam} * pb + ({1_000_000 - lam}) * pu)"))
            .cast("long")).first()[0]
        lam = int(s) // n
        hist.append((r, lam, n))
    return spark.createDataFrame(
        hist, "round long, lambda_e6 long, n_scored long")
