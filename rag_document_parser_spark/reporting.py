"""Reporting aggregates over extraction output (SURVEY.md §2.4 A1–A13).

Each mirrors a reference report shape; all compile to built-in aggregates
(map-side partial aggregation, no UDFs). They operate on either the raw
``documents`` table (text analytics) or the engine output table
(success/route stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_document_parser_spark.functions import text as X


def summary_report(out: DataFrame) -> DataFrame:
    """A1 (/root/reference/main.py:302-330): totals + success rate + timing."""
    return out.agg(
        F.count("*").alias("total_docs"),
        F.sum(F.col("success").cast("int")).alias("successful"),
        F.sum((~F.col("success")).cast("int")).alias("failed"),
        F.round(F.avg(F.col("success").cast("double")) * 100, 2).alias("success_rate"),
        F.sum("wall_us").alias("total_wall_us"),
        F.sum(F.size("spans_clean")).alias("total_spans"),
    )


def by_route(out: DataFrame) -> DataFrame:
    """A2/A8 (/root/reference/main.py:331-337): per-route counts + success rate."""
    return (
        out.groupBy("route")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.col("success").cast("double")) * 100, 2).alias("success_rate"),
            F.sum(F.size("spans_clean")).alias("n_spans"),
        )
        .orderBy(F.desc("n_docs"), "route")
    )


def failed_docs(out: DataFrame, limit: int = 5) -> DataFrame:
    """A3 + L3 (/root/reference/main.py:338-341,446-450)."""
    return (
        out.where(~F.col("success"))
        .select("doc_id", "error")
        .orderBy("doc_id")
        .limit(limit)
    )


def arabic_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """A4/A6/A7 (/root/reference/main.py:417-421,
    example_usage_reporting.py:258-262,427-435) per doc."""
    c = F.col(text_col)
    a = X.arabic_char_count(c)
    return docs.select(
        "doc_id",
        a.alias("arabic_chars"),
        X.latin_char_count(c).alias("latin_chars"),
        F.round(F.when(F.length(c) > 0, a / F.length(c) * 100).otherwise(0.0), 4)
        .alias("arabic_pct"),
        X.language_classify(c).alias("language"),
    )


def doc_statistics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """A11 (/root/reference/models/parse_result.py:156-165)."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(c).alias("character_count"),
        X.word_count(c).alias("word_count"),
        X.line_count(c).alias("line_count"),
        X.page_count_estimate(c).alias("page_count"),
        X.title_heuristic(c).alias("title"),
    )


def content_structure_totals(out: DataFrame) -> DataFrame:
    """A10: span-kind totals over cleaned output (exists/size shapes)."""
    return out.agg(
        F.sum(F.size(F.filter("spans_clean", lambda s: s["kind"] == "table")))
        .alias("total_tables"),
        F.sum(F.size(F.filter("spans_clean",
                              lambda s: s["kind"].isin("media", "media_slide"))))
        .alias("total_media"),
        F.sum(
            F.exists("spans_clean",
                     lambda s: s["kind"].isin("media", "media_slide")
                     & s["text"].isNotNull()).cast("int")
        ).alias("docs_with_ocr_text"),
    )


def validity(out: DataFrame) -> DataFrame:
    """A12 (/root/reference/models/parse_result.py:167-176): success AND
    (any non-blank text span OR any table OR any media)."""
    has_content = F.exists(
        "spans_clean",
        lambda s: (s["text"].isNotNull() & (X.strip(s["text"]) != ""))
        | s["kind"].isin("table", "media", "media_slide"),
    )
    return out.select(
        "doc_id", (F.col("success") & has_content).alias("is_valid")
    )


def bucket_skew_report(docs: DataFrame, n_buckets: int = 256,
                       id_col: str = "doc_id",
                       weight_col: str = "n_chars") -> DataFrame:
    """Pre-flight skew diagnostic for the salted-bucket partitioning:
    ``(bucket, n_docs, weight_total, skew_e6)`` per md5 bucket, where
    ``skew_e6 = weight_total * n_buckets * 10^6 div corpus_weight`` —
    1e6 means a perfectly even bucket, 2e6 a bucket carrying twice its
    share. Run this BEFORE a 100 TB job to verify the bucket key
    spreads the byte mass (doc counts can be even while one bucket
    holds all the giant documents — the straggler the chunking path
    exists for; this report shows both).

    One bounded groupBy (key domain = n_buckets) and one 1-row total
    broadcast back onto it — never a corpus-sized shuffle or sort.
    """
    h = F.conv(F.substring(
        F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    per = (docs.select((h % F.lit(n_buckets)).alias("bucket"),
                       F.col(weight_col).cast("long").alias("_w"))
           .groupBy("bucket")
           .agg(F.count("*").alias("n_docs"),
                F.sum("_w").alias("weight_total")))
    total = per.agg(F.sum("weight_total").alias("_tot"))
    return (per.crossJoin(F.broadcast(total))
            .select("bucket", "n_docs", "weight_total",
                    F.call_function(
                        "div",
                        F.col("weight_total") * F.lit(n_buckets)
                        * F.lit(10 ** 6), F.col("_tot")).alias("skew_e6")))


def corpus_datasheet(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", source_col: str = "source",
                     lang_col: str = "lang",
                     min_words: int = 5, max_words: int = 100_000,
                     alpha_permille: int = 100) -> DataFrame:
    """One-pass corpus datasheet: the "datasheets for datasets" summary
    a training-data release ships — long format ``(metric, value)``
    rows, every value an exact integer:

    - ``n_docs``, ``n_sources``, ``n_langs``
    - ``total_tokens``, ``total_chars``
    - ``distinct_texts`` (exact md5 distinct) and ``exact_dup_docs``
    - ``quality_pass`` (the ``source_quality_prior`` integer bar) and
      ``quality_pass_e6`` (fixed-point corpus pass rate)
    - ``mean_tokens_e3`` (``1000·total div n``)

    Long format deliberately: metrics append without a schema change,
    and the driver's multiset compare hashes every number.

    Scale: one projection + one global aggregate; count-distincts are
    exact (they shuffle once on uniform md5/source/lang keys). At
    10^12 docs swap the md5 count-distinct for ``sketches.hll_counts``
    and report the estimate — this exact form is the oracle-checkable
    reference implementation.
    """
    from rag_document_parser_spark.operators.dedup import words

    c = F.col(text_col)
    staged = docs.select(
        F.col(source_col).alias("_src"), F.col(lang_col).alias("_lang"),
        F.md5(c).alias("_h"), F.length(c).cast("long").alias("_nc"),
        F.size(words(c)).cast("long").alias("_nw"),
        F.length(F.regexp_replace(c, "[^A-Za-z؀-ۿ ]", ""))
        .cast("long").alias("_na"))
    ok = ((F.col("_nw") >= min_words) & (F.col("_nw") <= max_words)
          & (F.col("_na") * 1000 >= F.col("_nc") * alpha_permille))
    agg = staged.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("_src").cast("long").alias("n_sources"),
        F.count_distinct("_lang").cast("long").alias("n_langs"),
        F.sum("_nw").cast("long").alias("total_tokens"),
        F.sum("_nc").cast("long").alias("total_chars"),
        F.count_distinct("_h").cast("long").alias("distinct_texts"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long")
        .alias("quality_pass"))
    wide = agg.select(
        "*",
        (F.col("n_docs") - F.col("distinct_texts")).alias("exact_dup_docs"),
        F.expr("quality_pass * 1000000 div greatest(n_docs, 1)")
        .alias("quality_pass_e6"),
        F.expr("total_tokens * 1000 div greatest(n_docs, 1)")
        .alias("mean_tokens_e3"))
    metrics = ["n_docs", "n_sources", "n_langs", "total_tokens",
               "total_chars", "distinct_texts", "exact_dup_docs",
               "quality_pass", "quality_pass_e6", "mean_tokens_e3"]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return wide.select(F.expr(
        f"stack({len(metrics)}, {stack}) AS (metric, value)")).select(
        "metric", F.col("value").cast("long").alias("value"))


def snapshot_drift(old: DataFrame, new: DataFrame,
                   text_col: str = "text", source_col: str = "source",
                   min_words: int = 5, max_words: int = 100_000,
                   alpha_permille: int = 100) -> DataFrame:
    """Release-gating drift report between two corpus snapshots.

    Before promoting snapshot N+1, a pipeline checks what moved per
    source: document count, token mass, and quality pass rate. Each
    side is reduced to one row per source (docs, tokens,
    ``source_quality_prior``-bar passes), the two are full-outer
    joined on source (a source present on one side only reports zeros
    on the other), and the output is long-format
    ``(source, metric, old_value, new_value, delta)`` with
    ``delta = new - old`` — every value an exact integer. Metrics:
    ``n_docs``, ``total_tokens``, ``quality_pass``,
    ``quality_pass_e6``.

    Scale shape: two map-side-combinable aggregates on the source key,
    then a join between two already-tiny per-source relations; the
    corpora themselves never shuffle against each other.
    """
    from rag_document_parser_spark.operators.dedup import words

    def side(df, pfx):
        c = F.col(text_col)
        staged = df.select(
            F.col(source_col).alias("source"),
            F.length(c).cast("long").alias("_nc"),
            F.size(words(c)).cast("long").alias("_nw"),
            F.length(F.regexp_replace(c, "[^A-Za-z؀-ۿ ]", ""))
            .cast("long").alias("_na"))
        ok = ((F.col("_nw") >= min_words) & (F.col("_nw") <= max_words)
              & (F.col("_na") * 1000 >= F.col("_nc") * alpha_permille))
        agg = staged.groupBy("source").agg(
            F.count("*").cast("long").alias(f"{pfx}_n_docs"),
            F.sum("_nw").cast("long").alias(f"{pfx}_total_tokens"),
            F.sum(F.when(ok, 1).otherwise(0)).cast("long")
            .alias(f"{pfx}_quality_pass"))
        return agg.withColumn(
            f"{pfx}_quality_pass_e6",
            F.expr(f"{pfx}_quality_pass * 1000000 "
                   f"div greatest({pfx}_n_docs, 1)"))

    j = side(old, "o").join(side(new, "n"), "source", "full_outer")
    metrics = ["n_docs", "total_tokens", "quality_pass",
               "quality_pass_e6"]
    stack = ", ".join(
        f"'{m}', coalesce(o_{m}, 0), coalesce(n_{m}, 0)" for m in metrics)
    long = j.select("source", F.expr(
        f"stack({len(metrics)}, {stack}) "
        "AS (metric, old_value, new_value)"))
    return long.select(
        "source", "metric",
        F.col("old_value").cast("long").alias("old_value"),
        F.col("new_value").cast("long").alias("new_value"),
        (F.col("new_value") - F.col("old_value")).cast("long")
        .alias("delta"))


def source_concentration(docs: DataFrame, text_col: str = "text",
                         source_col: str = "source") -> DataFrame:
    """Lorenz-style source-concentration card: one row per source,
    ranked by token mass — ``(rank, source, n_docs, tokens, share_e6,
    cum_share_e6)`` — the "top 10 domains hold 60% of the corpus"
    number every corpus datasheet reports (and the first thing a
    mixture designer checks before reweighting).

    Deterministic rank: token mass desc, source asc on ties. Scale
    shape: one map-side-combinable aggregate to the per-source
    relation (sources ≪ corpus), then one window over that small
    relation — the corpus itself never sorts.
    """
    from rag_document_parser_spark.operators.dedup import words

    per = (docs.select(F.col(source_col).alias("source"),
                       F.size(words(F.col(text_col))).cast("long")
                       .alias("_nw"))
           .groupBy("source")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("_nw").cast("long").alias("tokens")))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("tokens").desc(), F.col("source").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (per.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "source", "n_docs", "tokens",
        F.sum("tokens").over(wc).alias("_cum"),
        F.sum("tokens").over(wall).alias("_tot"))
        .select("rank", "source", "n_docs", "tokens",
                F.expr("tokens * 1000000 div nullif(_tot, 0)")
                .cast("long").alias("share_e6"),
                F.expr("_cum * 1000000 div nullif(_tot, 0)")
                .cast("long").alias("cum_share_e6")))


def source_hhi(docs: DataFrame, text_col: str = "text",
               source_col: str = "source") -> DataFrame:
    """Herfindahl-Hirschman concentration of token mass across
    sources — the one-number companion to ``source_concentration``'s
    Lorenz rows: ``HHI = Σ_s share_s²``, 1e6 when one source holds
    everything, 1e6/n under a perfectly even n-source split. One row:
    ``(n_sources, total_tokens, hhi_e6, effective_sources_e3)`` where
    ``effective_sources_e3 = 1e9 div hhi_e6`` is the equivalent count
    of equal sources (×1000).

    Exact integer: ``hhi_e6 = Σ tokens_s² · 1e6 div (Σ tokens)²``
    with squares in decimal(38,0) (exact past 10¹⁵ tokens/source).
    One per-source aggregate, one 1-row fold. Empty corpus → NULLs.
    """
    from rag_document_parser_spark.operators.dedup import words

    per = (docs.select(F.col(source_col).alias("source"),
                       F.size(words(F.col(text_col))).cast("long")
                       .alias("_nw"))
           .groupBy("source").agg(F.sum("_nw").alias("_t")))
    agg = per.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long")
        .alias("total_tokens"),
        F.sum(F.expr("cast(_t as decimal(38,0)) * _t")).alias("_sq"))
    return agg.select(
        "n_sources", "total_tokens",
        F.when(F.col("total_tokens") > 0, F.expr(
            "cast(_sq * 1000000 div (cast(total_tokens as decimal(38,0))"
            " * total_tokens) as bigint)")).alias("hhi_e6")
    ).withColumn(
        "effective_sources_e3",
        F.expr("1000000000 div nullif(hhi_e6, 0)").cast("long"))
