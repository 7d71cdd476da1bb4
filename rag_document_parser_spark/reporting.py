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
