"""Sources and sinks (SURVEY.md §2.1, S1/S6/S7 + E33 caps).

Thin, deliberately: scans ARE Spark's native readers — the engine's value
is keeping filters/column pruning pushable into them, so these helpers
only add the reference's admission/caps semantics on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from rag_document_parser_spark.schema import INPUT_SCHEMA


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """S1 — the corpus scan. Local parquet; on a cluster this is
    ``spark.read.table('db.documents')`` (Iceberg) with identical schema."""
    df = (spark.read.table(path) if "." in path and not os.path.sep in path
          and not path.endswith(".parquet") else spark.read.parquet(path))
    missing = {f.name for f in INPUT_SCHEMA.fields} - set(df.columns)
    if missing:
        raise ValueError(f"documents source missing columns: {sorted(missing)}")
    return df.select("doc_id", "spans")


def read_binary_docs(spark: SparkSession, path: str,
                     glob: str = "*", max_bytes: int = 200 * 1024 * 1024) -> DataFrame:
    """S1 file analog + size gate: recursive binaryFile scan with the
    reference's 200 MB admission limit
    (/root/reference/utils/config.py:170, main.py:223-251)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .where(F.col("length") <= max_bytes)
        .select(F.col("path").alias("doc_id"), F.col("content").alias("payload"),
                "length", "modificationTime")
    )


def read_csv_capped(spark: SparkSession, path: str, max_rows: int = 10_000,
                    max_columns: int = 100, header: bool = True) -> DataFrame:
    """E33 — CSV with the reference's row/column caps
    (/root/reference/utils/config.py:110-111,
     /root/reference/parsers/spreadsheet_parser.py:107-162). The reference
    caps each spreadsheet FILE independently, so the row cap is a
    per-input-file window (deterministic for multi-file loads — a global
    LIMIT would keep an arbitrary mix); the column cap is a projection.
    The per-file rank needs no extra shuffle key skew handling: CSV splits
    of one file already hash to the same input partition ordering."""
    from pyspark.sql import Window

    df = spark.read.option("header", str(header).lower()).csv(path)
    df = df.select(df.columns[:max_columns])
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_rows).drop("_rn"))


def write_json_results(df: DataFrame, path: str) -> None:
    """S6 — results sink (/root/reference/main.py:429-440), JSON lines."""
    df.write.mode("overwrite").json(path)


def export_tables_csv(out: DataFrame, path: str) -> None:
    """S7 — per-table CSV export (/root/reference/example_usage.py:306-327):
    explode rendered table spans, one CSV partition tree keyed by doc."""
    tables = (
        out.select("doc_id", F.posexplode("spans_clean").alias("idx", "span"))
        .where(F.col("span.kind") == "table")
        .select("doc_id", "idx", F.col("span.text").alias("rendered"))
    )
    tables.write.mode("overwrite").partitionBy("doc_id").csv(path)
