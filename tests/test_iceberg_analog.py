"""VERDICT r4 task #4: exercise the Iceberg runtime when present, else
pin the parquet analog's directory-overwrite assumptions.

The engine's commit story (plans/job.py:19-24, plans/ingest.py:13-16)
maps per-bucket dynamic partition overwrite to an Iceberg
replace-partitions snapshot commit, and per-snapshot directory
overwrite to an append snapshot. This module makes both claims
testable: if an iceberg-spark runtime jar is ever on the classpath the
real catalog path runs (resume + replace-partitions semantics);
otherwise the analog's exact overwrite behavior is pinned so a Spark
upgrade cannot silently change the semantics the design argues from.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions")
        return True
    except Exception:
        return False


def test_iceberg_runtime_roundtrip_if_present(spark, tmp_path):
    """Real-catalog smoke: only runs when the iceberg-spark runtime jar
    is on the classpath (absent in this container — the analog test
    below carries the gate then)."""
    if not _iceberg_available(spark):
        pytest.skip("iceberg-spark runtime jar not on the classpath")
    wh = str(tmp_path / "warehouse")
    spark.conf.set("spark.sql.catalog.it",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", wh)
    spark.sql("CREATE TABLE it.db.t (doc_id BIGINT, bucket INT) "
              "USING iceberg PARTITIONED BY (bucket)")
    spark.createDataFrame([(1, 0), (2, 1)], "doc_id long, bucket int") \
        .writeTo("it.db.t").append()
    spark.createDataFrame([(3, 0)], "doc_id long, bucket int") \
        .writeTo("it.db.t").overwritePartitions()
    got = {(r.doc_id, r.bucket) for r in spark.table("it.db.t").collect()}
    assert got == {(3, 0), (2, 1)}   # replace-partitions: bucket 1 kept


def test_dynamic_overwrite_replaces_only_written_buckets(spark, tmp_path):
    """The replace-partitions analog run_job relies on
    (plans/job.py: 'dynamic partition overwrite = per-bucket
    idempotence'): overwriting with a frame that holds buckets {0}
    must replace bucket 0's directory wholesale and leave bucket 1
    untouched — never append into 0, never drop 1."""
    path = str(tmp_path / "data")
    full = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "doc_id long, bucket int")
    full.write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("bucket").parquet(path)

    # the "retry" writes a DIFFERENT row set for bucket 0 only
    retry = spark.createDataFrame(
        [(7, 0), (8, 0), (9, 0)], "doc_id long, bucket int")
    retry.write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("bucket").parquet(path)

    got = {(r.doc_id, r.bucket)
           for r in spark.read.parquet(path).collect()}
    assert got == {(7, 0), (8, 0), (9, 0), (3, 1)}, (
        "dynamic partition overwrite no longer replaces exactly the "
        "written buckets — the run_job idempotence argument is void")
    # the bucket directory itself was rewritten, not appended into
    b0 = os.path.join(path, "bucket=0")
    n_files = [f for f in os.listdir(b0) if f.endswith(".parquet")]
    assert spark.read.parquet(b0).count() == 3
    assert len(n_files) >= 1


def test_static_overwrite_would_drop_other_buckets(spark, tmp_path):
    """The inverse pin: WITHOUT partitionOverwriteMode=dynamic, an
    overwrite drops every other bucket — documenting why the option is
    load-bearing in run_job and ingest_snapshot's docs write."""
    path = str(tmp_path / "data")
    spark.createDataFrame([(1, 0), (3, 1)], "doc_id long, bucket int") \
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    spark.createDataFrame([(7, 0)], "doc_id long, bucket int") \
        .write.mode("overwrite").option("partitionOverwriteMode", "static") \
        .partitionBy("bucket").parquet(path)
    got = {(r.doc_id, r.bucket)
           for r in spark.read.parquet(path).collect()}
    assert got == {(7, 0)}


def test_per_snapshot_directory_overwrite_is_self_contained(spark, tmp_path):
    """ingest_snapshot's append-by-layout claim: overwriting one
    snapshot=<id> directory never touches sibling snapshot dirs, and a
    partition-discovery read of the root sees the union."""
    root = str(tmp_path / "docs")
    spark.createDataFrame([("a", 1)], "doc_id string, v int") \
        .write.mode("overwrite").parquet(os.path.join(root, "snapshot=s1"))
    spark.createDataFrame([("b", 2)], "doc_id string, v int") \
        .write.mode("overwrite").parquet(os.path.join(root, "snapshot=s2"))
    # retry of s2 replaces s2 only
    spark.createDataFrame([("c", 3)], "doc_id string, v int") \
        .write.mode("overwrite").parquet(os.path.join(root, "snapshot=s2"))
    got = {(r.doc_id, r.v) for r in
           spark.read.parquet(root).select("doc_id", "v").collect()}
    assert got == {("a", 1), ("c", 3)}
    snaps = {r.snapshot for r in
             spark.read.parquet(root).select(
                 F.col("snapshot").cast("string").alias("snapshot"))
             .distinct().collect()}
    assert snaps == {"s1", "s2"}
