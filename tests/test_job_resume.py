"""Job-level tests: checkpoint resume, lineage integrity, giant-doc chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.config import ExtractConfig
from rag_document_parser_spark.corpus import fixture_df, generate_fixture_docs
from rag_document_parser_spark.plans.job import (
    chunk_giant_docs,
    extract,
    read_lineage,
    run_job,
)
from rag_document_parser_spark.semantics import clean_doc

CFG = ExtractConfig(n_buckets=16, max_spans_per_chunk=512)


def test_resume_skips_committed_partitions(spark, tmp_path):
    out = str(tmp_path / "job")
    df = fixture_df(spark, seed=42, n_docs=120)

    # partial run: only 5 buckets commit, then "failure"
    r1 = run_job(spark, df, out, CFG, fail_after_buckets=5, run_id="r1")
    assert r1["buckets_total_committed"] == 5

    # resume: must skip the 5 committed buckets and finish the rest
    r2 = run_job(spark, df, out, CFG, run_id="r2")
    assert r2["buckets_skipped"] == 5

    lineage = read_lineage(spark, out)
    # no duplicate lineage rows per partition
    dupes = lineage.groupBy("partition_id").count().where(F.col("count") > 1)
    assert dupes.count() == 0

    # final data: every doc exactly once
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == 120
    assert data.select("doc_id").distinct().count() == 120

    # a third run is a full no-op
    r3 = run_job(spark, df, out, CFG, run_id="r3")
    assert r3["docs_committed"] == 120
    assert spark.read.parquet(f"{out}/data").count() == 120


def test_stale_bucket_dirs_not_swept_into_lineage(spark, tmp_path):
    """A crashed run's orphan data (written but never recorded in lineage)
    must not be marked committed by a later run that didn't process those
    buckets — otherwise resume would silently skip them forever."""
    out = str(tmp_path / "job")
    df = fixture_df(spark, seed=7, n_docs=100)

    # simulate a crash between data write and lineage append: write data
    # for the full corpus directly, no lineage rows at all
    staged = extract(df, CFG, engine="arrow").withColumn(
        "doc_hash", F.xxhash64("doc_id", "spans_clean")).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(CFG.n_buckets)).cast("int"))
    staged.write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/data")

    # a later run over a SUBSET of the corpus (some buckets absent)
    sub = fixture_df(spark, seed=7, n_docs=100).limit(10)
    run_job(spark, sub, out, CFG, run_id="partial")

    lineage = read_lineage(spark, out)
    sub_buckets = {
        r.bucket for r in sub.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(CFG.n_buckets)).cast("int")
            .alias("bucket")).distinct().collect()}
    committed = {r.partition_id for r in lineage.collect()}
    # only buckets this run processed are committed; orphans stay pending
    assert committed == sub_buckets
    assert len(committed) < CFG.n_buckets


def test_lineage_checksum_matches_recompute(spark, tmp_path):
    out = str(tmp_path / "job")
    df = fixture_df(spark, seed=13, n_docs=60)
    run_job(spark, df, out, CFG, run_id="only")
    data = spark.read.parquet(f"{out}/data")
    recomputed = (
        data.groupBy("bucket")
        .agg(F.lower(F.hex(F.bit_xor("doc_hash"))).alias("checksum2"),
             F.count("*").alias("cnt2"))
    )
    lineage = read_lineage(spark, out)
    joined = lineage.join(recomputed,
                          lineage.partition_id == recomputed.bucket)
    bad = joined.where(
        (F.col("checksum") != F.col("checksum2")) | (F.col("doc_count") != F.col("cnt2"))
    )
    assert bad.count() == 0
    assert joined.count() == lineage.count()


def test_chunking_splits_and_reassembles_giant_doc(spark):
    giant = 5000  # ~10x chunk budget
    df = fixture_df(spark, seed=42, n_docs=30, giant_doc_spans=giant)

    chunked = chunk_giant_docs(df, CFG.max_spans_per_chunk)
    giant_chunks = chunked.where(F.col("doc_id") == "doc-giant")
    n = giant_chunks.count()
    assert n == -(-giant // CFG.max_spans_per_chunk)  # ceil
    assert giant_chunks.agg(F.sum(F.size("spans"))).collect()[0][0] == giant

    out = extract(df, CFG, engine="arrow", chunk=True)
    row = out.where(F.col("doc_id") == "doc-giant").collect()[0]
    docs = {d["doc_id"]: d for d in
            generate_fixture_docs(seed=42, n_docs=30, giant_doc_spans=giant)}
    expected, _, _, _, _ = clean_doc(docs["doc-giant"]["spans"], CFG)
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in row["spans_clean"]]
    exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected]
    assert got == exp


def test_chunked_extract_matches_unchunked_everywhere(spark):
    df = fixture_df(spark, seed=99, n_docs=80)
    cfg = ExtractConfig(max_spans_per_chunk=4)  # force chunking of normal docs
    a = {r["doc_id"]: ([tuple(s) for s in r["spans_clean"]], r["route"],
                       r["title"], r["success"])
         for r in extract(df, cfg, chunk=True).collect()}
    b = {r["doc_id"]: ([tuple(s) for s in r["spans_clean"]], r["route"],
                       r["title"], r["success"])
         for r in extract(df, cfg, chunk=False).collect()}
    assert a == b


def test_chunked_tie_breaks_and_title_are_exact(spark):
    """Duplicate offsets straddling chunk boundaries must keep the
    original-array-position tie-break, and the doc title must be the
    first titled kept span in READING order even when chunk order
    disagrees (titled spans' offsets shuffled across chunks)."""
    html_a = "<html><head><title>zeta last</title></head><body><p>late block body text</p></body></html>"
    html_b = "<html><head><title>alpha first</title></head><body><p>early block body text</p></body></html>"
    rows = [
        # 10 spans all at offset=5: with max_spans_per_chunk=4 they
        # straddle three chunks; order must stay 0..9 (array position)
        ("ties", [("text", f"tie {j}", None, 5) for j in range(10)]),
        # titled html spans: chunk 0 holds the HIGH offset title, chunk 1+
        # the LOW one — chunk-order title selection would pick 'zeta'
        ("titles", [("html", html_a, None, 9)]
         + [("text", f"filler {j}", None, 10 + j) for j in range(4)]
         + [("html", html_b, None, 1)]),
        # duplicate-offset titled spans across chunks: position decides
        ("titles-tied", [("html", html_a, None, 3)]
         + [("text", f"f{j}", None, 0) for j in range(4)]
         + [("html", html_b, None, 3)]),
    ]
    df = spark.createDataFrame(rows, schema="doc_id string, spans "
                               "array<struct<kind:string,text:string,"
                               "media_ref:string,offset:int>>")
    cfg = ExtractConfig(max_spans_per_chunk=4, normalize_unicode=False,
                        flatten_json=False)
    for engine in ("arrow", "catalyst"):
        got = {r["doc_id"]: r for r in
               extract(df, cfg, engine=engine, chunk=True).collect()}
        texts = [s["text"] for s in got["ties"]["spans_clean"]]
        assert texts == [f"tie {j}" for j in range(10)], engine
        assert got["titles"]["title"] == "alpha first", engine
        # offset tie at 3: html_a sits at array position 0 → wins
        assert got["titles-tied"]["title"] == "zeta last", engine
        unchunked = {r["doc_id"]: r for r in
                     extract(df, cfg, engine=engine, chunk=False).collect()}
        for d in got:
            assert got[d]["title"] == unchunked[d]["title"], (engine, d)
            assert [tuple(s) for s in got[d]["spans_clean"]] == \
                [tuple(s) for s in unchunked[d]["spans_clean"]], (engine, d)


def test_chunked_extract_single_scan_plan(spark):
    """The chunk path must scan its input exactly once: chunk rows are
    produced filter-free and both branches read ONE materialized
    protective exchange (ReusedExchange), so a non-deterministic input
    plan cannot lose or duplicate docs between branches."""
    df = fixture_df(spark, seed=7, n_docs=40)
    cfg = ExtractConfig(max_spans_per_chunk=4, normalize_unicode=False,
                        flatten_json=False)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = extract(df, cfg, engine="catalyst", chunk=True) \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1
    assert "ReusedExchange" in plan


def test_chunked_extract_nondeterministic_input_exactly_once(spark):
    """A genuinely non-deterministic input plan (rand-sized span arrays
    straddling the chunk threshold) still processes every doc exactly
    once — the old two-scan design could drop or duplicate docs whose
    size flipped between scans."""
    base = spark.range(120)
    size = (F.floor(F.rand() * 10) + 1).cast("int")  # 1..10, unseeded
    spans = F.transform(
        F.sequence(F.lit(0), size - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("t"), i.cast("string")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset")))
    df = base.select(F.concat(F.lit("d"), F.col("id").cast("string"))
                     .alias("doc_id"), spans.alias("spans"))
    cfg = ExtractConfig(max_spans_per_chunk=4, normalize_unicode=False,
                        flatten_json=False)
    out = extract(df, cfg, engine="catalyst", chunk=True).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == 120
    assert len(set(ids)) == 120
    assert all(r["success"] for r in out)


def test_pre_bucketed_job_matches_standard(spark, tmp_path):
    """A bucket-partitioned input (Iceberg bucketBy analog) with
    pre_bucketed=True must produce the identical committed dataset as the
    standard salted-exchange path — only the plan differs (no wide-row
    shuffle)."""
    from rag_document_parser_spark.corpus import spans_df_from_documents

    sf = "/root/testdata/sf0.001"
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    std = spans_df_from_documents(spark, sf)
    run_job(spark, std, a_dir, CFG, run_id="std")
    pre = spans_df_from_documents(spark, sf, bucket_for=CFG.n_buckets)
    run_job(spark, pre, b_dir, CFG, run_id="pre", pre_bucketed=True)

    da = spark.read.parquet(f"{a_dir}/data")
    db = spark.read.parquet(f"{b_dir}/data")
    ha = {(r.doc_id, r.doc_hash, r.bucket) for r in
          da.select("doc_id", "doc_hash", "bucket").collect()}
    hb = {(r.doc_id, r.doc_hash, r.bucket) for r in
          db.select("doc_id", "doc_hash", "bucket").collect()}
    assert ha == hb and len(ha) == 500
    # lineage checksums agree bucket-for-bucket
    la = {r.partition_id: (r.doc_count, r.checksum)
          for r in read_lineage(spark, a_dir).collect()}
    lb = {r.partition_id: (r.doc_count, r.checksum)
          for r in read_lineage(spark, b_dir).collect()}
    assert la == lb
    # and the pre-bucketed plan has no exchange after the span synthesis:
    # every bucket directory is written by a single aligned task
    import os
    buckets = [d for d in os.listdir(f"{b_dir}/data")
               if d.startswith("bucket=")]
    n_files = [len([f for f in os.listdir(f"{b_dir}/data/{d}")
                    if f.endswith(".parquet")]) for d in buckets]
    assert max(n_files) == 1
