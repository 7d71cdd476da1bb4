"""Incremental extraction via Structured Streaming (SURVEY.md §2.6).

The reference has no stream engine; its closest behaviors are background
batch jobs with progress counters and idempotent re-runs
(/root/reference/api_server.py:230-348). The batch job in ``plans.job``
covers that contract with lineage + resume; this module adds the genuinely
streaming form for corpora that GROW: a file-source stream over the
documents directory, the same Arrow kernel per micro-batch, exactly-once
file tracking via the streaming checkpoint.

Design notes:
- ``availableNow`` trigger = "drain everything new, then stop" — the
  idiomatic incremental-batch pattern; re-invoking processes only files
  added since the last run (the checkpoint is the file ledger).
- the kernel runs with ``chunk=False``: giant-doc chunking reassembles via
  groupBy, which append-mode streaming disallows without watermarks, and a
  streaming micro-batch is already size-bounded by ``maxFilesPerTrigger``.
- ``stream_extract_with_lineage`` uses ``foreachBatch`` to reuse the exact
  batch write path (bucket dirs + lineage rows) per micro-batch — each
  micro-batch commit is the streaming analog of one resumable batch run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from rag_document_parser_spark.config import DEFAULT_CONFIG, ExtractConfig
from rag_document_parser_spark.plans.job import bucket_col, doc_hash_col, extract
from rag_document_parser_spark.schema import INPUT_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """File-source stream → Arrow kernel → parquet sink. Returns the query.

    Exactly-once per input file: the checkpoint under
    ``<output_dir>/_checkpoint`` records processed files, so a second
    invocation only extracts files added in between.
    """
    reader = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    out = extract(stream, cfg, engine="arrow", chunk=False)
    writer = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_dedup_unbounded(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
):
    """Incremental extraction with UNBOUNDED stateful cross-batch dedup.

    .. warning:: state grows with distinct corpus size — one state-store
       row per distinct content hash, forever. At web scale this variant
       OOMs the state store by design; it exists for bounded replays and
       tests. Use ``stream_extract_dedup`` (watermark-bounded, the
       default) for anything long-running.

    ``dropDuplicates`` on the content hash uses the streaming state store:
    a doc whose cleaned content was already emitted in ANY earlier
    micro-batch (even a previous invocation — state lives in the
    checkpoint) is dropped, keyed on the order-sensitive doc_hash. This is
    the streaming form of ``operators.dedup.exact_dedup`` keep-first
    semantics.
    """
    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    out = extract(stream, cfg, engine="arrow", chunk=False)
    deduped = (
        out.withColumn(
            "doc_hash",
            F.xxhash64(F.col("spans_clean")))  # content only: clones under
        .dropDuplicates(["doc_hash"])          # new doc_ids still dedupe
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_extract_dedup_bounded(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    watermark: str = "1 hour",
):
    """Incremental extraction with WATERMARK-BOUNDED stateful dedup.

    The production-shaped variant (and what the unsuffixed
    ``stream_extract_dedup`` name points at): input rows
    carry an ``ingest_ts`` event-time column; ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` keep a content-hash state row only
    until the watermark passes it, so state size is bounded by the dedup
    window's arrival volume instead of growing with distinct corpus size
    (the scale-killer of the unbounded form). Consequence by design: a
    duplicate arriving more than ``watermark`` after its original is
    re-emitted — exactly the documented semantics of
    dropDuplicatesWithinWatermark.

    Dedup runs BEFORE the kernel (hash of the raw span array): dropping a
    duplicate after extracting it would waste the extraction work, and
    xxhash64 of the nested array costs far less than the kernel.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        list(INPUT_SCHEMA.fields)
        + [T.StructField("ingest_ts", T.TimestampType())])
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = (
        stream.withColumn("doc_hash", F.xxhash64("spans"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["doc_hash"])
    )
    out = extract(deduped.select("doc_id", "spans"), cfg,
                  engine="arrow", chunk=False)
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# The unsuffixed name is the production-shaped (state-bounded) variant:
# reaching for the short name must never silently opt into unbounded state.
stream_extract_dedup = stream_extract_dedup_bounded


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    watermark: str = "1 hour",
    min_words: int = 5,
    max_words: int = 100_000,
    min_alpha_ratio: float = 0.1,
):
    """Incremental curation: the streamable subset of ``plans.curate``.

    watermark-bounded exact dedup (before the kernel — duplicates never
    pay extraction) → Arrow kernel → quality gate → PII scrub, emitting
    ``(doc_id, n_pii, content)`` survivors per
    micro-batch. Quality and PII are row-local (stateless, append-safe);
    the corpus-level passes (boilerplate strip, cross-batch exact/near
    dedup beyond the watermark window) are inherently batch — run
    ``plans.curate`` over the accumulated sink periodically for those.
    """
    from pyspark.sql import types as T

    from rag_document_parser_spark.operators.pii import PII_RULES, redact_pii
    from rag_document_parser_spark.operators.textstats import quality_exprs

    schema = T.StructType(
        list(INPUT_SCHEMA.fields)
        + [T.StructField("ingest_ts", T.TimestampType())])
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = (
        stream.withColumn("doc_hash", F.xxhash64("spans"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["doc_hash"])
    )
    out = extract(deduped.select("doc_id", "spans"), cfg,
                  engine="arrow", chunk=False)
    doc = out.select(
        "doc_id", "route", "title", "success",
        F.array_join(F.col("spans_clean").getField("text"), "\n\n")
        .alias("content"))
    q = quality_exprs(F.col("content"))
    gated = doc.where(
        F.col("success") & q["n_words"].between(min_words, max_words)
        & (q["alpha_ratio"] >= min_alpha_ratio))
    red = redact_pii(gated.select("doc_id", "content"), text_col="content")
    n_pii = sum(F.col(f"n_{name}") for name, _, _ in PII_RULES)
    final = red.select("doc_id", n_pii.cast("long").alias("n_pii"),
                       F.col("redacted").alias("content"))
    return (
        final.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window aggregation over a growing events table.

    The late-data pattern the reference lacks entirely: events stream in
    by file, are bucketed into event-time windows, and rows later than
    ``watermark`` behind the max seen event time are dropped while closed
    windows are finalized to the sink (append mode only emits a window
    once the watermark passes it — exactly-once per window). Schema:
    (event_id long, ts timestamp, user_id long, event_type string,
    value double) — the driver ``events`` table shape.
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.floor(F.col("value") * 100)).cast("long")
             .alias("sum_value_cents"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value_cents")
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_shard_progress(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    n_shards: int = 16,
):
    """Custom stateful operator via ``applyInPandasWithState``: per-shard
    RUNNING totals across micro-batches (the A14 batch-progress ledger as
    live streaming state).

    Documents shard by ``pmod(xxhash64(doc_id), n_shards)`` — the same
    deterministic keying as the batch job's buckets — and each shard
    keeps (total_docs, total_spans) in the state store. Every micro-batch
    emits one row per touched shard with the batch delta AND the
    cumulative totals; state survives restarts through the checkpoint, so
    a later invocation continues the counts. This is the
    arbitrary-stateful form the built-in dropDuplicates/window aggs can't
    express: monotone cross-batch accumulators with custom update logic.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("shard", T.IntegerType()),
        T.StructField("batch_docs", T.LongType()),
        T.StructField("batch_spans", T.LongType()),
        T.StructField("total_docs", T.LongType()),
        T.StructField("total_spans", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("total_docs", T.LongType()),
        T.StructField("total_spans", T.LongType()),
    ])

    def update(key, pdfs, state):
        docs = 0
        spans = 0
        for pdf in pdfs:
            docs += len(pdf)
            spans += int(pdf["n_spans"].sum())
        if state.exists:
            (td, ts) = state.get
        else:
            td, ts = 0, 0
        td, ts = td + docs, ts + spans
        state.update((td, ts))
        import pandas as pd

        yield pd.DataFrame({"shard": [key[0]], "batch_docs": [docs],
                            "batch_spans": [spans], "total_docs": [td],
                            "total_spans": [ts]})

    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    staged = stream.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")
        .alias("shard"),
        F.coalesce(F.size("spans"), F.lit(0)).cast("long").alias("n_spans"))
    counted = staged.groupBy("shard").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
    return (
        counted.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_extract_with_lineage(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
):
    """Same stream, but each micro-batch commits through the batch write
    path: bucket-partitioned data + per-bucket lineage rows tagged with the
    micro-batch id (the ST1 progress ledger, queryable as a table)."""

    data_path = os.path.join(output_dir, "data")
    lineage_path = os.path.join(output_dir, "lineage")

    def commit_batch(batch_df, batch_id: int) -> None:
        out = (batch_df
               .withColumn("doc_hash", doc_hash_col())
               .withColumn("bucket", bucket_col(cfg.n_buckets)))
        out.persist()
        try:
            out.write.mode("append").partitionBy("bucket").parquet(data_path)
            (out.groupBy(F.col("bucket").alias("partition_id"))
             .agg(F.count("*").alias("doc_count"),
                  F.lower(F.hex(F.bit_xor("doc_hash"))).alias("checksum"),
                  (F.sum("wall_us") / 1000).cast("long").alias("wall_ms"))
             .withColumn("run_id", F.concat(F.lit("stream-"), F.lit(batch_id)))
             .write.mode("append").parquet(lineage_path))
        finally:
            out.unpersist()

    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    out = extract(stream, cfg, engine="arrow", chunk=False)
    return (
        out.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_token_sketch(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    max_files_per_trigger: int = 1,
):
    """Running HyperLogLog distinct-token registers over a growing
    documents directory — the streaming face of the sketch tier.

    Each micro-batch computes its own per-language register table
    (64 rows/language, operators/sketches.hll_registers) and MAX-merges
    it into the persisted state at ``output_dir/registers`` — the HLL
    merge law (test_hll_registers_merge_by_max) is what makes the
    accumulated state equal the registers of everything ever streamed,
    regardless of batch boundaries. State is fixed-size by construction
    (registers, never tokens), so the driver-side rewrite per batch is
    O(languages × 64) rows — the one case where collecting is the
    design, not a shortcut. ``availableNow`` + ``maxFilesPerTrigger``
    drains the backlog in bounded batches and stops.
    """
    from pyspark.sql import types as T

    from rag_document_parser_spark.operators.dedup import words
    from rag_document_parser_spark.operators.sketches import hll_registers

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    state_path = os.path.join(output_dir, "registers")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))

    def merge_batch(batch_df, _batch_id):
        toks = batch_df.select(
            "lang", F.explode(words(F.col("text"))).alias("term"))
        regs = hll_registers(toks, group_cols=("lang",))
        if os.path.isdir(state_path):
            prev = spark.read.parquet(state_path)
            regs = (prev.unionByName(regs)
                    .groupBy("lang", "bucket").agg(F.max("rho").alias("rho")))
        # registers are the fixed-size state: materialize driver-side
        # (<= 64 x languages rows) and rewrite, so the overwrite never
        # races the read of the same path
        rows = regs.collect()
        if rows:
            spark.createDataFrame(rows, regs.schema).coalesce(1) \
                .write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    gap_s: int = 60,
    late_s: int = 10,
):
    """Streaming gap-based sessionization — the live form of
    ``operators.events.sessionize`` via ``applyInPandasWithState`` with
    an EVENT-TIME timeout.

    Each entity's open session lives in the state store as
    ``(start_us, last_us, n_events)``. A micro-batch's events are
    folded in event-time order: an event within ``gap_s`` of the open
    session's last event extends it; a larger gap CLOSES the session
    (one output row, ``closed_by='gap'``) and opens a new one. When the
    watermark passes ``last_us + gap_s`` the open session can never be
    extended by an admissible event again, so the event-time timeout
    fires and emits it (``closed_by='timeout'``) — the streaming
    guarantee the batch operator gets for free by seeing all data.
    Late events beyond ``late_s`` are dropped by the watermark, which
    is what makes emitted sessions FINAL (exactly-once session rows
    across restarts via the checkpoint).

    Scale shape: state is one fixed-size tuple per entity with an open
    session — closed sessions leave the store immediately, and the
    timeout GC bounds it to entities active within the last
    ``gap_s + late_s``. The only shuffle keys on the entity, same as
    the batch plan; the straggler bound (max events per entity per
    micro-batch) and its cure (upstream per-entity capping, never
    salting) are the batch operator's, documented there.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    events_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ])
    gap_us = gap_s * 1_000_000

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            st, la, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]], "session_start_us": [st],
                "session_end_us": [la], "n_events": [n],
                "closed_by": ["timeout"]})
            return
        ts: list[int] = []
        for pdf in pdfs:
            # normalize to µs regardless of the batch's datetime unit
            ts.extend(pdf["ts"].values.astype("datetime64[us]")
                      .astype("int64").tolist())
        if not ts:
            return
        ts.sort()
        st, la, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if st is None:
                st, la, n = t, t, 1
            elif t - la > gap_us:
                closed.append((st, la, n))
                st, la, n = t, t, 1
            else:
                # out-of-order within the watermark merges into the
                # open session (start may move earlier)
                st, la, n = min(st, t), max(la, t), n + 1
        state.update((st, la, n))
        # timeout must sit strictly past the current watermark
        state.setTimeoutTimestamp(
            max(la // 1000 + gap_s * 1000,
                state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "closed_by": ["gap"] * len(closed)})

    stream = (spark.readStream.schema(events_schema).parquet(input_dir)
              .withWatermark("ts", f"{late_s} seconds")
              .select("user_id", "ts"))
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
    return (
        sessions.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_group_mass(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    group_col: str = "lang",
    size_col: str = "n_chars",
    max_files_per_trigger: int = 1,
):
    """Running per-group corpus mass over a growing documents directory
    — the streaming face of the mixture tier.

    Each micro-batch aggregates to its own ``(group, n_docs, mass)``
    table and SUM-merges it into the persisted state at
    ``output_dir/mass`` (counts and masses are plain sums, so the
    merged state equals a batch aggregate over everything ever
    streamed, regardless of batch boundaries — the same merge-law
    argument as ``stream_token_sketch``'s MAX-merge). Feeding the state
    to ``operators.mixture.weights_from_mass`` then yields EXACTLY the
    tempered shares a batch ``temperature_weights`` would compute over
    the full corpus — the test pins that equality. State is
    |groups| rows; the driver-side rewrite per batch is the one case
    where collecting is the design, not a shortcut.
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    state_path = os.path.join(output_dir, "mass")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))

    def merge_batch(batch_df, _batch_id):
        per = (batch_df.groupBy(F.col(group_col).alias("group"))
               .agg(F.count("*").alias("n_docs"),
                    F.sum(F.col(size_col)).cast("long").alias("mass")))
        if os.path.isdir(state_path):
            prev = spark.read.parquet(state_path)
            per = (prev.unionByName(per)
                   .groupBy("group")
                   .agg(F.sum("n_docs").alias("n_docs"),
                        F.sum("mass").alias("mass")))
        rows = per.collect()
        if rows:
            spark.createDataFrame(rows, per.schema).coalesce(1) \
                .write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_integrity_ledger(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    n_buckets: int = 16,
):
    """Streaming face of ``operators.integrity``: per-bucket CUMULATIVE
    bit_xor digests across micro-batches via ``applyInPandasWithState``.

    Rows hash and bucket exactly like the batch ``leaf_checksums``
    (md5-60 of ``doc_id || 0x1f || payload``, md5 bucket of doc_id), and
    xor is commutative — so once a stream has drained a corpus, each
    bucket's cumulative digest (and its md5 ``node_hash``) EQUALS the
    batch leaf digest of the same rows, regardless of how the files were
    split across micro-batches or runs (the unit test pins this
    stream/batch agreement). Each batch emits the touched buckets with
    batch deltas and the running digest; re-invoking continues from the
    checkpointed state, making this a live integrity ledger for a
    growing corpus.

    The expensive work (md5, json render) runs JVM-side in the
    pre-shuffle projection; the stateful Python op only folds int64
    xors per bucket — one vectorized reduce per batch-group.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("idx", T.LongType()),
        T.StructField("batch_docs", T.LongType()),
        T.StructField("total_docs", T.LongType()),
        T.StructField("xor_digest", T.LongType()),
        T.StructField("node_hash", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("total_docs", T.LongType()),
        T.StructField("xor_digest", T.LongType()),
    ])

    def update(key, pdfs, state):
        import hashlib

        import numpy as np
        import pandas as pd

        docs, x = 0, 0
        for pdf in pdfs:
            docs += len(pdf)
            if len(pdf):
                x ^= int(np.bitwise_xor.reduce(
                    pdf["h"].to_numpy(dtype="int64")))
        td, tx = state.get if state.exists else (0, 0)
        td, tx = td + docs, tx ^ x
        state.update((td, tx))
        yield pd.DataFrame({
            "idx": [key[0]], "batch_docs": [docs], "total_docs": [td],
            "xor_digest": [tx],
            "node_hash": [hashlib.md5(str(tx).encode()).hexdigest()]})

    u60 = ("cast(conv(substring(md5({c}), 1, 15), 16, 10) as long)")
    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    staged = stream.select(
        F.expr(u60.format(c="concat(doc_id, 'mk')"))
        .__mod__(n_buckets).cast("long").alias("idx"),
        F.expr(u60.format(
            c="concat(doc_id, '\\u001f', to_json(spans))")).alias("h"))
    ledger = staged.groupBy("idx").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
    return (
        ledger.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "data"))
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_bloom_state(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    n: int = 3,
    m_bits: int = 1 << 15,
):
    """Streaming face of the Bloom decontamination filter: the eval
    set GROWS (new benchmarks land over time), so the filter's set-bit
    positions are maintained incrementally — each micro-batch builds
    the batch's shingle Bloom and UNION-DISTINCT-merges it into the
    persisted state at ``output_dir/bloom`` (the merge law
    ``bloom_build`` documents: filters with identical geometry merge
    by union). Bit-setting is idempotent and commutative, so after
    draining any split of the eval corpus the state EQUALS the batch
    ``bloom_build`` over everything ever streamed (test-pinned), and
    ``bloom_decontaminate``'s broadcast-semi-join chain can read the
    state table directly in place of a freshly built filter.

    State is bounded by ``m_bits`` rows regardless of how much eval
    data ever streams — the property that makes the Bloom form the
    right cross-batch decontamination state (the exact shingle-string
    state grows with the eval corpus; cf. the bounded/unbounded dedup
    split at ``stream_extract_dedup``).
    """
    from rag_document_parser_spark.operators.bloom import bloom_build
    from rag_document_parser_spark.operators.dedup import word_shingles

    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    state_path = os.path.join(output_dir, "bloom")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(input_dir))

    def merge_batch(batch_df, _batch_id):
        sh = batch_df.select(
            F.explode(word_shingles(F.col("text"), n)).alias("term"))
        delta = bloom_build(sh, m_bits=m_bits)
        if os.path.isdir(state_path):
            prev = spark.read.parquet(state_path)
            delta = prev.unionByName(delta).distinct()
        rows = delta.collect()
        if rows:
            spark.createDataFrame(rows, delta.schema).coalesce(1) \
                .write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_source_sketch(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    k: int = 128,
):
    """Streaming face of the KMV source-overlap sketches: each
    micro-batch computes its per-source bottom-k content-hash sketch
    (``corpstats.source_sketch``) and union-merges it into the state
    at ``output_dir/sketch`` via ``merge_source_sketches`` — the KMV
    merge law (bottom-k of a union equals bottom-k of the union of
    bottom-ks) makes the accumulated state EQUAL the batch sketch of
    everything ever streamed, regardless of batch boundaries
    (test-pinned). ``corpstats.overlap_from_sketches`` reads the state
    directly for the pairwise Jaccard matrix.

    State is bounded by sources × k rows forever — like the HLL
    registers and the Bloom bits, the sketch (not the corpus) is the
    state, which is what makes driver-side rewrite per batch the
    design rather than a shortcut.
    """
    from rag_document_parser_spark.operators.corpstats import (
        merge_source_sketches, source_sketch)

    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    state_path = os.path.join(output_dir, "sketch")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(input_dir))

    def merge_batch(batch_df, _batch_id):
        delta = source_sketch(batch_df, k=k)
        if os.path.isdir(state_path):
            prev = spark.read.parquet(state_path)
            delta = merge_source_sketches(prev, delta, k=k)
        rows = delta.collect()
        if rows:
            spark.createDataFrame(rows, delta.schema).coalesce(1) \
                .write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def stream_recrawl_state(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    id_col: str = "url_id",
    ts_col: str = "ts",
    changed_col: str = "changed",
    max_files_per_trigger: int = 1,
):
    """Running per-URL fetch-history state over a growing fetch log —
    the streaming face of ``operators.frontier.recrawl_schedule``.

    The batch operator's per-entity quantities ``(n_obs, n_changed,
    first_us, last_us)`` are algebraic (sum/sum/min/max), so each
    micro-batch's partial merges into the persisted state at
    ``output_dir/state`` by the same laws — the merged state equals a
    batch aggregate over every fetch ever streamed regardless of batch
    boundaries (the ``stream_group_mass`` merge-law argument).
    ``recrawl_from_state`` then applies the identical closed-form
    interval arithmetic, so the streamed schedule is bit-equal to
    batch ``recrawl_schedule`` on the union — the test pins it. State
    is |urls| fixed-width rows.
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(ts_col, T.TimestampType()),
        T.StructField(changed_col, T.BooleanType()),
    ])
    state_path = os.path.join(output_dir, "state")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))

    def merge_batch(batch_df, _batch_id):
        per = (batch_df.select(
            F.col(id_col).alias("url_id"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
            F.col(changed_col).cast("long").alias("_ch"))
            .groupBy("url_id")
            .agg(F.count("*").alias("n_obs"),
                 F.sum("_ch").alias("n_changed"),
                 F.min("_us").alias("first_us"),
                 F.max("_us").alias("last_us")))
        if os.path.isdir(state_path):
            prev = spark.read.parquet(state_path)
            per = (prev.unionByName(per)
                   .groupBy("url_id")
                   .agg(F.sum("n_obs").alias("n_obs"),
                        F.sum("n_changed").alias("n_changed"),
                        F.min("first_us").alias("first_us"),
                        F.max("last_us").alias("last_us")))
        rows = per.collect()
        if rows:
            spark.createDataFrame(rows, per.schema).coalesce(1) \
                .write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def recrawl_from_state(spark: SparkSession, output_dir: str,
                       min_interval_s: int = 3600,
                       max_interval_s: int = 30 * 86_400):
    """The schedule implied by ``stream_recrawl_state``'s persisted
    state — the same closed form as the batch operator, so streamed ≡
    batch on identical fetch history."""
    lo = int(min_interval_s) * 1_000_000
    hi = int(max_interval_s) * 1_000_000
    st = spark.read.parquet(os.path.join(output_dir, "state"))
    raw = F.expr("(last_us - first_us) div nullif(n_changed, 0)")
    interval = F.when(
        (F.col("n_obs") < 2) | (F.col("n_changed") == 0), F.lit(hi)
    ).otherwise(F.least(F.greatest(raw, F.lit(lo)), F.lit(hi)))
    return st.select("url_id",
                     F.col("n_obs").cast("long").alias("n_obs"),
                     F.col("n_changed").cast("long").alias("n_changed"),
                     interval.cast("long").alias("interval_us"),
                     (F.col("last_us") + interval).cast("long")
                     .alias("next_fetch_us"))
