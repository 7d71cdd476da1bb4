"""Sequence packing: assign documents to fixed token-budget training
shards, deterministically and without a global sort.

The step after curation in a training-data pipeline: the curated corpus
must be cut into shards of ~budget tokens each (sequence packing /
shard manifests). A naive implementation sorts the whole corpus and
running-sums token counts — one total order, one task, dead at scale.

Design (the same topology as ``similarity.topk_per_query``):

1. every doc gets a deterministic md5 sort key and an md5-derived
   bucket (``n_buckets`` of them) — uniform by construction;
2. a window per BUCKET (partitionBy bucket, orderBy key) running-sums
   token counts: each bucket sorts only its own slice, in parallel;
3. ``shard = cum_before // budget`` — greedy first-fit in key order, so
   a shard may overshoot the budget by at most one document (the
   standard packing rule); shard ids are ``bucket:index`` pairs, stable
   under any input partitioning.

Everything is integer arithmetic (``div``, never float division) so
the DuckDB oracle reproduces assignments bitwise. Reproducible across
engines, runs, and cluster sizes: the keys derive only from doc ids.

No reference analog (the reference parses documents; it does not build
training shards) — this is a scale-path addition per SURVEY.md's
training-data operator mandate, same status as the sampling tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rag_document_parser_spark.operators.dedup import words


def _key(c, salt: str):
    return F.md5(F.concat(c.cast("string"), F.lit(salt)))


def pack_shards(df: DataFrame, token_budget: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 64, salt: str = "") -> DataFrame:
    """Assign each doc to a training shard of ~``token_budget`` tokens.

    Returns ``(id_col, bucket, shard, n_tokens, tok_offset)`` where
    ``shard`` is ``'<bucket>:<index>'``, ``n_tokens`` the doc's count
    of ``dedup.words()`` tokens (lowercased alphanumeric runs — the
    same tokenizer as the dedup/LM tiers, NOT raw whitespace splits)
    and ``tok_offset`` the running token offset
    of the doc inside its bucket's key order (the doc's start position
    when the shard's members are concatenated in that order).

    Shards are local to a bucket, so the only wide operation is the
    per-bucket window sort — ``n_buckets`` independent sorts of
    ~corpus/n_buckets rows each. At 10^12 docs raise ``n_buckets`` so a
    bucket fits a task; assignments for a given (id, salt, budget,
    n_buckets) never change.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive: {token_budget}")
    key = _key(F.col(id_col), salt)
    bucket = F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % n_buckets
    toks = F.size(words(F.col(text_col))).cast("long")
    staged = df.select(
        F.col(id_col), key.alias("_key"), bucket.alias("bucket"),
        toks.alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy("_key", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    offs = staged.select(id_col, "bucket", "n_tokens",
                         cum_before.alias("tok_offset"))
    # integer `div`, never float division: a double round-trip could
    # disagree with the DuckDB oracle's `//` on large offsets
    shard_idx = F.expr(f"tok_offset div {int(token_budget)}")
    return offs.select(
        id_col, "bucket",
        F.concat(F.col("bucket").cast("string"), F.lit(":"),
                 shard_idx.cast("string")).alias("shard"),
        "n_tokens", "tok_offset")


def pack_token_stream(df: DataFrame, seq_len: int,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_buckets: int = 64, salt: str = "") -> DataFrame:
    """Concatenate docs into a token stream and cut fixed-length
    sequences — the GPT-style packing manifest.

    ``pack_shards`` assigns whole documents to budgeted shards; LM
    pretraining instead concatenates documents back-to-back and cuts
    the stream at EXACT ``seq_len`` boundaries, letting documents
    straddle sequences. The loader then needs, per (sequence,
    document) intersection, where the document sits — that manifest is
    what this emits, and it is also exactly the information an
    attention mask that stops cross-document attention needs.

    Stream order is the same per-bucket md5 key order as
    ``pack_shards``: each bucket is an independent stream, so the only
    wide operation is the per-bucket window sort, and the layout for a
    given (id, salt, seq_len, n_buckets) never changes. A document at
    stream interval ``[off, off+n)`` intersects sequences
    ``off div L .. (off+n-1) div L``; one bounded explode (at most
    ``n div L + 1`` rows per doc) materializes the intersections, and
    every boundary column is integer arithmetic the DuckDB oracle
    reproduces bitwise.

    Returns ``(id_col, bucket, seq, seq_idx, tok_start_in_seq,
    tok_start_in_doc, n_tok)`` with ``seq = '<bucket>:<seq_idx>'``;
    ``tok_start_in_seq`` is the doc fragment's position inside the
    sequence, ``tok_start_in_doc`` how many of the doc's tokens
    precede the fragment. Zero-token docs occupy no stream positions
    and emit no rows (documented). Each bucket's final sequence is
    partial — training pads or drops it; the manifest states its true
    ``n_tok``.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    key = _key(F.col(id_col), salt)
    bucket = F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % n_buckets
    toks = F.size(words(F.col(text_col))).cast("long")
    staged = df.select(
        F.col(id_col), key.alias("_key"), bucket.alias("bucket"),
        toks.alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy("_key", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offs = staged.select(
        id_col, "bucket", "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")) \
        .where(F.col("n_tokens") > 0)
    L = int(seq_len)
    spans = offs.select(
        id_col, "bucket", "n_tokens", "off",
        F.explode(F.sequence(
            F.expr(f"off div {L}"),
            F.expr(f"(off + n_tokens - 1) div {L}"))).alias("seq_idx"))
    lo = F.greatest(F.col("off"), F.col("seq_idx") * L)
    hi = F.least(F.col("off") + F.col("n_tokens"),
                 (F.col("seq_idx") + 1) * L)
    return spans.select(
        id_col, "bucket",
        F.concat(F.col("bucket").cast("string"), F.lit(":"),
                 F.col("seq_idx").cast("string")).alias("seq"),
        F.col("seq_idx").cast("long").alias("seq_idx"),
        (lo - F.col("seq_idx") * L).cast("long").alias("tok_start_in_seq"),
        (lo - F.col("off")).cast("long").alias("tok_start_in_doc"),
        (hi - lo).cast("long").alias("n_tok"))


def shard_manifest(packed: DataFrame) -> DataFrame:
    """Per-shard totals: ``(shard, n_docs, n_tokens)`` — the manifest a
    training loader reads. One map-side-combinable aggregate."""
    return (packed.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens")))


def write_training_shards(df: DataFrame, out_dir: str, token_budget: int,
                          text_col: str = "text", id_col: str = "doc_id",
                          n_buckets: int = 64, salt: str = "") -> dict:
    """Materialize ``pack_shards`` as a loader-ready on-disk dataset.

    Layout under ``out_dir``:

    - ``data/bucket=<b>/...parquet`` — one partition directory per
      bucket, rows ``(id_col, shard, n_tokens, tok_offset, text_col)``
      sorted inside each file by ``(shard, tok_offset)`` so a loader
      streams a shard's documents in concatenation order with a plain
      sequential read (no shuffle, no sort at load time);
    - ``manifest/`` — ``(shard, n_docs, n_tokens)`` totals, the index a
      loader consults to schedule shards across workers.

    Scale shape: the only operations beyond ``pack_shards``'s
    per-bucket window are one join back to the text keyed on the
    uniform doc id (assignments project the text away; re-deriving
    them WITH the text would double-scan the corpus instead) and one
    ``repartition(bucket)`` so each task writes exactly one bucket
    directory. Raise ``n_buckets`` with corpus size — same rule as
    ``pack_shards`` — and the write stays one wave of uniform tasks.

    Returns summary totals read back from the manifest (small):
    ``{"n_docs", "n_shards", "total_tokens"}``.
    """
    import os

    packed = pack_shards(df, token_budget, text_col, id_col,
                         n_buckets, salt)
    rows = (packed.join(df.select(id_col, text_col), id_col)
            .repartition(F.col("bucket"))
            .sortWithinPartitions("bucket", "shard", "tok_offset"))
    (rows.write.mode("overwrite").partitionBy("bucket")
         .parquet(os.path.join(out_dir, "data")))
    spark = df.sparkSession
    # manifest from the WRITTEN data, not the plan: totals certify the
    # files a loader will actually read
    written = spark.read.parquet(os.path.join(out_dir, "data"))
    man = shard_manifest(written)
    man.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest"))
    tot = (spark.read.parquet(os.path.join(out_dir, "manifest"))
           .agg(F.sum("n_docs").alias("d"),
                F.count("*").alias("s"),
                F.sum("n_tokens").alias("t")).collect()[0])
    return {"n_docs": tot["d"], "n_shards": tot["s"],
            "total_tokens": tot["t"]}
