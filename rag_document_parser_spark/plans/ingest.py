"""Rolling snapshot ingest: the CommonCrawl-style accumulation loop.

A 100 TB corpus is not built in one batch — crawls land as snapshots,
and each must be deduplicated against EVERYTHING already accepted
without re-deduplicating the union from scratch. This plan composes
the pieces the operator tiers already provide into that loop:

1. ``dedup.dedup_against_index`` annotates the new snapshot against
   the persisted cumulative index (exact md5 + MinHash-LSH band keys;
   index side reduced to DISTINCT keys — no skew, no doc-vs-doc
   pairing).
2. Kept docs append to ``<dir>/docs/snapshot=<id>/`` (one directory
   per snapshot — the partition-valued layout an Iceberg table maps
   to an append snapshot commit).
3. The kept docs' OWN keys (``dedup.build_dedup_index``) append to
   ``<dir>/index/snapshot=<id>/`` so the next snapshot sees them.
4. One ledger row (``<dir>/ledger``) records the snapshot's counts —
   and makes the whole step IDEMPOTENT: re-running a committed
   snapshot id is a no-op skip, the ``plans.job`` resume contract at
   the snapshot granularity. A crash after docs/index but before the
   ledger re-runs the snapshot; both writes are per-snapshot-directory
   overwrites, so the retry replaces rather than duplicates. The index
   read EXCLUDES the in-flight snapshot's own partition — a crash
   after step 3 but before step 4 must not let the retry see the
   snapshot's own keys, or every doc would flag ``exact_dup`` against
   itself and the retry would commit an empty snapshot (on Iceberg
   this is the partition predicate ``snapshot != <id>`` pushed into
   the index scan; here, the equivalent directory exclusion).

Scale shape: every join in the loop is keyed by uniform md5/band keys;
the index grows by (1 + bands) short rows per ACCEPTED doc only; the
corpus is never re-scanned — each ingest touches the new snapshot plus
the distinct-key projection of the index. Store ``index`` bucketed by
``key`` (Iceberg bucketBy) and the annotate join becomes sort-merge
with no fresh index-side shuffle.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["ingest_snapshot", "read_ingest_ledger"]


def read_ingest_ledger(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The ingest ledger (empty frame with the right schema if absent)."""
    path = os.path.join(corpus_dir, "ledger")
    schema = ("snapshot_id string, n_in long, n_kept long, "
              "n_exact_dup long, n_near_dup long, wall_ms long, "
              "committed_at long")
    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path)


def ingest_snapshot(spark: SparkSession, new_docs: DataFrame,
                    corpus_dir: str, snapshot_id: str,
                    text_col: str = "text", id_col: str = "doc_id",
                    n: int = 3, k: int = 32, bands: int = 8) -> dict:
    """Ingest one snapshot into the rolling corpus at ``corpus_dir``.

    Returns ``{"snapshot_id", "skipped", "n_in", "n_kept",
    "n_exact_dup", "n_near_dup"}``. ``skipped=True`` means the ledger
    already holds this snapshot id and nothing was touched. The same
    (n, k, bands) must be used for every snapshot of a corpus — the
    ``dedup_against_index`` contract (mixing parameters silently finds
    nothing).
    """
    from rag_document_parser_spark.operators.dedup import (
        build_dedup_index, dedup_against_index)

    ledger = read_ingest_ledger(spark, corpus_dir)
    if ledger.where(F.col("snapshot_id") == snapshot_id).count() > 0:
        return {"snapshot_id": snapshot_id, "skipped": True,
                "n_in": 0, "n_kept": 0, "n_exact_dup": 0,
                "n_near_dup": 0}

    t0 = time.time()
    index_root = os.path.join(corpus_dir, "index")
    # Crash-window safety: a retry of an uncommitted snapshot must not
    # dedup the snapshot against its OWN keys (written on the crashed
    # attempt), so the in-flight partition is excluded by name. The
    # exclusion is exact (directory-name match, no partition-value
    # type inference) and lists only the snapshot directories — a
    # bounded, per-ingest driver listing, not a data scan.
    prior = []
    if os.path.isdir(index_root):
        prior = [os.path.join(index_root, name)
                 for name in sorted(os.listdir(index_root))
                 if name.startswith("snapshot=")
                 and name != f"snapshot={snapshot_id}"]
    if prior:
        index = spark.read.parquet(*prior)
    else:
        index = spark.createDataFrame([], "id string, kind string, "
                                          "key string")
    # stage the verdict once (id + three booleans per NEW doc — slim):
    # the counts aggregate, the kept-ids join, and nothing else re-run
    # the signature build + index join lineage
    verdict = dedup_against_index(new_docs, index, text_col, id_col,
                                  n, k, bands).localCheckpoint()
    counts = verdict.agg(
        F.count("*").alias("n_in"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum(F.col("exact_dup").cast("long")).alias("n_exact"),
        F.sum(F.col("near_dup").cast("long")).alias("n_near")).first()
    kept_ids = verdict.where(F.col("kept")).select(
        F.col("id").alias(id_col))
    kept = new_docs.join(kept_ids, id_col)

    # per-snapshot directories: overwrite-on-retry, append-by-layout
    docs_path = os.path.join(corpus_dir, "docs",
                             f"snapshot={snapshot_id}")
    kept.write.mode("overwrite").parquet(docs_path)
    kept_back = spark.read.parquet(docs_path)
    keys = build_dedup_index(kept_back, text_col, id_col, n, k, bands)
    keys.write.mode("overwrite").parquet(
        os.path.join(index_root, f"snapshot={snapshot_id}"))

    row = [(snapshot_id, int(counts["n_in"] or 0),
            int(counts["n_kept"] or 0), int(counts["n_exact"] or 0),
            int(counts["n_near"] or 0),
            int((time.time() - t0) * 1000), int(time.time()))]
    spark.createDataFrame(
        row, "snapshot_id string, n_in long, n_kept long, "
             "n_exact_dup long, n_near_dup long, wall_ms long, "
             "committed_at long"
    ).coalesce(1).write.mode("append").parquet(
        os.path.join(corpus_dir, "ledger"))
    return {"snapshot_id": snapshot_id, "skipped": False,
            "n_in": int(counts["n_in"] or 0),
            "n_kept": int(counts["n_kept"] or 0),
            "n_exact_dup": int(counts["n_exact"] or 0),
            "n_near_dup": int(counts["n_near"] or 0)}
