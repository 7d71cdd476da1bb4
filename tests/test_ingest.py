"""Rolling snapshot ingest (plans/ingest.py): cross-snapshot dedup
against the cumulative index, per-snapshot idempotency, ledger counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.plans import (
    ingest_snapshot,
    read_ingest_ledger,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_rolling_ingest_dedups_across_snapshots(spark, tmp_path):
    d = str(tmp_path / "corpus")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "naps in the warm afternoon sun beside the river")
    snap_a = _docs(spark, [
        ("a1", base),
        ("a2", "completely different text about tidal energy farms"),
        ("a3", "a third unique document mentioning glaciers")])
    r1 = ingest_snapshot(spark, snap_a, d, "2026-01")
    assert not r1["skipped"]
    assert (r1["n_in"], r1["n_kept"]) == (3, 3)   # empty index: all kept

    snap_b = _docs(spark, [
        ("b1", base),                              # exact dup of a1
        ("b2", base + " extra trailing clause"),   # near dup of a1
        ("b3", "a brand new document on fermentation chemistry")])
    r2 = ingest_snapshot(spark, snap_b, d, "2026-02")
    assert (r2["n_in"], r2["n_kept"]) == (3, 1)
    assert r2["n_exact_dup"] == 1 and r2["n_near_dup"] >= 1

    docs = spark.read.parquet(d + "/docs")
    assert sorted(r["doc_id"] for r in docs.collect()) == \
        ["a1", "a2", "a3", "b3"]


def test_reingest_same_snapshot_is_noop(spark, tmp_path):
    d = str(tmp_path / "corpus")
    snap = _docs(spark, [("x1", "some text here"), ("x2", "other text")])
    r1 = ingest_snapshot(spark, snap, d, "s1")
    assert not r1["skipped"] and r1["n_kept"] == 2
    r2 = ingest_snapshot(spark, snap, d, "s1")
    assert r2["skipped"]
    # ledger holds exactly one committed row; docs not duplicated
    ledger = read_ingest_ledger(spark, d)
    assert ledger.where(F.col("snapshot_id") == "s1").count() == 1
    assert spark.read.parquet(d + "/docs").count() == 2


def test_within_snapshot_dups_survive_to_intra_batch_pass(spark, tmp_path):
    """dedup_against_index screens against PRIOR snapshots only; two
    copies arriving in the SAME snapshot both pass (the intra-batch
    exact/near dedup tiers own that case) — but the NEXT snapshot sees
    their keys."""
    d = str(tmp_path / "corpus")
    dup = "identical payload inside one snapshot"
    r1 = ingest_snapshot(
        spark, _docs(spark, [("y1", dup), ("y2", dup)]), d, "s1")
    assert r1["n_kept"] == 2
    r2 = ingest_snapshot(spark, _docs(spark, [("y3", dup)]), d, "s2")
    assert r2["n_kept"] == 0 and r2["n_exact_dup"] == 1


def test_crash_before_ledger_retry_keeps_the_snapshot(spark, tmp_path):
    """ADVICE r4 (medium): a crash AFTER index/snapshot=<id> is written
    but BEFORE the ledger commit must not make the retry dedup the
    snapshot against its own keys — that would flag every doc as its
    own exact dup and overwrite docs/snapshot=<id> with zero rows."""
    import shutil

    d = str(tmp_path / "corpus")
    snap_a = _docs(spark, [("a1", "an established document about rivers")])
    ingest_snapshot(spark, snap_a, d, "s1")

    snap_b = _docs(spark, [
        ("b1", "a genuinely new document on kite aerodynamics"),
        ("b2", "another new document describing salt marsh ecology")])
    r_first = ingest_snapshot(spark, snap_b, d, "s2")
    assert r_first["n_kept"] == 2

    # Simulate the crash window: s2's docs + index partitions exist,
    # but its ledger row does not (strip it and rewrite the ledger).
    survivors = [tuple(r) for r in read_ingest_ledger(spark, d)
                 .where(F.col("snapshot_id") != "s2").collect()]
    shutil.rmtree(d + "/ledger")
    spark.createDataFrame(
        survivors, "snapshot_id string, n_in long, n_kept long, "
                   "n_exact_dup long, n_near_dup long, wall_ms long, "
                   "committed_at long"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/ledger")

    r_retry = ingest_snapshot(spark, snap_b, d, "s2")
    assert not r_retry["skipped"]
    assert (r_retry["n_in"], r_retry["n_kept"],
            r_retry["n_exact_dup"]) == (2, 2, 0)
    docs = spark.read.parquet(d + "/docs")
    assert sorted(r["doc_id"] for r in docs.collect()) == \
        ["a1", "b1", "b2"]
    # and a THIRD snapshot still sees s2's keys as prior index
    r3 = ingest_snapshot(spark, _docs(
        spark, [("c1", "a genuinely new document on kite aerodynamics")]),
        d, "s3")
    assert r3["n_exact_dup"] == 1 and r3["n_kept"] == 0
