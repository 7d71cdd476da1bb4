"""Merkle integrity rollup (operators/integrity.py): partition
invariance of the commutative leaf fold, tamper/add/drop detection,
single-path localization of a mutated bucket, static tree shape with
empty buckets, pure-Python twin parity, and the corpus-scale plan
shape (one aggregate; the tree fold never shuffles the corpus)."""

import hashlib

import pytest

from pyspark.sql import functions as F

from rag_document_parser_spark.operators import integrity as IG

DOCS = [(str(i), f"document body number {i} with words") for i in range(40)]


def _u60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _twin_tree(docs, n_buckets=16, salt="mk"):
    xors = {}
    for d, t in docs:
        b = _u60(d + salt) % n_buckets
        xors[b] = xors.get(b, 0) ^ _u60(d + "\x1f" + t)
    nodes = {}
    depth = n_buckets.bit_length() - 1
    for b in range(n_buckets):
        nodes[(depth, b)] = hashlib.md5(
            str(xors.get(b, 0)).encode()).hexdigest()
    for lvl in range(depth - 1, -1, -1):
        for i in range(2 ** lvl):
            nodes[(lvl, i)] = hashlib.md5(
                (nodes[(lvl + 1, 2 * i)]
                 + nodes[(lvl + 1, 2 * i + 1)]).encode()).hexdigest()
    return nodes


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_tree_matches_twin(spark, corpus):
    got = {(r.level, r.idx): r.node_hash for r in
           IG.merkle_tree(IG.leaf_checksums(corpus), 16).collect()}
    assert got == _twin_tree(DOCS)
    assert len(got) == 31  # 16 + 8 + 4 + 2 + 1, empty buckets included


def test_root_partition_invariant(spark, corpus):
    r1 = IG.merkle_root(corpus).collect()[0].root_hash
    r2 = IG.merkle_root(corpus.repartition(7)).collect()[0].root_hash
    r3 = IG.merkle_root(corpus.orderBy(F.col("doc_id").desc())) \
        .collect()[0].root_hash
    assert r1 == r2 == r3


def test_mutation_addition_drop_all_detected(spark, corpus):
    root = IG.merkle_root(corpus).collect()[0].root_hash
    mut = corpus.withColumn(
        "text", F.when(F.col("doc_id") == "7", F.lit("tampered"))
        .otherwise(F.col("text")))
    added = corpus.unionByName(
        spark.createDataFrame([("99x", "extra")], ["doc_id", "text"]))
    dropped = corpus.where(F.col("doc_id") != "3")
    for bad in (mut, added, dropped):
        assert IG.merkle_root(bad).collect()[0].root_hash != root


def test_divergence_localizes_to_one_path(spark, corpus):
    t1 = {(r.level, r.idx): r.node_hash for r in
          IG.merkle_tree(IG.leaf_checksums(corpus), 16).collect()}
    mut = corpus.withColumn(
        "text", F.when(F.col("doc_id") == "7", F.lit("tampered"))
        .otherwise(F.col("text")))
    t2 = {(r.level, r.idx): r.node_hash for r in
          IG.merkle_tree(IG.leaf_checksums(mut), 16).collect()}
    diff = sorted(k for k in t1 if t1[k] != t2[k])
    # exactly one node per level, each the parent of the next
    assert [lvl for lvl, _ in diff] == [0, 1, 2, 3, 4]
    for (la, ia), (lb, ib) in zip(diff, diff[1:]):
        assert ib // 2 == ia
    leaf_b = _u60("7mk") % 16
    assert diff[-1] == (4, leaf_b)


def test_power_of_two_required(spark, corpus):
    with pytest.raises(ValueError):
        IG.merkle_tree(IG.leaf_checksums(corpus, n_buckets=12), 12)


def test_corpus_scale_plan_is_one_aggregate(spark, corpus):
    """leaf_checksums is the only corpus-scale stage: the scan feeds
    a partial (map-side) bit_xor before any Exchange, and the frame
    join broadcasts."""
    plan = IG.leaf_checksums(corpus) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.index("Exchange") < plan.index("partial_bit_xor"), plan


# ---- training-order certificate -----------------------------------------

def test_order_certificate_detects_swaps(spark):
    from rag_document_parser_spark.operators.integrity import (
        order_certificate)
    base = spark.createDataFrame(
        [(f"d{i}", i % 3, i // 3) for i in range(12)],
        "doc_id string, shard int, pos int")
    a = {r["shard"]: (r["n_rows"], r["order_digest"])
         for r in order_certificate(base).collect()}
    # same rows, two positions swapped inside shard 0
    swapped = spark.createDataFrame(
        [(f"d{i}",
          i % 3,
          (3 if i == 0 else 0 if i == 3 else i // 3))
         for i in range(12)],
        "doc_id string, shard int, pos int")
    b = {r["shard"]: (r["n_rows"], r["order_digest"])
         for r in order_certificate(swapped).collect()}
    assert a[0] != b[0]                     # order change -> new digest
    assert a[1] == b[1] and a[2] == b[2]    # untouched shards agree
    # re-materialization on another partitioning certifies identical
    c = {r["shard"]: (r["n_rows"], r["order_digest"])
         for r in order_certificate(base.repartition(7)).collect()}
    assert a == c
