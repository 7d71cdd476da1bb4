"""SemDeDup (cluster-scoped semantic dedup), mixture resampling, and
deterministic hash splits — each pinned against an independent pure-
Python simulation plus partition-invariance checks.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.sampling import (
    hash_split,
    resample_by_group,
)
from rag_document_parser_spark.operators.similarity import (
    semdedup,
    sum_left_fold,
)
from tests.conftest import SF_DIR


# ---------------------------------------------------------------- semdedup

def _sd_vectors():
    """Three direction families; ids 0..2 seed the deterministic coarse
    quantizer; ids 105/205 are exact clones of id 5 (a 3-clique), and
    103 clones id 3."""
    fams = [(1.0, 0.2, 0.0, 0.0), (0.0, 1.0, 0.0, 0.2),
            (0.2, 0.0, 0.0, 1.0)]
    rows = []
    vid = 0
    for rep in range(5):
        for base in fams:
            # members fan out along the unused dim 2 so within-family
            # cosines stay well under the dedup threshold (clones only)
            v = list(base)
            v[2] = 0.5 * rep
            rows.append((vid, v))
            vid += 1
    by_id = dict(rows)
    rows += [(103, list(by_id[3])), (105, list(by_id[5])),
             (205, list(by_id[5]))]
    return rows


def _simulate_semdedup(rows, n_centroids, threshold):
    """Pure-Python replay of the operator's exact arithmetic."""
    def unit_score(v, c):  # dot(v, c) / ||c||
        d = sum_left_fold([float(a) * float(b) for a, b in zip(v, c)])
        return d / math.sqrt(sum_left_fold([float(x) * float(x) for x in c]))

    def cos(a, b):
        d = sum_left_fold([float(x) * float(y) for x, y in zip(a, b)])
        na = math.sqrt(sum_left_fold([float(x) * float(x) for x in a]))
        nb = math.sqrt(sum_left_fold([float(y) * float(y) for y in b]))
        return d / (na * nb)

    cents = sorted((i, v) for i, v in rows if i < n_centroids)
    assign = {}
    for i, v in rows:
        scored = sorted(((-unit_score(v, c), cid) for cid, c in cents))
        assign[i] = scored[0][1]
    out = {}
    by_id = dict(rows)
    for i, v in rows:
        dups = [j for j, w in rows
                if j < i and assign[j] == assign[i]
                and cos(by_id[j], v) >= threshold]
        out[i] = (assign[i], not dups, min(dups) if dups else None)
    return out


def test_semdedup_matches_simulation_and_is_partition_invariant(spark):
    rows = _sd_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    want = _simulate_semdedup(rows, n_centroids=3, threshold=0.995)
    for part in (None, 7):
        src = df if part is None else df.repartition(part)
        got = {r["vec_id"]: (r["cid"], r["kept"], r["dup_of"])
               for r in semdedup(src, threshold=0.995,
                                 n_centroids=3).collect()}
        assert got == want
    # the planted clones are caught, with the clique minimum as keeper
    assert want[103] == (want[3][0], False, 3)
    assert want[105][1:] == (False, 5)
    assert want[205][1:] == (False, 5)  # clique min, not the chain prior
    assert want[5][1]  # the representative survives


def test_semdedup_excludes_degenerate_vectors(spark):
    rows = _sd_vectors() + [(300, None), (301, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ids = {r["vec_id"] for r in semdedup(df, n_centroids=3).collect()}
    assert 300 not in ids and 301 not in ids
    assert len(ids) == len(_sd_vectors())


def test_semdedup_empty_centroid_domain_raises_clearly(spark):
    df = spark.createDataFrame(
        [(1000, [1.0, 0.0]), (1001, [0.0, 1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="semdedup"):
        semdedup(df, n_centroids=4)


def test_semdedup_runaway_cluster_guard(spark):
    """An adversarial corpus where every vector lands in ONE cluster
    must raise BEFORE the quadratic join executes (the guard is an
    eager pre-join aggregate, so the ValueError surfaces from the
    semdedup() call itself), naming the runaway cluster and the knob."""
    # 40 near-identical directions -> all 40 assign to centroid 0;
    # 40*39/2 = 780 pairs > budget of 100
    rows = [(i, [1.0, 0.001 * i, 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_pair_budget"):
        semdedup(df, n_centroids=2, max_pair_budget=100)
    # same corpus under the budget: runs fine (and the default budget
    # never fires on well-clustered input)
    assert semdedup(df, n_centroids=2, max_pair_budget=1000).count() == 40
    ok = _sd_vectors()
    okdf = spark.createDataFrame(ok, "vec_id long, embedding array<double>")
    assert semdedup(okdf, n_centroids=3).count() == len(ok)
    # max_pair_budget=None disables the guard (fully lazy plan)
    assert semdedup(df, n_centroids=2,
                    max_pair_budget=None).count() == 40


def test_semdedup_on_driver_embeddings(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    clones = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    out = semdedup(emb.select("vec_id", "embedding").unionByName(clones),
                   threshold=0.999, n_centroids=16)
    dropped = {r["vec_id"]: r["dup_of"]
               for r in out.where(~F.col("kept")).collect()}
    # every clone is caught with its original as keeper (an original may
    # also fall to a genuine near-dup, hence >=)
    for i in range(10):
        assert dropped.get(100000 + i) is not None
    assert sum(1 for k in dropped if k >= 100000) == 10


# ------------------------------------------------------ resample_by_group

def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_resample_weights_zero_one_and_fractional(spark):
    docs = _docs(spark)
    n = {r["lang"]: r["n"] for r in
         docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = resample_by_group(
        docs, {"en": 2.5, "de": 0.0, "fr": 1.0}, "lang",
        salt="mix", default_weight=0.5)
    got = {r["lang"]: r["c"] for r in
           out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert "de" not in got                      # weight 0 drops the group
    assert got["en"] >= 2 * n["en"] and got["en"] <= 3 * n["en"]
    assert got["fr"] == n["fr"]                 # weight 1 = identity
    per_doc = out.where(F.col("lang") == "fr").groupBy("doc_id") \
        .agg(F.count("*").alias("c")).agg(F.max("c")).first()[0]
    assert per_doc == 1
    # unlisted groups take default_weight (0.5 → strict subset, one copy)
    for g in set(n) - {"en", "de", "fr"}:
        assert 0 < got[g] < n[g]
    # copy ordinals are 1..n_copies per row
    mm = out.where(F.col("lang") == "en").groupBy("doc_id").agg(
        F.min("copy").alias("lo"), F.max("copy").alias("hi"),
        F.count("*").alias("c")).collect()
    assert all(r["lo"] == 1 and r["hi"] == r["c"] and r["c"] in (2, 3)
               for r in mm)


def test_resample_partition_invariant_and_validates(spark):
    docs = _docs(spark)
    w = {"en": 1.7, "zh": 0.3}
    a = sorted((r["doc_id"], r["copy"]) for r in
               resample_by_group(docs, w, "lang", salt="s").collect())
    b = sorted((r["doc_id"], r["copy"]) for r in
               resample_by_group(docs.repartition(11), w, "lang",
                                 salt="s").collect())
    assert a == b and a
    with pytest.raises(ValueError):
        resample_by_group(docs, {"en": -0.5}, "lang")
    with pytest.raises(ValueError):
        resample_by_group(docs, {}, "lang", default_weight=-1.0)


# ------------------------------------------------------------- hash_split

def test_hash_split_disjoint_exhaustive_deterministic(spark):
    docs = _docs(spark)
    fr = {"train": 0.7, "val": 0.2, "test": 0.1}
    out = hash_split(docs, fr, salt="v1")
    n = docs.count()
    got = {r["split"]: r["c"] for r in
           out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(got.values()) == n and set(got) == set(fr)
    assert got["train"] > got["val"] > got["test"] > 0
    # split label matches the documented md5-prefix rule exactly
    bounds = [("train", 0.7), ("val", 0.9)]
    for r in out.select("doc_id", "split").limit(50).collect():
        h = hashlib.md5(f"{r['doc_id']}v1".encode()).hexdigest()[:8]
        want = "test"
        for name, cum in bounds:
            if h < format(int(cum * 16 ** 8), "08x"):
                want = name
                break
        assert r["split"] == want
    # stable under repartitioning
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted((r["doc_id"], r["split"]) for r in
               hash_split(docs.repartition(9), fr, salt="v1").collect())
    assert a == b


def test_resample_and_split_plans_are_scan_local(spark):
    """The scale contract: both ops are one codegen span over the scan —
    zero exchanges, one file scan (a resample of 100 TB costs one read
    pass; a regression here means a shuffle crept in)."""
    docs = _docs(spark)
    p1 = (resample_by_group(docs, {"en": 2.5}, "lang", salt="x")
          ._jdf.queryExecution().executedPlan().toString())
    assert p1.count("Exchange") == 0 and p1.count("FileScan") == 1
    p2 = (hash_split(docs, {"a": 0.5, "b": 0.5})
          ._jdf.queryExecution().executedPlan().toString())
    assert p2.count("Exchange") == 0 and p2.count("FileScan") == 1


def test_hash_split_validates_fractions(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError):
        hash_split(docs, {})
    assert hash_split(docs, {"all": 1.0}).where(
        F.col("split") != "all").count() == 0
