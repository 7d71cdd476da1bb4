"""Deterministic sampling operators (operators/sampling.py)."""

import pyspark.sql.functions as F
import pytest

from rag_document_parser_spark.operators import sampling as SAM
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(r[0] for r in
               SAM.hash_sample(docs, 0.3, salt="t").select("doc_id").collect())
    b = sorted(r[0] for r in
               SAM.hash_sample(docs.repartition(13), 0.3, salt="t")
               .select("doc_id").collect())
    assert a == b and len(a) > 0
    n = docs.count()
    # 32 digest bits: observed rate within a loose binomial envelope
    assert 0.15 * n < len(a) < 0.45 * n


def test_hash_sample_salts_are_independent_draws(spark):
    docs = _docs(spark)
    a = {r[0] for r in SAM.hash_sample(docs, 0.3, salt="t1")
         .select("doc_id").collect()}
    b = {r[0] for r in SAM.hash_sample(docs, 0.3, salt="t2")
         .select("doc_id").collect()}
    assert a != b  # fresh digest bits per salt


def test_hash_sample_rate_bounds(spark):
    docs = _docs(spark)
    assert SAM.hash_sample(docs, 0.0).count() == 0
    assert SAM.hash_sample(docs, 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        SAM.hash_sample(docs, 1.5)


def test_stratified_sample_exact_quota_and_two_stage_parity(spark):
    docs = _docs(spark)
    out = SAM.stratified_sample(docs, k=5, strata_col="lang", salt="q")
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(5, n) for lang, n in sizes.items()}
    # parity with the naive single-window draw, regardless of partitioning
    naive = docs.withColumn("_k", SAM.sample_key(F.col("doc_id"), "q"))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(F.asc("_k"), F.asc("doc_id"))
    want = {(r["lang"], r["doc_id"], r["rk"]) for r in
            naive.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 5).collect()}
    got = {(r["lang"], r["doc_id"], r["sample_rank"]) for r in
           SAM.stratified_sample(docs.repartition(17), k=5,
                                 strata_col="lang", salt="q").collect()}
    assert got == want


def test_stratified_sample_skew_plan_shape(spark):
    """Adversarial skew: one stratum holds 99% of rows. The two-stage
    rank must never materialize that stratum in one task. Plan shape:
    (a) the first window's exchange salts the stratum key with the
    source partition id, so the hot stratum spreads across tasks;
    (b) a PARTIAL WindowGroupLimit sits BELOW that exchange — every map
    task prunes to k rows per (stratum, pid) group before anything
    shuffles, so no task buffer ever holds more than k rows per group
    regardless of stratum size (the window-buffer straggler a plain
    count()-over-stratum plan would create)."""
    import re
    rows = [(i, "cold" if i % 100 == 0 else "hot") for i in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string").repartition(8)
    out = SAM.stratified_sample(df, k=4, strata_col="lang", salt="sk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    salted = re.search(r"Exchange hashpartitioning\(lang#\d+, _pid#\d+",
                       plan)
    assert salted, plan
    partial = re.search(
        r"WindowGroupLimit \[lang#\d+, _pid#\d+\].*?row_number\(\), 4, "
        r"Partial", plan)
    assert partial, plan
    # the map-side prune sits BELOW (after, in top-down plan text) the
    # salted exchange: pruning happens before the shuffle
    assert partial.start() > salted.start(), plan
    # and the quotas are still exact under the skew
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"hot": 4, "cold": 4}


def test_weighted_sample_proportional_and_deterministic(spark):
    import hashlib

    rows = [(i, 1000 if i < 20 else 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = SAM.weighted_sample(df, k=30, weight_col="w", salt="t")
    got = [(r["doc_id"], r["sample_rank"]) for r in out.collect()]
    assert len(got) == 30
    assert sorted(r for _, r in got) == list(range(1, 31))

    # python twin: priority = md5_60bit(key||salt) // max(w, 1)
    def prio(i, w):
        u = int(hashlib.md5(f"{i}t".encode()).hexdigest()[:15], 16)
        return (u // max(w, 1), i)

    want = sorted(prio(i, w) for i, w in rows)[:30]
    assert sorted(i for i, _ in got) == sorted(i for _, i in want)

    # the 20 heavy rows are 10% of rows but 95% of the mass: they must
    # dominate the draw
    heavy = sum(1 for i, _ in got if i < 20)
    assert heavy >= 15, heavy

    # re-run under a different partitioning -> identical selection
    out2 = SAM.weighted_sample(df.repartition(13), k=30,
                               weight_col="w", salt="t")
    assert sorted((r["doc_id"], r["sample_rank"])
                  for r in out2.collect()) == sorted(got)


def test_weighted_sample_zero_weight_floored_not_divzero(spark):
    df = spark.createDataFrame([(1, 0), (2, -5), (3, 100)],
                               "doc_id long, w long")
    out = SAM.weighted_sample(df, k=3, weight_col="w")
    assert out.count() == 3  # no division error, everyone races


def test_weighted_sample_validates(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with pytest.raises(ValueError):
        SAM.weighted_sample(df, k=0, weight_col="w")


# ---------------------------------------------------------------------------
# leakage-safe split
# ---------------------------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_leakage_safe_split_keeps_clusters_together(spark):
    docs = _docs(spark).select("doc_id", "text")
    # chain 0-1-2 plus pair (10, 11): all of a component must co-locate
    pairs = _pairs(spark, [(0, 1), (1, 2), (10, 11)])
    out = SAM.leakage_safe_split(docs, pairs, {"train": 0.5, "val": 0.5},
                                 salt="lk")
    rows = {r["doc_id"]: (r["split_rep"], r["split"])
            for r in out.collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[10] == rows[11]
    assert rows[0][0] == 0 and rows[10][0] == 10  # min-id representative
    # non-paired docs keep their own key -> identical to plain hash_split
    plain = {r["doc_id"]: r["split"]
             for r in SAM.hash_split(docs, {"train": 0.5, "val": 0.5},
                                     salt="lk").collect()}
    for d, (rep, split) in rows.items():
        if d not in (0, 1, 2, 10, 11):
            assert rep == d and split == plain[d]


def test_leakage_safe_split_no_pair_straddles_splits(spark):
    docs = _docs(spark).select("doc_id", "text")
    edges = [(i, i + 1) for i in range(0, 40, 2)]
    pairs = _pairs(spark, edges)
    out = SAM.leakage_safe_split(
        docs, pairs, {"train": 0.7, "val": 0.2, "test": 0.1}, salt="lk2")
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(split_of[a] == split_of[b] for a, b in edges)
    assert set(split_of.values()) <= {"train", "val", "test"}
    assert len(split_of) == docs.count()  # exhaustive, no dup rows


def test_global_shuffle_deterministic_and_partition_invariant(spark):
    docs = _docs(spark).select("doc_id")
    a = {(r["doc_id"]): (r["shard"], r["pos"]) for r in
         SAM.global_shuffle(docs, n_shards=8, salt="g").collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in
         SAM.global_shuffle(docs.repartition(13), n_shards=8,
                            salt="g").collect()}
    assert a == b and len(a) == docs.count()
    # every shard's positions are exactly 1..|shard| (a total order)
    by_shard: dict[int, list[int]] = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) <= set(range(8))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # hash sharding is uniform: no shard dominates
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] < 3 * max(sizes[0], 1)


def test_global_shuffle_curriculum_orders_within_shard(spark):
    docs = _docs(spark).select("doc_id", "n_chars")
    out = SAM.global_shuffle(docs, n_shards=4, salt="c",
                             curriculum_col="n_chars").collect()
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["n_chars"]))
    for rows in by_shard.values():
        chars = [c for _, c in sorted(rows)]
        assert chars == sorted(chars, reverse=True)
    with pytest.raises(ValueError):
        SAM.global_shuffle(docs, n_shards=0)
