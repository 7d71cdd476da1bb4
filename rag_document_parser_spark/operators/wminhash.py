"""Weighted Jaccard dedup: tf-weighted shingle similarity, exact
pairs and weighted MinHash signatures — the similarity the unweighted
dedup tier structurally understates. Boilerplate-heavy near-dups
(templated pages whose BODY repeats but whose chrome differs) share
most shingle OCCURRENCES while sharing fewer distinct shingle TYPES;
weighted Jaccard J_w(A,B) = Σ_s min(w_A(s), w_B(s)) / Σ_s max(...)
over integer term frequencies scores occurrence mass, the measure the
SpotSigs / weighted-LSH literature (Ioffe 2010, "Improved Consistent
Sampling, Weighted Minhash and L1 Sketching") recommends for exactly
these corpora. The reference has no dedup tier at all
(/root/reference/main.py:72-147).

Integer-weight reduction instead of Ioffe's continuous CWS: with
frequencies clamped to ``max_weight``, expand each (shingle s, weight
w) into w replica elements (s,1)..(s,w); PLAIN Jaccard over the
replica multisets EQUALS weighted Jaccard over the clamped weights
(min(wa,wb) replicas collide, max(wa,wb) replicas union — the
classic exact reduction), so the proven unweighted MinHash machinery
(md5-affine permutations, mod 2^61−1, DuckDB-replicable) applies
verbatim to the replicas. Clamping is not a hack: per-doc repeat mass
beyond a small cap is exactly what ``repetition.py`` flags as its own
quality signal, and the cap bounds the expansion to ``max_weight ×``
the distinct-shingle count.

Scale shape: the weights come from SHUFFLE-FREE per-row run-length
counting over the sorted gram array (see ``weighted_shingle_counts``
— only distinct (id, shingle) rows ever explode; the naive
full-occurrence groupBy measured 6× slower and the fix 2.6× faster
end-to-end); signatures add one id-keyed aggregate. Exact pairs
reuse the ``ngram_jaccard_pairs`` skew discipline: distinct-doc df
count map-side, over-cap shingles removed by a broadcast anti-join
BEFORE the self-join, totals joined onto the (much smaller) pair
relation afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import (
    _md5_long, shingle_df)

__all__ = ["weighted_shingle_counts", "weighted_jaccard_pairs",
           "weighted_minhash_signatures"]

M31 = 2 ** 31 - 1


def weighted_shingle_counts(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            max_weight: int = 4,
                            stage: bool = True) -> DataFrame:
    """(id, shingle, w): per-doc shingle term frequencies clamped to
    ``max_weight`` — SHUFFLE-FREE run-length counting, not a groupBy.

    The naive form (explode every raw gram occurrence, aggregate on
    (id, shingle)) ships the FULL gram stream through an exchange —
    on a repetitive corpus that is tens of occurrences per distinct
    gram, measured 6× the distinct-gram path's cost. Instead the gram
    array sorts per row (JVM-side, O(g log g)), run starts mark where
    sorted neighbours differ, and ``zip_with`` over the start
    positions and their successors yields (gram, run-length) pairs —
    only DISTINCT (id, shingle) rows ever explode, and nothing
    shuffles inside this operator.

    ``stage=True`` localCheckpoints the ONE sorted-gram projection
    first. Load-bearing, not an optimization flag: the run-length
    lambdas index the sorted array per element, and CollapseProject
    happily inlines the sort+gram chain into every lambda element
    (measured: 29 ``array_sort`` copies in the optimized plan, an
    O(g²·log g)-per-row blowup — the same SPARK-36718 trap
    ``shingle_df`` documents, here beyond what projection staging can
    prevent because the references sit INSIDE lambda bodies). After
    the barrier every downstream reference is a concrete attribute
    read. On a real cluster substitute a persist; ``stage=False`` is
    for plan inspection only."""
    sh = shingle_df(df, text_col, id_col, n, distinct=False,
                    drop_empty=True)
    sel = sh.select("id", F.array_sort("shingles").alias("g"))
    if stage:
        sel = sel.localCheckpoint()
    starts = F.filter(
        F.sequence(F.lit(1), F.size("g")),
        lambda i: (i == 1) | (F.element_at("g", i)
                              != F.element_at("g", i - 1)))
    st = sel.select("id", "g", starts.alias("st"))
    nexts = F.transform(
        F.sequence(F.lit(1), F.size("st")),
        lambda i: F.when(i < F.size("st"),
                         F.element_at("st", (i + 1).cast("int")))
        .otherwise(F.size("g") + 1))
    runs = st.select(
        "id",
        F.zip_with("st", nexts.alias("nx"),
                   lambda a, b: F.struct(
                       F.element_at("g", a.cast("int"))
                       .alias("shingle"),
                       F.least(b - a, F.lit(max_weight)).cast("long")
                       .alias("w"))).alias("rw"))
    return (runs.select("id", F.explode("rw").alias("r"))
            .select("id", F.col("r.shingle").alias("shingle"),
                    F.col("r.w").alias("w")))


def weighted_jaccard_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           threshold_e6: int = 500_000,
                           max_weight: int = 4,
                           df_cap: int = 1000) -> DataFrame:
    """Exact weighted-Jaccard pairs ≥ ``threshold_e6`` (fixed point,
    per million): ``(id_a, id_b, inter_w, tot_a, tot_b,
    wjaccard_e6)`` with ``inter_w = Σ min(w_a, w_b)`` over shared
    shingles and ``wjaccard_e6 = 10^6·inter_w div (tot_a + tot_b −
    inter_w)`` — the min/max identity Σmax = tot_a + tot_b − Σmin
    makes one equi-join on shared shingles sufficient; disjoint docs
    score 0 and are never materialized."""
    ws = weighted_shingle_counts(df, text_col, id_col, n, max_weight)
    ws = ws.localCheckpoint()  # three consumers below; stage once
    over_cap = (ws.groupBy("shingle")
                .agg(F.count("*").alias("df"))
                .where(F.col("df") > df_cap)
                .select("shingle"))
    flat = ws.join(F.broadcast(over_cap), "shingle", "left_anti")
    tots = ws.groupBy("id").agg(F.sum("w").cast("long").alias("tot"))
    a = flat.select("shingle", F.col("id").alias("id_a"),
                    F.col("w").alias("w_a"))
    b = flat.select("shingle", F.col("id").alias("id_b"),
                    F.col("w").alias("w_b"))
    inter = (a.join(b, "shingle")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.sum(F.least("w_a", "w_b")).cast("long")
                  .alias("inter_w")))
    return (inter
            .join(tots.withColumnsRenamed(
                {"id": "id_a", "tot": "tot_a"}), "id_a")
            .join(tots.withColumnsRenamed(
                {"id": "id_b", "tot": "tot_b"}), "id_b")
            .select("id_a", "id_b", "inter_w", "tot_a", "tot_b",
                    F.expr("inter_w * 1000000 div "
                           "(tot_a + tot_b - inter_w)")
                    .cast("long").alias("wjaccard_e6"))
            .where(F.col("wjaccard_e6") >= int(threshold_e6)))


def _replica_hash(shingle: Column, r: Column) -> Column:
    """Base hash of replica (shingle, r) — 31-bit, md5-derived."""
    return F.pmod(_md5_long(F.concat(shingle, F.lit("#"),
                                     r.cast("string"))), F.lit(M31))


def weighted_minhash_signatures(df: DataFrame, text_col: str = "text",
                                id_col: str = "doc_id", n: int = 3,
                                k: int = 16,
                                max_weight: int = 4) -> DataFrame:
    """k-permutation MinHash over the replica expansion: ``(id,
    signature)`` where signature[i] = min over replicas (s, 1..w) of
    ``(a_i·h(s,r) + b_i) mod (2^31−1)``. Pr[sig_a[i] = sig_b[i]] =
    weighted Jaccard of the clamped tf vectors — the banded-LSH and
    recall machinery of the unweighted tier applies unchanged.

    The modulus choice is load-bearing: with 31-bit base hashes the
    affine map must wrap MANY times to scramble the order. Mod 2^31−1
    (Mersenne prime) the product a·h wraps ~2^31 times inside int64;
    a 61-bit modulus with int64-safe 31-bit multipliers wraps at most
    ONCE, leaving the "permutation" near-monotone in h — every slot
    then picks nearly the same argmin element and the collision rate
    collapses toward 0/1 instead of estimating J_w (observed: 0.34 on
    a planted J_w = 0.774 pair; 0.78 under this scheme — the unit
    test pins the unbiased behavior).

    Replica hashes are computed AFTER the (id, shingle) aggregate, so
    md5 runs ``Σ min(tf, max_weight)`` times per doc — never once per
    raw occurrence — and the k affine permutations reuse each replica
    hash. One id-keyed aggregate produces the signature row."""
    ws = weighted_shingle_counts(df, text_col, id_col, n, max_weight)
    reps = ws.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.col("w").cast("int")),
            lambda r: _replica_hash(F.col("shingle"), r)))
        .alias("h"))
    aggs = []
    for i in range(k):
        a = F.pmod(_md5_long(F.lit(f"wminhash-a-{i}")),
                   F.lit(M31 - 1)) + 1
        b = F.pmod(_md5_long(F.lit(f"wminhash-b-{i}")), F.lit(M31))
        aggs.append(F.min(F.pmod(a * F.col("h") + b, F.lit(M31)))
                    .cast("long").alias(f"mh_{i}"))
    return (reps.groupBy("id").agg(*aggs)
            .select("id", F.array(*[f"mh_{i}" for i in range(k)])
                    .alias("signature")))
