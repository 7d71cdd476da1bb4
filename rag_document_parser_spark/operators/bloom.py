"""Bloom-filter membership: fixed-size set state for decontamination.

The exact decontamination pass (repetition.decontaminate) broadcasts the
eval set's distinct shingle STRINGS — fine for one benchmark suite, but
a deployment screening against many suites, blocklists, and previous
training runs wants membership state whose size is fixed by CHOICE, not
by the reference sets: a Bloom filter (Bloom 1970). K bit positions per
item — disjoint 15-bit fields of one md5-60bit digest, so the whole
probe costs ONE digest per item — over an m-bit space; a candidate is
"maybe present" iff all K of its positions are set. No false negatives ever; false
positives at rate ~(1 - e^(-K*n/m))^K, documented per call site.

Spark shape:

- the filter is a DataFrame of SET POSITIONS (``pos`` long, <= m rows,
  distinct) — not a bitmap blob. That keeps it mergeable by plain UNION
  + distinct (union of Bloom filters with identical geometry IS the
  Bloom filter of the union), broadcastable (m = 2^15 default -> at
  most 32768 longs), and exactly replayable by the DuckDB oracle.
- ``bloom_probe`` probes candidate TYPES: the K probe positions are
  generated scan-local as one array, de-duplicated per term (two hash
  functions landing on the same bit must not demand two hits), exploded
  and broadcast-joined. The corpus never shuffles on the term key.
- ``bloom_decontaminate`` mirrors repetition.decontaminate's output
  contract but in pure integers (``contam_e6``), with the Bloom set as
  the only state that crosses the cluster.

Hashing is the repo-wide md5-60bit scheme (engine-portable, no salt
collision with cms-/hll- prefixes). The reference has no membership
surface (per-file dispatch, /root/reference/main.py:72-147); this is a
SURVEY §6 scale-path tier beside repetition.decontaminate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import shingle_df

__all__ = ["BLOOM_K", "bloom_build", "bloom_decontaminate", "bloom_probe"]

BLOOM_K = 4


def _hash60(term: Column) -> Column:
    return F.conv(F.substring(
        F.md5(F.concat(F.lit("bloom:"), term)), 1, 15), 16, 10
    ).cast("long")


def _pos(h: Column, i: int, m_bits: int) -> Column:
    """i-th bit position in [0, m_bits): disjoint 15-bit fields of ONE
    60-bit md5 — k independent-enough hash functions for the price of a
    single digest evaluation per item (the per-hash-salted-md5 scheme
    this replaces benched 4x the CPU on the corpus shingle stream).
    Requires m_bits <= 2^15 and k <= 4; all operands non-negative so
    ``>>`` / ``%`` agree with DuckDB's."""
    return F.shiftright(h, 15 * i) % F.lit(m_bits)


def _check_geometry(m_bits: int, k: int) -> None:
    if not (0 < m_bits <= (1 << 15)) or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of 2 <= 2^15, got {m_bits}")
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in 1..4 (15-bit digest fields), got {k}")


def _pos_array(term: Column, m_bits: int, k: int) -> Column:
    # array_distinct: a term whose hash fields collide on one bit
    # needs that bit once, not twice — probe demand must match build
    h = _hash60(term)
    return F.array_distinct(F.array(*[_pos(h, i, m_bits)
                                      for i in range(k)]))


def bloom_build(df: DataFrame, term_col: str = "term",
                m_bits: int = 1 << 15, k: int = BLOOM_K) -> DataFrame:
    """``(pos)`` — the filter's set bit positions, <= m_bits rows.

    One scan-local explode (k positions per item) and one distinct whose
    key domain is capped at m_bits: the exchange moves at most the
    filter, never the reference corpus. Filters with identical
    (m_bits, k) merge by ``unionByName(...).distinct()``.
    """
    _check_geometry(m_bits, k)
    probes = df.select(F.explode(
        _pos_array(F.col(term_col), m_bits, k)).alias("pos"))
    return probes.distinct()


def bloom_probe(df: DataFrame, bloom: DataFrame, term_col: str = "term",
                m_bits: int = 1 << 15, k: int = BLOOM_K) -> DataFrame:
    """``(term, maybe_present)`` for every distinct term in ``df``.

    The filter is the broadcast side (bounded by m_bits). ``_need`` is
    the term's distinct-position count (k minus self-collisions); the
    term passes iff every one of its positions is set. No false
    negatives: a term that was built in always finds all its bits.

    For BOUNDED candidate sets (dashboards, audits): the distinct +
    per-term aggregate shuffle on the term key. Corpus-sized streams
    must use the semi-join-chain plan in ``bloom_decontaminate``, which
    never shuffles the probe side.
    """
    _check_geometry(m_bits, k)
    terms = df.select(F.col(term_col).alias("term")).distinct()
    arr = _pos_array(F.col("term"), m_bits, k)
    staged = terms.select("term", arr.alias("_pos"),
                          F.size(arr).alias("_need"))
    pr = staged.select("term", "_need", F.explode("_pos").alias("pos"))
    hit = pr.join(F.broadcast(bloom.withColumn("_hit", F.lit(1))),
                  "pos", "left")
    agg = (hit.groupBy("term", "_need")
           .agg(F.coalesce(F.sum("_hit"), F.lit(0)).alias("_got")))
    return agg.select(
        "term", (F.col("_got") == F.col("_need")).alias("maybe_present"))


def bloom_decontaminate(corpus: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, m_bits: int = 1 << 15,
                        k: int = BLOOM_K,
                        threshold_e6: int = 500_000) -> DataFrame:
    """Benchmark decontamination against a Bloom filter of the eval
    set's word n-gram shingles: ``(id, n_sh, n_matched, contam_e6,
    contaminated)`` per corpus doc with >= 1 shingle.

    Differences vs the exact pass (repetition.decontaminate): state is
    the fixed-size position set instead of the eval shingle strings, and
    ``n_matched`` counts MAYBE-hits — an overcount by the false-positive
    rate (~(1 - e^(-k*n_ev/m))^k), never an undercount, which is the
    safe direction for contamination screening. All arithmetic integer
    (``contam_e6 = n_matched * 10^6 div n_sh``).

    Plan: eval shingles -> filter build (bounded exchange); then the
    per-doc shingle stream passes through a CHAIN OF K BROADCAST
    LEFT-SEMI JOINS, one per hash function — a row survives iff every
    one of its positions is set, which is exactly the all-k membership
    conjunction. BroadcastHashJoins never shuffle their probe side, so
    the corpus is never shuffled, never distinct-ed, and never grouped
    on the shingle key (an earlier formulation that probed distinct
    shingle TYPES paid two vocabulary-wide exchanges and benched 12x
    slower than the exact pass at sf0.1 — the opposite of this
    module's point). Self-colliding hash functions are naturally fine:
    both conjuncts test the same set bit.
    """
    _check_geometry(m_bits, k)
    # eval side built hash-first with the same transform-then-explode
    # shape as the corpus side (same trap), deriving the identical
    # positions bloom_build would; localCheckpoint (the bpe/pagerank
    # discipline) materializes the filter once so the k broadcasts
    # below don't each re-execute the build subplan.
    ev_h = (shingle_df(eval_df, text_col, id_col, n, drop_empty=True)
            .select(F.explode(F.transform(
                "shingles", lambda s: _hash60(s))).alias("_h")))
    pos_arr = F.array_distinct(F.array(*[
        _pos(F.col("_h"), i, m_bits) for i in range(k)]))
    bloom = (ev_h.select(F.explode(pos_arr).alias("pos")).distinct()
             .localCheckpoint())

    corp = shingle_df(corpus, text_col, id_col, n, drop_empty=True)
    sizes = corp.select("id", F.size("shingles").alias("n_sh"))
    # hash INSIDE the transform, BEFORE the explode: exploding the
    # staged `shingles` alias directly re-inlines the tokenizer into
    # the per-gram lambda (the shingle_df SPARK-36718 trap — measured
    # 40 s vs 1.6 s at sf0.1); transform-then-explode keeps the
    # tokenizer evaluated once per doc and ships only the 60-bit hash
    cand = corp.select("id", F.explode(F.transform(
        "shingles", lambda s: _hash60(s))).alias("_h"))
    for i in range(k):
        cand = cand.join(
            F.broadcast(bloom.select(F.col("pos").alias("_b"))),
            _pos(F.col("_h"), i, m_bits) == F.col("_b"), "left_semi")
    matched = cand.groupBy("id").agg(F.count("*").alias("n_matched"))
    out = (sizes.join(matched, "id", "left")
           .select("id", "n_sh",
                   F.coalesce("n_matched", F.lit(0)).cast("long")
                   .alias("n_matched")))
    contam = F.call_function(
        "div", F.col("n_matched") * F.lit(10 ** 6), F.col("n_sh"))
    return out.select(
        "id", F.col("n_sh").cast("long"), "n_matched",
        contam.alias("contam_e6"),
        (contam >= F.lit(threshold_e6)).cast("long").alias("contaminated"))
