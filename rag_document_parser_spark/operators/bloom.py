"""Bloom-filter membership: fixed-size set state for decontamination.

The exact decontamination pass (repetition.decontaminate) broadcasts the
eval set's distinct shingle STRINGS — fine for one benchmark suite, but
a deployment screening against many suites, blocklists, and previous
training runs wants membership state whose size is fixed by CHOICE, not
by the reference sets: a Bloom filter (Bloom 1970). K md5-derived bit
positions per item over an m-bit space; a candidate is "maybe present"
iff all K of its positions are set. No false negatives ever; false
positives at rate ~(1 - e^(-K*n/m))^K, documented per call site.

Spark shape:

- the filter is a DataFrame of SET POSITIONS (``pos`` long, <= m rows,
  distinct) — not a bitmap blob. That keeps it mergeable by plain UNION
  + distinct (union of Bloom filters with identical geometry IS the
  Bloom filter of the union), broadcastable (m = 2^16 default -> at
  most 65536 longs), and exactly replayable by the DuckDB oracle.
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


def _pos(term: Column, i: int, m_bits: int) -> Column:
    """i-th bit position in [0, m_bits): one salted md5 per hash
    function; the 60-bit value is non-negative so ``%`` agrees with
    DuckDB's."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"bloom-{i}:"), term)), 1, 15), 16, 10)
    return h.cast("long") % F.lit(m_bits)


def _pos_array(term: Column, m_bits: int, k: int) -> Column:
    # array_distinct: a term whose hash functions collide on one bit
    # needs that bit once, not twice — probe demand must match build
    return F.array_distinct(F.array(*[_pos(term, i, m_bits)
                                      for i in range(k)]))


def bloom_build(df: DataFrame, term_col: str = "term",
                m_bits: int = 1 << 16, k: int = BLOOM_K) -> DataFrame:
    """``(pos)`` — the filter's set bit positions, <= m_bits rows.

    One scan-local explode (k positions per item) and one distinct whose
    key domain is capped at m_bits: the exchange moves at most the
    filter, never the reference corpus. Filters with identical
    (m_bits, k) merge by ``unionByName(...).distinct()``.
    """
    probes = df.select(F.explode(
        _pos_array(F.col(term_col), m_bits, k)).alias("pos"))
    return probes.distinct()


def bloom_probe(df: DataFrame, bloom: DataFrame, term_col: str = "term",
                m_bits: int = 1 << 16, k: int = BLOOM_K) -> DataFrame:
    """``(term, maybe_present)`` for every distinct term in ``df``.

    The filter is the broadcast side (bounded by m_bits). ``_need`` is
    the term's distinct-position count (k minus self-collisions); the
    term passes iff every one of its positions is set. No false
    negatives: a term that was built in always finds all its bits.
    """
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
                        n: int = 3, m_bits: int = 1 << 16,
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

    Plan: eval shingles -> filter build (bounded exchange); corpus
    shingle TYPES probed once against the broadcast filter; the flagged
    types (bounded by eval size + FPR mass) broadcast back onto the
    per-doc shingle stream via left-semi. The corpus is never shuffled
    on the shingle key.
    """
    ev = (shingle_df(eval_df, text_col, id_col, n, drop_empty=True)
          .select(F.explode("shingles").alias("shingle")))
    bloom = bloom_build(ev, "shingle", m_bits, k)

    corp = shingle_df(corpus, text_col, id_col, n, drop_empty=True)
    sizes = corp.select("id", F.size("shingles").alias("n_sh"))
    flat = corp.select("id", F.explode("shingles").alias("shingle"))
    flagged = (bloom_probe(flat, bloom, "shingle", m_bits, k)
               .where(F.col("maybe_present"))
               .select(F.col("term").alias("shingle")))
    matched = (flat.join(F.broadcast(flagged), "shingle", "left_semi")
               .groupBy("id").agg(F.count("*").alias("n_matched")))
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
