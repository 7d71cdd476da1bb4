"""Link graph construction and integer fixed-point PageRank.

Web-corpus curation weighs documents by the authority of where they
come from / what they cite (the classic crawl-prioritization signal).
This tier derives a weighted link graph from the corpus text and ranks
its nodes with PageRank — expressed the way an iterative graph
algorithm should look on Spark at 100 TB:

- the rank vector and every message are **integer fixed-point**
  (rank_e12, scale 10^12). Integer SUM is associative and
  order-free, so the per-iteration inflow aggregate is map-side
  combinable and needs no order pinning — unlike float PageRank, whose
  sum order is partition-dependent, this converges to the SAME bits on
  any cluster size, which is also what lets the DuckDB oracle replay
  it exactly (both engines floor positive integer division
  identically).
- each iteration is one equi-join of the edge relation with the rank
  vector (both keyed on the node id) plus one integer-sum groupBy on
  the destination — no windows, no collect_list, nothing holds a
  node's full neighborhood in memory.
- driver traffic per iteration is ONE scalar (the dangling mass);
  the rank vector itself never leaves the executors.
- edges and out-degrees are localCheckpointed once (they are loop
  invariants referenced every round), ranks per round (to cut the
  growing lineage) — the repo-standard discipline for driver-paced
  loops (see dedup.dedup_clusters).

The reference has no graph surface (it parses directories,
/root/reference/main.py:72-147); this is a SURVEY §6 scale-path tier
over the same corpus tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.urls import extract_urls, url_domain

__all__ = ["link_graph", "pagerank"]

SCALE = 10 ** 12


def _idiv(a: Column, b) -> Column:
    # IntegralDivide ("div"): exact integer division, truncating —
    # identical to DuckDB's // for the non-negative operands used here.
    # floor(a / b) over doubles would round-trip through IEEE and can
    # mis-floor near-integer quotients of large longs.
    return F.call_function("div", a, F.lit(b) if isinstance(b, int) else b)


def link_graph(df: DataFrame, text_col: str = "text",
               src_col: str = "source") -> DataFrame:
    """Weighted citation edges ``(src, dst, weight)``: one edge per
    (source, cited domain) with weight = number of citations.

    Scan-local extract + explode (outer + generated-attribute filter —
    the repo's InferFiltersFromGenerate discipline), then one map-side
    combinable count aggregate keyed on the edge."""
    ex = df.select(
        F.col(src_col).alias("src"),
        F.explode_outer(extract_urls(F.col(text_col))).alias("_url"),
    ).where(F.col("_url").isNotNull())
    return (ex.select("src", url_domain(F.col("_url")).alias("dst"))
            .where(F.col("dst") != "")
            .groupBy("src", "dst")
            .agg(F.count("*").alias("weight")))


def pagerank(edges: DataFrame, iters: int = 2, damping_pct: int = 85,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: str = "weight") -> DataFrame:
    """PageRank over a weighted directed graph, integer fixed-point.

    Returns ``(node, rank_e12)`` after ``iters`` synchronous
    iterations from the uniform start. Per iteration each node keeps
    ``(100 - damping_pct)%`` teleport mass plus its share of the
    dangling mass, and receives ``damping_pct%`` of each in-neighbor's
    rank split proportionally to edge weight:

        contrib = ((rank * damping_pct) // 100 * weight) // wout

    with every ``//`` an exact integer floor (both engines agree
    bitwise). Total mass stays <= 10^12 (floors only shed sub-ulp
    mass); ranks are comparable, not normalized probabilities.

    Weights must be positive integers (``link_graph`` guarantees it).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"),
                     F.col(weight_col).cast("long").alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge relation")
    out = e.groupBy("src").agg(F.sum("w").alias("wout"))
    # loop invariants, referenced every round — materialize once
    ej = e.join(out, "src").localCheckpoint()
    teleport_each = (SCALE * (100 - damping_pct) // 100) // n
    ranks = nodes.withColumn("rank", F.lit(SCALE // n))
    for _ in range(iters):
        ranks = ranks.localCheckpoint()
        dangling = (ranks.join(out.select(F.col("src").alias("node")),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0))).first()[0])
        dang_each = (int(dangling) * damping_pct // 100) // n
        inflow = (ej.join(ranks.withColumnRenamed("node", "src"), "src")
                  .select(F.col("dst").alias("node"),
                          _idiv(_idiv(F.col("rank") * damping_pct, 100)
                                * F.col("w"),
                                F.col("wout")).alias("_c"))
                  .groupBy("node").agg(F.sum("_c").alias("_in")))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(teleport_each + dang_each)
                          + F.coalesce(F.col("_in"), F.lit(0)))
                         .cast("long").alias("rank")))
    return ranks.select("node", F.col("rank").alias("rank_e12"))
