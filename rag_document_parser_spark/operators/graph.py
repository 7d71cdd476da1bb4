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

from pyspark.sql import Column, DataFrame, Window, functions as F

from rag_document_parser_spark.operators.urls import extract_urls, url_domain

__all__ = ["anchor_edges", "anchor_stats", "hits", "label_propagation", "trustrank",
           "link_graph",
           "pagerank"]

# RE2-safe (no lookaround/backrefs) and identical in Java regex and
# DuckDB's RE2: href value and anchor body from conservative char
# classes. Shared verbatim with the oracle.
ANCHOR_PATTERN = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'

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


def anchor_edges(df: DataFrame, text_col: str = "text",
                 src_col: str = "source") -> DataFrame:
    """``(src, dst, anchor)`` triples from ``<a href="...">text</a>``
    markup — the raw material of an anchor-text corpus (what a crawl
    pipeline aggregates per TARGET page: the web's human-written
    description of every URL it links to).

    Scan-local: two parallel group extractions over the same pattern
    (match order is identical, so zipping them pairs href with its own
    anchor body), one explode, no shuffle. ``dst`` is the lower-cased
    host; anchors are trimmed and empties dropped (an image link has no
    text to contribute).
    """
    hrefs = F.regexp_extract_all(F.col(text_col), F.lit(ANCHOR_PATTERN), 1)
    bodies = F.regexp_extract_all(F.col(text_col), F.lit(ANCHOR_PATTERN), 2)
    ex = df.select(
        F.col(src_col).alias("src"),
        F.explode_outer(F.arrays_zip(hrefs.alias("u"), bodies.alias("a")))
         .alias("_p"),
    ).where(F.col("_p").isNotNull())
    return (ex.select("src",
                      url_domain(F.col("_p.u")).alias("dst"),
                      F.trim(F.col("_p.a")).alias("anchor"))
            .where((F.col("dst") != "") & (F.col("anchor") != "")))


def anchor_stats(edges: DataFrame) -> DataFrame:
    """Per-target anchor profile: ``(dst, n_links, n_unique_anchors,
    top_anchor, top_cnt)``.

    The first aggregate collapses the corpus onto (dst, anchor) TYPES —
    map-side combinable, so a mega-popular target (every crawl has one)
    arrives at the reduce side already partial-summed. The window that
    picks the top anchor then ranks anchor TYPES within a dst, bounded
    by the target's distinct-anchor vocabulary, never by its raw link
    count. Ties break by ascending anchor text, keeping the pick
    deterministic on any partitioning.
    """
    by_anchor = (edges.groupBy("dst", "anchor")
                 .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    ranked = by_anchor.withColumn("_r", F.row_number().over(w))
    totals = (by_anchor.groupBy("dst")
              .agg(F.sum("cnt").alias("n_links"),
                   F.count("*").alias("n_unique_anchors")))
    top = (ranked.where(F.col("_r") == 1)
           .select("dst", F.col("anchor").alias("top_anchor"),
                   F.col("cnt").alias("top_cnt")))
    return totals.join(top, "dst")


def hits(edges: DataFrame, iters: int = 2, src_col: str = "src",
         dst_col: str = "dst", weight_col: str = "weight") -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), integer fixed-point.

    PageRank ranks by global random-walk mass; HITS separates the two
    roles a curation pipeline actually routes on — directory pages that
    LINK to good content (hubs: crawl-frontier seeds) vs pages good
    content links TO (authorities: keep/boost targets). Per synchronous
    iteration, with ``w`` the edge weight:

        auth_raw(v) = Σ_{u→v} hub(u)·w,   auth = auth_raw·SCALE div max
        hub_raw(u)  = Σ_{u→v} auth(v)·w,  hub  = hub_raw·SCALE div max

    Max-normalization replaces the classic L2 norm — a square root is
    not expressible in exact integer arithmetic, and dividing by the
    max preserves the ranking order while keeping every score in
    [0, SCALE]. All sums are integer (order-free, map-side combinable:
    same bits at any cluster size); intermediates ride decimal(38,0),
    exact while ``Σ(w·score)`` per node stays below 10^26 — i.e.
    weighted in/out-degree below 10^14, documented not silent.

    Scale shape follows ``pagerank``: per half-step one equi-join of
    the edge relation with a score vector (both keyed on node id), one
    integer-sum groupBy, ONE scalar to the driver (the max), and
    localCheckpoint per round to truncate lineage. Returns
    ``(node, hub_e12, auth_e12)``.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"),
                     F.col(weight_col).cast("long").alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    if nodes.limit(1).count() == 0:
        raise ValueError("hits: empty edge relation")
    e = e.localCheckpoint()
    big = "cast(%s as decimal(38,0))"

    def half(scores: DataFrame, score: str, edge_key: str, out_key: str,
             out_name: str) -> DataFrame:
        raw = (e.join(scores.withColumnRenamed("node", edge_key), edge_key)
               .select(F.col(out_key).alias("node"),
                       F.expr(f"{big % score} * w").alias("_m"))
               .groupBy("node").agg(F.sum("_m").alias("_raw")))
        mx = raw.agg(F.max("_raw")).first()[0]
        mx = max(int(mx), 1) if mx is not None else 1
        return (nodes.join(raw, "node", "left")
                .select("node",
                        F.coalesce(
                            F.expr(f"_raw * {SCALE} div {mx}"),
                            F.lit(0)).cast("long").alias(out_name))
                .localCheckpoint())

    hubs = nodes.withColumn("hub", F.lit(SCALE).cast("long"))
    auths = None
    for _ in range(iters):
        auths = half(hubs, "hub", "src", "dst", "auth")
        hubs = half(auths, "auth", "dst", "src", "hub")
    return (hubs.join(auths, "node")
            .select("node", F.col("hub").alias("hub_e12"),
                    F.col("auth").alias("auth_e12")))


def label_propagation(edges: DataFrame, iters: int = 3,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Synchronous label propagation communities (Raghavan, Albert &
    Kumara 2007) over an undirected reading of the edge list: every
    node starts as its own label; each round it adopts the label held
    by the MOST neighbors, ties broken by the smallest label — the
    deterministic synchronous variant (the paper's asynchronous
    random-order walk is not engine-portable). Fixed ``iters`` rounds
    (LPA's convergence is fast; oscillation on bipartite structures is
    the documented cost of synchronous determinism). Node ids must be
    integral (labels negate for the tie-break). Returns
    ``(node, community)``.

    Scale shape per round: one join of the node-sized label relation
    onto the doubled edge list (uniform neighbor key), one
    map-side-combinable (node, label) count, one ``max(struct)``
    argmax per node — never a per-node sorted window —
    ``localCheckpoint`` caps lineage (the pagerank discipline).
    Isolated nodes never appear in an edge list and are the caller's
    frame to re-attach.
    """
    adj = (edges.select(F.col(src_col).alias("u"),
                        F.col(dst_col).alias("v"))
           .unionByName(edges.select(F.col(dst_col).alias("u"),
                                     F.col(src_col).alias("v")))
           .distinct())
    nodes = adj.select(F.col("u").alias("node")).distinct() \
        .localCheckpoint()
    labels = nodes.withColumn("community", F.col("node").cast("long"))
    for _ in range(max(int(iters), 0)):
        nb = (adj.join(labels.select(F.col("node").alias("v"),
                                     F.col("community").alias("_l")),
                       "v")
              .groupBy("u", "_l")
              .agg(F.count("*").cast("long").alias("_c")))
        best = (nb.groupBy("u")
                .agg(F.max(F.struct(F.col("_c").alias("c"),
                                    (-F.col("_l")).alias("nl")))
                     .alias("_m")))
        labels = (nodes.join(
            best.select(F.col("u").alias("node"),
                        (-F.col("_m.nl")).cast("long")
                        .alias("community")), "node")
            .localCheckpoint())
    return labels


def trustrank(edges: DataFrame, seeds: DataFrame, iters: int = 2,
              damping_pct: int = 85, src_col: str = "src",
              dst_col: str = "dst",
              weight_col: str = "weight") -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): PageRank
    with teleport restricted to a trusted SEED set — trust flows out
    from hand-vetted sources and decays with link distance, so spam
    farms that manufacture in-links among themselves accumulate
    little mass. The standard web-corpus demotion signal next to
    ``pagerank``'s popularity signal.

    Same integer fixed-point discipline as ``pagerank`` (every ``//``
    an exact floor, order-free SUM inflow, bitwise engine-exact):
    start mass ``SCALE // n_seeds`` on each seed, zero elsewhere;
    per iteration seeds split the ``(100-damping_pct)%`` teleport AND
    the damped dangling mass; non-seeds receive only propagated
    trust. ``seeds`` is one column ``node``; seeds absent from the
    graph are ignored (documented — they can receive no links).
    Returns ``(node, trust_e12)``.

    Scale shape: identical to ``pagerank`` — the seed frame is tiny
    (hand-curated by nature) and broadcast into the start/teleport
    joins; per-iteration cost is the same edge join + map-side SUM.
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
    seed = (seeds.select(F.col("node")).distinct()
            .join(nodes, "node").localCheckpoint())
    ns = seed.count()
    if ns == 0:
        raise ValueError("trustrank: no seed appears in the graph")
    out = e.groupBy("src").agg(F.sum("w").alias("wout"))
    ej = e.join(out, "src").localCheckpoint()
    is_seed = F.col("_s").isNotNull()
    seeded = F.broadcast(seed.withColumn("_s", F.lit(1)))
    teleport_each = (SCALE * (100 - damping_pct) // 100) // ns
    ranks = (nodes.join(seeded, "node", "left")
             .select("node", F.when(is_seed, F.lit(SCALE // ns))
                     .otherwise(F.lit(0)).cast("long").alias("rank")))
    for _ in range(iters):
        ranks = ranks.localCheckpoint()
        dangling = (ranks.join(out.select(F.col("src").alias("node")),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0))).first()[0])
        dang_each = (int(dangling) * damping_pct // 100) // ns
        inflow = (ej.join(ranks.withColumnRenamed("node", "src"), "src")
                  .select(F.col("dst").alias("node"),
                          _idiv(_idiv(F.col("rank") * damping_pct, 100)
                                * F.col("w"),
                                F.col("wout")).alias("_c"))
                  .groupBy("node").agg(F.sum("_c").alias("_in")))
        ranks = (nodes.join(inflow, "node", "left")
                 .join(seeded, "node", "left")
                 .select("node",
                         (F.when(is_seed,
                                 F.lit(teleport_each + dang_each))
                          .otherwise(F.lit(0))
                          + F.coalesce(F.col("_in"), F.lit(0)))
                         .cast("long").alias("rank")))
    return ranks.select("node", F.col("rank").alias("trust_e12"))


def crawl_depth(edges: DataFrame, seeds: DataFrame, max_hops: int = 4,
                src_col: str = "src",
                dst_col: str = "dst") -> DataFrame:
    """Minimum link distance from a trusted seed set — the crawl-depth
    label (Mercator's frontier depth; pages far from any seed
    correlate with lower quality, the prior ``trustrank`` expresses
    continuously and this expresses ordinally). Directed BFS: seeds at
    depth 0, then ``max_hops`` synchronous frontier expansions; nodes
    still unreached report depth NULL (unreachable within the
    horizon). Returns ``(node, depth)``.

    Scale shape per hop: one join of the CURRENT FRONTIER (only the
    nodes first reached last hop — shrinking, never the full depth
    relation) onto the edge list, one min-aggregate, one anti-join
    against the settled set; ``localCheckpoint`` caps lineage. A hop
    over a hub node fans out once — depth is min-distance, so every
    node settles exactly once and rows never revisit.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    settled = (seeds.select("node").distinct().join(nodes, "node")
               .withColumn("depth", F.lit(0).cast("long"))
               .localCheckpoint())
    frontier = settled
    for hop in range(1, max_hops + 1):
        nxt = (e.join(frontier.select(F.col("node").alias("src")), "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(settled.select("node"), "node", "left_anti")
               .withColumn("depth", F.lit(hop).cast("long"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return nodes.join(settled, "node", "left")
