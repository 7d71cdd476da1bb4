"""Link graph + integer fixed-point PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.graph import (
    SCALE,
    anchor_edges,
    anchor_stats,
    link_graph,
    pagerank,
)
from tests.conftest import SF_DIR

EDGES = [("a", "b", 1), ("b", "c", 2), ("b", "a", 1),
         ("c", "a", 1), ("a", "d", 3)]  # d is dangling


def _sim(edges, iters, damping=85):
    """Independent pure-Python replay of the integer arithmetic."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    wout: dict[str, int] = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    tel = (SCALE * (100 - damping) // 100) // n
    r = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in wout)
        de = (dang * damping // 100) // n
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * damping // 100 * w) // wout[s]
        r = {v: tel + de + inflow[v] for v in nodes}
    return r


@pytest.mark.parametrize("iters", [0, 1, 3])
def test_pagerank_matches_simulation(spark, iters):
    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    got = {r["node"]: r["rank_e12"]
           for r in pagerank(df, iters=iters).collect()}
    assert got == _sim(EDGES, iters)


def test_pagerank_partition_invariant_and_mass_conserving(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    a = {r["node"]: r["rank_e12"]
         for r in pagerank(df.repartition(7), iters=2).collect()}
    assert a == _sim(EDGES, 2)
    # floors only shed mass; the heavily-cited nodes (a: from b, c and
    # the dangling pool; d: a's weight-3 edge) outrank the others
    assert sum(a.values()) <= SCALE
    assert min(a["a"], a["d"]) > max(a["b"], a["c"])


def test_pagerank_validates(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst", "weight"])
    with pytest.raises(ValueError):
        pagerank(df, iters=-1)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=101)
    empty = spark.createDataFrame([], "src string, dst string, weight long")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)


def test_link_graph_over_documents(spark):
    # the raw corpus has no URLs — plant two per doc (one mixed-case,
    # must fold to lowercase), keyed off doc_id so edges are stable
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source",
        F.concat(F.substring("text", 1, 20),
                 F.lit(" https://Ex"), F.pmod("doc_id", 5).cast("string"),
                 F.lit(".org/a see http://mirror.net/b")).alias("text"))
    edges = link_graph(docs)
    assert edges.columns == ["src", "dst", "weight"]
    rows = edges.collect()
    assert rows and all(r["weight"] >= 1 for r in rows)
    assert all(r["dst"] == r["dst"].lower() and r["dst"] for r in rows)
    # composes: every edge endpoint gets a rank
    pr = pagerank(edges, iters=1)
    n_nodes = (edges.select(F.col("src").alias("n"))
               .union(edges.select("dst")).distinct().count())
    assert pr.count() == n_nodes


def test_canonical_url_rules(spark):
    from rag_document_parser_spark.operators.urls import canonicalize_urls
    cases = [
        # (planted url, expected canonical)
        ("https://EX.Org:443/P/?utm_source=x&id=42&gclid=abc#sec",
         "https://ex.org/P/?id=42"),
        ("http://Foo.example:80/a/b/", "http://foo.example/a/b"),
        ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
        ("https://a.com/x?utm_a=1&b=2&utm_c=3&d=4",
         "https://a.com/x?b=2&d=4"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),  # non-default port
        ("https://a.com/", "https://a.com"),
        ("https://a.com/x#frag", "https://a.com/x"),
    ]
    df = spark.createDataFrame(
        [(str(i), f"see {u} end") for i, (u, _) in enumerate(cases)],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["url"], r["canon"])
           for r in canonicalize_urls(df).collect()}
    assert len(got) == len(cases)
    for i, (u, want) in enumerate(cases):
        assert got[str(i)] == (u, want), (u, got[str(i)], want)


ANCHOR_DOCS = [
    ("s1", 'x <a href="http://a.com/1">Guide</a> y '
           '<a class="z" href="http://b.com/2">API docs</a>'),
    ("s2", '<a href="http://A.com/3">Guide</a><a href="http://a.com/4">'
           'reference</a>'),
    ("s3", 'no links here'),
    ("s4", '<a href="http://a.com/5"></a> empty anchor dropped '
           '<a href="http://c.com/">  padded  </a>'),
]


def test_anchor_edges_pairs_href_with_its_own_text(spark):
    df = spark.createDataFrame(ANCHOR_DOCS, "source string, text string")
    got = sorted((r["src"], r["dst"], r["anchor"])
                 for r in anchor_edges(df).collect())
    assert got == [
        ("s1", "a.com", "Guide"),
        ("s1", "b.com", "API docs"),
        ("s2", "a.com", "Guide"),
        ("s2", "a.com", "reference"),
        ("s4", "c.com", "padded"),
    ]


def test_anchor_stats_top_pick_deterministic(spark):
    df = spark.createDataFrame(ANCHOR_DOCS, "source string, text string")
    stats = {r["dst"]: r for r in
             anchor_stats(anchor_edges(df)).collect()}
    a = stats["a.com"]
    assert (a["n_links"], a["n_unique_anchors"]) == (3, 2)
    # 'Guide' x2 beats 'reference' x1
    assert (a["top_anchor"], a["top_cnt"]) == ("Guide", 2)
    b = stats["b.com"]
    assert (b["n_links"], b["top_anchor"]) == (1, "API docs")


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------


def test_hits_roles_separate(spark):
    from rag_document_parser_spark.operators.graph import SCALE, hits

    # h2 links twice to the best authority a1; a1 also links back to h1
    edges = spark.createDataFrame(
        [("h1", "a1", 1), ("h1", "a2", 1), ("h2", "a1", 2), ("a1", "h1", 1)],
        "src string, dst string, weight long")
    got = {r["node"]: (r["hub_e12"], r["auth_e12"])
           for r in hits(edges, iters=2).collect()}
    # max-normalized: exactly one top hub and one top authority at SCALE
    assert got["h2"][0] == SCALE          # strongest hub (2x to best auth)
    assert got["a1"][1] == SCALE          # strongest authority
    assert got["a2"][1] < got["a1"][1]
    assert got["h2"][1] == 0              # nothing links to h2
    assert all(0 <= v <= SCALE for pair in got.values() for v in pair)


def test_hits_python_twin(spark):
    from rag_document_parser_spark.operators.graph import SCALE, hits

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 7}", i % 3 + 1) for i in range(12)]
    edges = [(s, d, w) for s, d, w in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string, weight long")

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    hub = {n: SCALE for n in nodes}
    auth = {}
    for _ in range(2):
        raw = {n: 0 for n in nodes}
        for s, d, w in edges:
            raw[d] += hub[s] * w
        m = max(max(raw.values()), 1)
        auth = {n: raw[n] * SCALE // m for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d, w in edges:
            raw[s] += auth[d] * w
        m = max(max(raw.values()), 1)
        hub = {n: raw[n] * SCALE // m for n in nodes}

    got = {r["node"]: (r["hub_e12"], r["auth_e12"])
           for r in hits(df, iters=2).collect()}
    assert got == {n: (hub[n], auth[n]) for n in nodes}


def test_hits_validates_input(spark):
    import pytest as _pt

    from rag_document_parser_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src string, dst string, weight long")
    with _pt.raises(ValueError):
        hits(empty)
    good = spark.createDataFrame([("a", "b", 1)],
                                 "src string, dst string, weight long")
    with _pt.raises(ValueError):
        hits(good, iters=0)


# ---- label propagation communities --------------------------------------

def test_lpa_separates_bridged_triangles(spark):
    from rag_document_parser_spark.operators.graph import (
        label_propagation)
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
             (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    comm = {r["node"]: r["community"]
            for r in label_propagation(df, iters=3).collect()}
    assert comm[1] == comm[2] == comm[3]
    assert comm[10] == comm[11] == comm[12]
    assert comm[1] != comm[10]


def test_lpa_deterministic_and_partition_invariant(spark):
    from rag_document_parser_spark.operators.graph import (
        label_propagation)
    import random
    rng = random.Random(17)
    edges = list({(rng.randint(0, 30), rng.randint(0, 30))
                  for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, label_propagation(df, iters=2).collect()))
    b = sorted(map(tuple, label_propagation(
        df.repartition(7), iters=2).collect()))
    assert a == b


def test_trustrank_trust_decays_from_seeds(spark):
    """Seeds hold teleport mass; a node only reachable from spam (no
    path from any seed) ends with ZERO trust, however many in-links it
    manufactures — the property separating TrustRank from PageRank."""
    from rag_document_parser_spark.operators.graph import (
        pagerank, trustrank)
    edges = spark.createDataFrame(
        [("seedA", "good1", 1), ("good1", "good2", 1),
         # spam farm: 3 nodes linking a target heavily, unreachable
         # from the seed
         ("spam1", "target", 5), ("spam2", "target", 5),
         ("spam3", "target", 5), ("target", "spam1", 1)],
        ["src", "dst", "weight"])
    seeds = spark.createDataFrame([("seedA",)], "node string")
    t = {r["node"]: r["trust_e12"]
         for r in trustrank(edges, seeds, iters=3).collect()}
    assert t["good1"] > 0 and t["good2"] > 0
    assert t["target"] == 0 and t["spam1"] == 0
    # pagerank, by contrast, rewards the farm's in-links
    p = {r["node"]: r["rank_e12"]
         for r in pagerank(edges, iters=3).collect()}
    assert p["target"] > p["good2"]


def test_trustrank_no_seed_in_graph_raises(spark):
    from rag_document_parser_spark.operators.graph import trustrank
    edges = spark.createDataFrame([("a", "b", 1)],
                                  ["src", "dst", "weight"])
    seeds = spark.createDataFrame([("zzz",)], "node string")
    with pytest.raises(ValueError, match="no seed"):
        trustrank(edges, seeds)


def test_crawl_depth_bfs_and_horizon(spark):
    from rag_document_parser_spark.operators.graph import crawl_depth
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
         ("a", "c"),            # shortcut: c is depth 1, not 2
         ("x", "y")],           # disconnected from the seed
        ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["depth"]
           for r in crawl_depth(edges, seeds, max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2,
                   "e": None, "x": None, "y": None}  # e beyond horizon
    # widening the horizon settles e; min-distance is stable
    got3 = {r["node"]: r["depth"]
            for r in crawl_depth(edges, seeds, max_hops=4).collect()}
    assert got3["e"] == 3 and got3["c"] == 1
