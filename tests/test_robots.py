"""robots.txt evaluation (operators/robots.py): RFC 9309 subset —
group selection, longest-match, Allow-wins-ties, empty Disallow,
case-insensitive directives with case-sensitive paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.robots import (
    parse_robots,
    robots_decisions,
    url_path,
)

BODY = """User-agent: googlebot
Disallow: /private/
User-agent: *
Disallow: /admin/
Allow: /admin/public/
DISALLOW: /tmp
Disallow:
User-agent: other
Disallow: /
"""


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(
        [("site.example", BODY),
         ("open.example", "User-agent: *\n"),
         ("closed.example", "user-agent: *\ndisallow: /\n")],
        ["domain", "body"])


def test_parse_star_groups_only(robots):
    rules = [(r["domain"], r["rule_idx"], r["allow"], r["prefix"])
             for r in parse_robots(robots)
             .orderBy("domain", "rule_idx").collect()]
    assert rules == [
        ("closed.example", 0, False, "/"),
        ("site.example", 0, False, "/admin/"),
        ("site.example", 1, True, "/admin/public/"),
        ("site.example", 2, False, "/tmp"),   # case-insensitive directive
    ]                                          # empty Disallow dropped


def test_decisions_longest_match_and_defaults(spark, robots):
    urls = spark.createDataFrame([
        (1, "https://site.example/admin/secret"),
        (2, "https://site.example/admin/public/page"),
        (3, "https://site.example/tmpfile"),     # prefix, not segment
        (4, "https://site.example/ok"),
        (5, "https://site.example/private/x"),   # googlebot group ignored
        (6, "https://open.example/anything"),
        (7, "https://norobots.example/x"),
        (8, "https://closed.example/"),
    ], ["doc_id", "url"])
    got = {r["id"]: (r["allowed"], r["matched_prefix"])
           for r in robots_decisions(urls, robots).collect()}
    assert got[1] == (False, "/admin/")
    assert got[2] == (True, "/admin/public/")
    assert got[3] == (False, "/tmp")
    assert got[4] == (True, None)
    assert got[5] == (True, None)
    assert got[6] == (True, None)
    assert got[7] == (True, None)
    assert got[8] == (False, "/")


def test_paths_case_sensitive(spark):
    robots = spark.createDataFrame(
        [("c.example", "User-agent: *\nDisallow: /Admin/\n")],
        ["domain", "body"])
    urls = spark.createDataFrame(
        [(1, "https://c.example/Admin/x"), (2, "https://c.example/admin/x")],
        ["doc_id", "url"])
    got = {r["id"]: r["allowed"]
           for r in robots_decisions(urls, robots).collect()}
    assert got == {1: False, 2: True}


def test_url_path_root_default(spark):
    df = spark.createDataFrame(
        [("https://a.example",), ("https://a.example/x/y?q=1",)], ["u"])
    got = [r[0] for r in df.select(url_path(F.col("u"))).collect()]
    assert got == ["/", "/x/y?q=1"]


def test_every_url_gets_exactly_one_row(spark, robots):
    urls = spark.createDataFrame(
        [(i, f"https://site.example/admin/p{i}") for i in range(30)],
        ["doc_id", "url"])
    out = robots_decisions(urls.repartition(7), robots)
    assert out.count() == 30
    assert out.select("id").distinct().count() == 30


def test_wildcard_and_anchor_rules(spark):
    body = ("User-agent: *\n"
            "Disallow: /*.json$\n"
            "Allow: /api/*/public\n"
            "Disallow: /api/\n")
    robots = spark.createDataFrame([("w.example", body)],
                                   ["domain", "body"])
    urls = spark.createDataFrame([
        (1, "https://w.example/data/file.json"),      # *.json$ blocks
        (2, "https://w.example/data/file.json.txt"),  # $ anchor: allowed
        (3, "https://w.example/api/v2/public"),       # allow wildcard wins
        (4, "https://w.example/api/v2/secret"),       # /api/ blocks
        (5, "https://w.example/under_score.json"),    # _ literal in path
    ], ["doc_id", "url"])
    got = {r["id"]: (r["allowed"], r["matched_prefix"])
           for r in robots_decisions(urls, robots).collect()}
    assert got[1] == (False, "/*.json$")
    assert got[2] == (True, None)
    assert got[3] == (True, "/api/*/public")
    assert got[4] == (False, "/api/")
    assert got[5] == (False, "/*.json$")


def test_wildcards_off_literal_reading(spark):
    body = "User-agent: *\nDisallow: /*.json$\n"
    robots = spark.createDataFrame([("w.example", body)],
                                   ["domain", "body"])
    urls = spark.createDataFrame(
        [(1, "https://w.example/a.json"),
         (2, "https://w.example/*.json$tail")], ["doc_id", "url"])
    got = {r["id"]: r["allowed"]
           for r in robots_decisions(urls, robots,
                                     wildcards=False).collect()}
    # conservative literal mode: the rule only matches itself as text
    assert got == {1: True, 2: False}


def test_crawl_meta_delay_and_sitemaps(spark):
    from rag_document_parser_spark.operators.robots import (
        robots_crawl_meta)
    body = ("Sitemap: https://a.example/sm1.xml\n"
            "User-agent: googlebot\n"
            "Crawl-delay: 9\n"
            "User-agent: *\n"
            "crawl-delay: 1.5\n"
            "Crawl-delay: 7\n"          # second star value ignored
            "Disallow: /x\n"
            "sitemap: https://a.example/sm2.xml\n")
    robots = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\n")],
        ["domain", "body"])
    got = {r["domain"]: (r["crawl_delay_ms"], r["sitemaps"])
           for r in robots_crawl_meta(robots).collect()}
    # googlebot's delay ignored; star's FIRST delay wins; 1.5s -> 1500ms
    assert got["a.example"] == (1500, ["https://a.example/sm1.xml",
                                       "https://a.example/sm2.xml"])
    assert got["b.example"] == (None, [])
