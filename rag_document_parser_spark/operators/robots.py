"""robots.txt evaluation at corpus scale (RFC 9309 subset).

A compliant web-scale ingest must be able to answer, for every crawled
URL it holds, "did robots.txt allow fetching this?" — both at crawl
time and retroactively when policies are audited. This module
evaluates a corpus of URLs against a corpus of robots.txt documents as
pure relational algebra: parse the policy files into a (domain, allow,
prefix) rule relation once, then decide every URL by the RFC's
longest-match rule with one broadcast join.

Documented subset of RFC 9309, shared exactly with the DuckDB oracle:

- Only ``User-agent: *`` groups are honored (the corpus-audit case;
  per-agent dispatch is a filter on the same rule relation).
- ``Allow:`` / ``Disallow:`` path rules with RFC §2.2.3 wildcards:
  ``*`` matches any char run and a trailing ``$`` anchors the end,
  interpreted through a portable LIKE translation
  (``robots_like_pattern``); pass ``wildcards=False`` for the
  conservative literal-prefix reading.
- Decision per RFC §2.2.2: the rule with the LONGEST matching prefix
  wins; on a length tie, ``Allow`` wins; no matching rule → allowed.
  An empty ``Disallow:`` line matches nothing (explicit allow-all).

Scale shape: the rule relation is (policy corpus)-sized — thousands of
domains, a handful of rules each — and broadcasts; the URL corpus
joins on the uniform domain key and evaluates its rules with one
bounded per-(url, rule) prefix test + one map-side-combinable
max_by aggregate. Nothing corpus-sized ever shuffles on a skewed key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.urls import url_domain

__all__ = ["parse_robots", "robots_crawl_meta", "robots_decisions",
           "robots_like_pattern", "url_path"]


def url_path(c: Column) -> Column:
    """The path-and-after part of a URL ('/': missing path)."""
    p = F.regexp_extract(c, "https?://[A-Za-z0-9.\\-]+(/.*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(robots: DataFrame, domain_col: str = "domain",
                 body_col: str = "body") -> DataFrame:
    """Parse robots.txt bodies into the rule relation ``(domain,
    rule_idx, allow, prefix)`` — ``User-agent: *`` groups only, in
    file order. A group ends at the next ``User-agent:`` line; multiple
    ``*`` groups in one file all contribute (RFC: groups with the same
    agent merge). Empty-prefix Disallow lines are dropped (they match
    nothing); empty-prefix Allow lines likewise carry no information.

    One projection per body (split + a running group-state fold inside
    the scan), then a posexplode — zero shuffles.
    """
    # fold over lines carrying (in_star_group, rules array); directive
    # names match case-insensitively, path prefixes keep their case
    # (RFC 9309: paths are case-sensitive)
    rules = F.expr("""
      aggregate(
        split(body, '\n'),
        named_struct('g', false,
                     'r', cast(array() as array<struct<
                            allow: boolean, prefix: string>>)),
        (acc, ln0) -> CASE
          WHEN trim(ln0) rlike '(?i)^user-agent\\\\s*:'
            THEN named_struct(
              'g', trim(substring_index(trim(ln0), ':', -1)) = '*',
              'r', acc.r)
          WHEN acc.g AND trim(ln0) rlike '(?i)^(allow|disallow)\\\\s*:'
            THEN named_struct('g', acc.g, 'r',
              CASE WHEN trim(regexp_replace(trim(ln0),
                            '(?i)^(allow|disallow)\\\\s*:', '')) = ''
                   THEN acc.r
                   ELSE concat(acc.r, array(named_struct(
                     'allow', trim(ln0) rlike '(?i)^allow\\\\s*:',
                     'prefix', trim(regexp_replace(trim(ln0),
                               '(?i)^(allow|disallow)\\\\s*:', ''))))) END)
          ELSE acc
        END,
        acc -> acc.r)
    """)
    return (robots.select(F.col(domain_col).alias("domain"),
                          F.col(body_col).alias("body"))
            .select("domain", F.posexplode_outer(rules)
                    .alias("rule_idx", "_r"))
            .where(F.col("_r").isNotNull())
            .select("domain", F.col("rule_idx").cast("long"),
                    F.col("_r.allow").alias("allow"),
                    F.col("_r.prefix").alias("prefix")))


def robots_like_pattern(prefix: Column) -> Column:
    """A robots rule pattern as a SQL LIKE pattern (ESCAPE ``\\``):
    ``*`` → ``%``; a trailing ``$`` anchors the end (no trailing
    ``%``); LIKE metacharacters in the rule escape literally. Built
    from literal ``replace`` calls only, so the DuckDB oracle produces
    the byte-identical pattern and LIKE semantics agree exactly —
    regex translation would need engine-specific backreference syntax.
    """
    anchored = prefix.endswith("$")
    core = F.when(anchored,
                  prefix.substr(F.lit(1), F.length(prefix) - 1)) \
        .otherwise(prefix)
    esc = F.replace(F.replace(F.replace(core, F.lit("\\"), F.lit("\\\\")),
                              F.lit("%"), F.lit("\\%")),
                    F.lit("_"), F.lit("\\_"))
    lk = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, lk).otherwise(F.concat(lk, F.lit("%")))


def robots_decisions(urls: DataFrame, robots: DataFrame,
                     url_col: str = "url", id_col: str = "doc_id",
                     domain_col: str = "domain",
                     body_col: str = "body",
                     wildcards: bool = True) -> DataFrame:
    """Per-URL fetch decision: ``(id, domain, path, allowed,
    matched_prefix)`` — RFC 9309 longest-match over the parsed rules,
    Allow wins length ties, unmatched (or undomained/ruleless) URLs
    are allowed with a NULL ``matched_prefix``. ``matched_prefix``
    reports the winning rule's RAW pattern text.

    ``wildcards=True`` (default) interprets ``*`` (any char run) and a
    trailing ``$`` (end anchor) per RFC 9309 §2.2.3 via a portable
    LIKE translation (``robots_like_pattern``); specificity remains
    the RAW pattern length per the RFC. ``wildcards=False`` keeps the
    conservative literal-prefix reading (a ``*`` matches itself).
    """
    rules = parse_robots(robots, domain_col, body_col)
    u = urls.select(F.col(id_col).alias("id"),
                    url_domain(F.col(url_col)).alias("domain"),
                    url_path(F.col(url_col)).alias("path"))
    j = u.join(F.broadcast(rules), "domain", "left")
    if wildcards:
        j = j.withColumn("_lk", robots_like_pattern(F.col("prefix")))
        hit = F.col("prefix").isNotNull() & F.expr(
            "path like _lk escape '\\\\'")
    else:
        hit = F.col("prefix").isNotNull() & F.col("path").startswith(
            F.col("prefix"))
    # longest prefix wins; tie -> allow (rank allow above disallow)
    cand = j.select(
        "id", "domain", "path",
        F.when(hit, F.struct(
            F.length("prefix").alias("l"),
            F.col("allow").cast("int").alias("a"),
            F.col("allow"), F.col("prefix"))).alias("_m"))
    agg = (cand.groupBy("id", "domain", "path")
           .agg(F.max("_m").alias("_best")))
    return agg.select(
        "id", "domain", "path",
        F.coalesce(F.col("_best.allow"), F.lit(True)).alias("allowed"),
        F.col("_best.prefix").alias("matched_prefix"))


def robots_crawl_meta(robots: DataFrame, domain_col: str = "domain",
                      body_col: str = "body") -> DataFrame:
    """Per-domain crawl metadata from robots.txt: ``(domain,
    crawl_delay_ms, sitemaps)`` — the politeness knobs a crawl
    scheduler joins against its frontier.

    ``Crawl-delay`` (the de-facto extension; ignored by the RFC but
    honored by most crawlers) is taken from the ``User-agent: *``
    group, FIRST occurrence in file order, parsed as a fixed-point
    millisecond integer (``1.5`` → 1500 — integer split on the dot,
    first three fractional digits, no float parse). ``Sitemap`` lines
    are group-independent per the sitemaps protocol and collected in
    file order. Domains without a directive report NULL / empty.

    Scan-local like ``parse_robots``: one line fold per body, zero
    shuffles.
    """
    meta = F.expr("""
      aggregate(
        split(body, '\n'),
        named_struct('g', false, 'd', cast(null as bigint),
                     's', cast(array() as array<string>)),
        (acc, ln0) -> CASE
          WHEN trim(ln0) rlike '(?i)^user-agent\\\\s*:'
            THEN named_struct(
              'g', trim(substring_index(trim(ln0), ':', -1)) = '*',
              'd', acc.d, 's', acc.s)
          WHEN trim(ln0) rlike '(?i)^sitemap\\\\s*:'
            THEN named_struct('g', acc.g, 'd', acc.d,
              's', concat(acc.s, array(trim(regexp_replace(trim(ln0),
                     '(?i)^sitemap\\\\s*:', '')))))
          WHEN acc.g AND acc.d IS NULL
               AND trim(ln0) rlike
                   '(?i)^crawl-delay\\\\s*:\\\\s*[0-9]+(\\\\.[0-9]+)?$'
            THEN named_struct('g', acc.g,
              'd', cast(regexp_extract(trim(ln0),
                     '(?i)^crawl-delay\\\\s*:\\\\s*([0-9]+)', 1)
                     as bigint) * 1000
                   + cast(rpad(substring(regexp_extract(trim(ln0),
                       '(?i)^crawl-delay\\\\s*:\\\\s*[0-9]+\\\\.([0-9]+)',
                       1), 1, 3), 3, '0') as bigint),
              's', acc.s)
          ELSE acc
        END,
        acc -> named_struct('d', acc.d, 's', acc.s))
    """)
    return (robots.select(F.col(domain_col).alias("domain"),
                          F.col(body_col).alias("body"))
            .select("domain", meta.alias("_m"))
            .select("domain",
                    F.col("_m.d").alias("crawl_delay_ms"),
                    F.col("_m.s").alias("sitemaps")))
