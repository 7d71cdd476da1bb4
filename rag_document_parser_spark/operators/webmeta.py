"""Page-level metadata mining from raw HTML: OpenGraph, canonical
link, robots meta, JSON-LD presence.

A web-scale extraction pipeline keeps more than the cleaned text: the
page's self-declared metadata drives dedup (canonical URL beats string
canonicalization), snippet/caption mining (og:title / og:description
are editor-written summaries), index gating (robots meta noindex), and
structured-data harvesting (JSON-LD blocks). The reference's HTML
parser stops at text + <title> (/root/reference/parsers/
text_parser.py:155-180); this tier is the forward extension a crawl
actually needs.

Documented regex subset (RE2-safe, shared verbatim with the DuckDB
oracle): attributes are matched in their conventional order
(``property``/``name``/``rel`` before ``content``/``href``), values
must be quoted with ' or ", tags may not contain ``>`` inside
attribute values. Out of subset: reversed attribute order, unquoted
values, and entity decoding inside attribute values (the E1 text path
owns entities).

Scale shape: every extraction is a row-local regexp projection inside
the scan — zero shuffles, zero UDFs; the whole operator fuses into one
WholeStageCodegen span over the HTML column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.semantics import HTML_ENTITIES

__all__ = ["page_meta", "RE_OG", "RE_CANONICAL", "RE_META_ROBOTS",
           "RE_JSONLD", "RE_TITLE_TAG"]

# {0} is the og property name; group 1 the content value
RE_OG = (r"(?i)<meta[^>]*property=[\"']og:{0}[\"'][^>]*"
         r"content=[\"']([^\"'>]*)[\"']")
RE_CANONICAL = (r"(?i)<link[^>]*rel=[\"']canonical[\"'][^>]*"
                r"href=[\"']([^\"'>]*)[\"']")
RE_META_ROBOTS = (r"(?i)<meta[^>]*name=[\"']robots[\"'][^>]*"
                  r"content=[\"']([^\"'>]*)[\"']")
RE_JSONLD = r"(?i)<script[^>]*type=[\"']application/ld\+json[\"']"
RE_TITLE_TAG = r"(?is)<title[^>]*>([^<]*)</title>"


def _first(c: Column, pattern: str) -> Column:
    return F.nullif(F.regexp_extract(c, pattern, 1), F.lit(""))


def page_meta(df: DataFrame, html_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """One row per document: ``(id, og_title, og_description,
    canonical, robots_meta, noindex, n_jsonld, title)``.

    ``noindex`` is the index gate a crawler acts on: true iff the
    robots meta content contains the ``noindex`` token
    (case-insensitive, comma/space-delimited — substring match is the
    documented subset). Missing fields are NULL; ``n_jsonld`` counts
    JSON-LD script openings (0 when none).
    """
    c = F.col(html_col)
    robots = _first(c, RE_META_ROBOTS)
    return df.select(
        F.col(id_col).alias("id"),
        _first(c, RE_OG.format("title")).alias("og_title"),
        _first(c, RE_OG.format("description")).alias("og_description"),
        _first(c, RE_CANONICAL).alias("canonical"),
        robots.alias("robots_meta"),
        F.coalesce(F.lower(robots).contains("noindex"), F.lit(False))
        .alias("noindex"),
        F.regexp_count(c, F.lit(RE_JSONLD)).cast("long").alias("n_jsonld"),
        _first(c, RE_TITLE_TAG).alias("title"),
    )


def canonical_dedup(df: DataFrame, html_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Canonical-link deduplication: documents DECLARING the same
    ``<link rel=canonical>`` target are one logical page (print views,
    mobile mirrors, tracking-param variants), regardless of how much
    their bodies differ — the publisher-asserted dedup signal that
    string canonicalization (``urls.canonical_url``) cannot recover.

    Per-doc verdict ``(id, canonical, rep_id, canonical_dup)``: the
    lowest doc id of each canonical group represents it; docs without
    a canonical declaration represent themselves.

    Scale shape: one aggregate keyed on the canonical URL (map-side
    partial absorbs hot targets) and one join back on the same key —
    a mega-group's members meet ONE group row each, so the join output
    stays linear in the corpus. Run AFTER exact dedup (identical
    bodies never reach this tier).
    """
    meta = page_meta(df, html_col, id_col).select("id", "canonical")
    groups = (meta.where(F.col("canonical").isNotNull())
              .groupBy("canonical")
              .agg(F.min("id").alias("rep_id")))
    return (meta.join(groups, "canonical", "left")
            .select("id", "canonical",
                    F.coalesce("rep_id", "id").alias("rep_id"))
            .withColumn("canonical_dup", F.col("rep_id") != F.col("id")))


RE_SITEMAP_URLBLOCK = r"(?is)<url>(.*?)</url>"
RE_SITEMAP_LOC = r"(?is)<loc>([^<]*)</loc>"
RE_SITEMAP_LASTMOD = r"(?is)<lastmod>([^<]*)</lastmod>"
RE_HREFLANG = (r"(?i)<link[^>]*rel=[\"']alternate[\"'][^>]*"
               r"hreflang=[\"']([A-Za-z-]+)[\"'][^>]*"
               r"href=[\"']([^\"'>]*)[\"']")


def parse_sitemaps(df: DataFrame, xml_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Sitemap XML → one row per ``<url>`` entry: ``(id, entry_idx,
    loc, lastmod)`` — the crawl-seed feed ``robots_crawl_meta``'s
    Sitemap lines point at, upstream of ``frontier_schedule``.

    Per-entry extraction scopes ``<loc>``/``<lastmod>`` INSIDE each
    ``<url>`` block (posexplode of the block array), so a missing
    lastmod in one entry cannot misalign with its neighbour's — the
    failure mode of extracting the two tag streams independently.
    Entries without a ``<loc>`` are dropped; ``lastmod`` is NULL when
    absent. Scale shape: regex extract + posexplode inside the scan,
    zero shuffles.
    """
    c = F.col(xml_col)
    blocks = F.regexp_extract_all(c, F.lit(RE_SITEMAP_URLBLOCK), 1)
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode_outer(blocks).alias("entry_idx", "_b"))
          .where(F.col("_b").isNotNull()))
    return (ex.select(
        "id", F.col("entry_idx").cast("long").alias("entry_idx"),
        F.nullif(F.regexp_extract("_b", RE_SITEMAP_LOC, 1), F.lit(""))
        .alias("loc"),
        F.nullif(F.regexp_extract("_b", RE_SITEMAP_LASTMOD, 1), F.lit(""))
        .alias("lastmod"))
        .where(F.col("loc").isNotNull()))


def hreflang_alternates(df: DataFrame, html_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """``<link rel=alternate hreflang=..>`` mining → one row per
    declared alternate: ``(id, hreflang, href)``, lang lower-cased.

    The publisher-asserted counterpart of STRAND URL pairing
    (``urls.strand_url_pairs``): hreflang clusters ARE the
    cross-language document groups a bitext miner wants, no URL
    heuristics needed. Feed the output to ``bitext``/``align`` keyed
    on the page's own URL + href. Attribute-order subset as the other
    webmeta patterns (rel before hreflang before href).

    Scale shape: regexp_extract_all + posexplode inside the scan,
    zero shuffles.
    """
    c = F.col(html_col)
    langs = F.regexp_extract_all(c, F.lit(RE_HREFLANG), 1)
    hrefs = F.regexp_extract_all(c, F.lit(RE_HREFLANG), 2)
    pairs = F.arrays_zip(langs.alias("l"), hrefs.alias("h"))
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode_outer(pairs).alias("alt_idx", "_p"))
          .where(F.col("_p").isNotNull()))
    return ex.select("id",
                     F.col("alt_idx").cast("long").alias("alt_idx"),
                     F.lower(F.col("_p.l")).alias("hreflang"),
                     F.col("_p.h").alias("href"))


RE_TABLE_BLOCK = r"(?is)<table[^>]*>(.*?)</table>"
RE_TR_BLOCK = r"(?is)<tr[^>]*>(.*?)</tr>"
RE_CELL = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"
RE_ANY_TAG = r"<[^>]+>"
RE_CELL_WS = r"[ \t\r\n]+"


def html_tables(df: DataFrame, html_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Structured table mining from HTML — the web-format twin of the
    reference's PDF/DOCX/PPTX table extractors (its HTML path stops at
    get_text, flattening tables into prose). One row per ``<tr>``:
    ``(id, table_idx, row_idx, n_cells, cells)`` with ``cells`` the
    row's td/th texts joined by `` | `` after tag strip, named-entity
    decode, and whitespace collapse.

    Documented subset (shared with the DuckDB oracle): non-nested
    tables (an inner ``<table>`` truncates the outer block at ITS
    ``</table>`` — first-match non-greedy), td/th only (no
    colspan/rowspan expansion), named entities only (the markdown/XML
    chain; numeric charrefs pass through). Rows with zero cells (e.g.
    a ``<tr>`` holding only comments) are kept with ``n_cells = 0`` —
    the caller's signal of malformed rows.

    Scale shape: three nested block-scoped regex extracts + two
    posexplodes inside the scan, an element-wise ``transform`` for the
    cell cleanup — zero shuffles, zero UDFs.
    """
    c = F.col(html_col)
    tables = F.regexp_extract_all(c, F.lit(RE_TABLE_BLOCK), 1)
    t = (df.select(F.col(id_col).alias("id"),
                   F.posexplode_outer(tables).alias("table_idx", "_t"))
         .where(F.col("_t").isNotNull()))
    rows = F.regexp_extract_all(F.col("_t"), F.lit(RE_TR_BLOCK), 1)
    r = (t.select("id", "table_idx",
                  F.posexplode_outer(rows).alias("row_idx", "_r"))
         .where(F.col("_r").isNotNull()))

    def clean(cell):
        x = F.regexp_replace(cell, RE_ANY_TAG, "")
        for ent, ch in HTML_ENTITIES:
            x = F.replace(x, F.lit(ent), F.lit(ch))
        return F.trim(F.regexp_replace(x, RE_CELL_WS, " "))

    cells = F.transform(
        F.regexp_extract_all(F.col("_r"), F.lit(RE_CELL), 1), clean)
    return r.select("id",
                    F.col("table_idx").cast("long").alias("table_idx"),
                    F.col("row_idx").cast("long").alias("row_idx"),
                    F.size(cells).cast("long").alias("n_cells"),
                    F.array_join(cells, " | ").alias("cells"))


RE_HEADING = r"(?is)<h([1-6])[^>]*>(.*?)</h[1-6]>"


def heading_outline(df: DataFrame, html_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Document heading outline from HTML: one row per ``<h1>``-``<h6>``
    in document order — ``(id, heading_idx, level, heading)`` with the
    heading text tag-stripped, entity-decoded, whitespace-collapsed.
    The section skeleton RAG chunking splits on (the reference's HTML
    path flattens headings into prose; ``tiling`` then re-derives
    topical structure statistically — this keeps the author-declared
    structure when it exists).

    Same documented subset as the other webmeta miners: non-nested
    heading tags, first-match non-greedy blocks (mismatched close
    levels accept — ``</h[1-6]>`` — the html.parser recovery
    behavior). Scale shape: two parallel regexp_extract_all passes
    (level digits, bodies) zipped positionally + one posexplode inside
    the scan, per-element cleanup transform — zero shuffles.
    """
    c = F.col(html_col)
    levels = F.regexp_extract_all(c, F.lit(RE_HEADING), 1)
    bodies = F.regexp_extract_all(c, F.lit(RE_HEADING), 2)
    pairs = F.arrays_zip(levels.alias("l"), bodies.alias("b"))
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode_outer(pairs).alias("heading_idx", "_p"))
          .where(F.col("_p").isNotNull()))
    x = F.regexp_replace(F.col("_p.b"), RE_ANY_TAG, "")
    for ent, ch in HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.trim(F.regexp_replace(x, RE_CELL_WS, " "))
    return ex.select("id",
                     F.col("heading_idx").cast("long")
                     .alias("heading_idx"),
                     F.col("_p.l").cast("long").alias("level"),
                     x.alias("heading"))


RE_FEED_ITEM = r"(?is)<(?:item|entry)[^>]*>(.*?)</(?:item|entry)>"
RE_FEED_TITLE = r"(?is)<title[^>]*>([^<]*)</title>"
RE_FEED_LINK_TEXT = r"(?is)<link[^>]*>([^<]+)</link>"
RE_FEED_LINK_HREF = r"(?i)<link[^>]*href=[\"']([^\"'>]*)[\"']"
RE_FEED_DATE = (r"(?is)<(?:pubDate|updated|published)[^>]*>"
                r"([^<]*)</(?:pubDate|updated|published)>")


def parse_feeds(df: DataFrame, xml_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """RSS/Atom feed parsing → one row per item/entry: ``(id,
    item_idx, title, link, published)`` — the other crawl-seed feed
    next to ``parse_sitemaps`` (feeds carry editorial freshness
    signals sitemaps lack).

    Block-scoped like the sitemap parser (a field-less item cannot
    steal from its neighbour); the link accepts BOTH conventions —
    RSS text content ``<link>url</link>`` and Atom
    ``<link href="url"/>`` — text form first (an Atom entry whose
    link has no text yields no text match, so the href form then
    applies). ``published`` unifies pubDate/updated/published; items
    with no title AND no link are dropped as malformed. Zero
    shuffles, zero UDFs.
    """
    c = F.col(xml_col)
    blocks = F.regexp_extract_all(c, F.lit(RE_FEED_ITEM), 1)
    ex = (df.select(F.col(id_col).alias("id"),
                    F.posexplode_outer(blocks).alias("item_idx", "_b"))
          .where(F.col("_b").isNotNull()))
    title = F.nullif(
        F.trim(F.regexp_extract("_b", RE_FEED_TITLE, 1)), F.lit(""))
    link = F.coalesce(
        F.nullif(F.trim(F.regexp_extract("_b", RE_FEED_LINK_TEXT, 1)),
                 F.lit("")),
        F.nullif(F.regexp_extract("_b", RE_FEED_LINK_HREF, 1),
                 F.lit("")))
    pub = F.nullif(
        F.trim(F.regexp_extract("_b", RE_FEED_DATE, 1)), F.lit(""))
    return (ex.select(
        "id", F.col("item_idx").cast("long").alias("item_idx"),
        title.alias("title"), link.alias("link"),
        pub.alias("published"))
        .where(F.col("title").isNotNull() | F.col("link").isNotNull()))
