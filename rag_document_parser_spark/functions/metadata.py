"""Document metadata tier (E13/E44) — DocumentMetadata-shaped columns.

The reference models per-document metadata as ``DocumentMetadata``
(title/author/subject/creator/creation_date/modification_date,
``/root/reference/models/parse_result.py:58-70``). Its PDF date parser is
dead code: ``_parse_pdf_date`` truncates the input to ``len(fmt)`` —
the length of the FORMAT string, not of a rendered date — so a full
14-char PDF date (``D:20240115123059``) is truncated to 12 chars, fails
``%Y%m%d%H%M%S`` (needs 14), then every shorter format too, and returns
None (``/root/reference/parsers/pdf_parser.py:567-590``). This module
implements the INTENDED multi-format semantics (SURVEY §1.2 fix policy):
try each full format against the whole string, first hit wins.

Formats, in the reference's order, plus the EXIF form:
  D:-prefixed / bare  %Y%m%d%H%M%S | %Y%m%d%H%M | %Y%m%d
                      %Y-%m-%d %H:%M:%S | %Y-%m-%d   (pdf_parser.py:571-577)
  EXIF DateTimeOriginal  %Y:%m:%d %H:%M:%S           (image_parser.py:330)

PDF timezone suffixes (``+05'00'``, ``Z``) are stripped first — the
reference's strptime would ignore them by truncation; we drop them
explicitly and parse the naive local time.

All pure Catalyst: try_to_timestamp chains, zero Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RE2/Java-safe timezone-suffix pattern for PDF date strings
RE_TZ_SUFFIX = r"(?:[Zz]|[+\-][0-9]{2}'?[0-9]{2}'?)$"

# (Spark datetime pattern, DuckDB strptime pattern) — kept as pairs so the
# oracle SQL in __spark_entry__ is generated from the same table
DATE_FORMATS = [
    ("yyyyMMddHHmmss", "%Y%m%d%H%M%S"),
    ("yyyyMMddHHmm", "%Y%m%d%H%M"),
    ("yyyyMMdd", "%Y%m%d"),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyy:MM:dd HH:mm:ss", "%Y:%m:%d %H:%M:%S"),  # EXIF
]


def parse_document_date(c: Column) -> Column:
    """Multi-format document date -> timestamp (NULL when unparseable)."""
    s = F.regexp_replace(F.trim(c), "^D:", "")
    s = F.regexp_replace(s, RE_TZ_SUFFIX, "")
    return F.coalesce(
        *[F.try_to_timestamp(s, F.lit(fmt)) for fmt, _ in DATE_FORMATS])


def format_parsed_date(c: Column) -> Column:
    """Render the parsed date as 'yyyy-MM-dd HH:mm:ss' — a pure calendar
    projection, identical across engines regardless of session timezone
    (epoch-based outputs would couple the oracle to tz config)."""
    return F.date_format(parse_document_date(c), "yyyy-MM-dd HH:mm:ss")


def doc_metadata(docs: DataFrame, date_col: str = "raw_date",
                 author_col: str = "author",
                 creator_col: str = "creator") -> DataFrame:
    """DocumentMetadata projection over a raw-metadata table:
    (doc_id, author, creator, created). ``created`` is the parsed,
    normalized creation date (E13 pdf dates + E44 EXIF DateTimeOriginal).
    """
    return docs.select(
        "doc_id",
        F.col(author_col).alias("author"),
        F.col(creator_col).alias("creator"),
        format_parsed_date(F.col(date_col)).alias("created"),
    )
