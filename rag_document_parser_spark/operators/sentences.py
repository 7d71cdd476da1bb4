"""Sentence segmentation + sentence-level dedup.

The reference's span model stops at paragraph granularity (its HTML/
PDF parsers emit block-level spans; `/root/reference/parsers/`); the
repo's ``paragraph_dedup`` strips block-level boilerplate. Web
boilerplate also recurs at SENTENCE granularity inside otherwise
unique paragraphs ("All rights reserved." mid-footer), which the
paragraph pass cannot see — this module is that finer pass, the same
RefinedWeb remove-every-occurrence semantics one level down.

Segmentation is a documented closed subset (the C4/Gopher tier's
discipline): a sentence boundary is ``[.!?]`` followed by whitespace;
the punctuation stays with its sentence, the whitespace run is
consumed. No abbreviation list, no quote-aware lookahead (RE2 has no
lookaround, and the DuckDB oracle runs RE2) — "Dr. Smith" splits. The
subset is shared verbatim with the oracle via ``SENT_BOUNDARY``.

Scale shape: segmentation is a row-local projection; the dedup is
``paragraph_dedup`` applied to a sentinel-delimited rendering — one
map-side-combinable groupBy on the sentence hash, a broadcast
blacklist, one doc-keyed shuffle to reassemble. Nothing new to audit:
the skew discipline is inherited, not copied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import paragraph_dedup

__all__ = ["SENT_BOUNDARY", "sentence_dedup", "sentences_expr",
           "split_sentences"]

# RE2-safe boundary pattern, shared with the oracle. Replacement
# syntax is engine-specific ($1 Java / \1 RE2) — callers building SQL
# write the RE2 form.
SENT_BOUNDARY = r"([.!?])\s+"

_SENTINEL = "\x01"


def sentences_expr(c: Column) -> Column:
    """``array<string>`` of sentences under the subset boundary rule.

    Empty input yields an empty array; text with no boundary is one
    sentence. The sentinel is U+0001 — input text containing it would
    split spuriously (it cannot occur in extractor output: the Arrow
    kernel's control-char strip removes it upstream).
    """
    marked = F.regexp_replace(c, SENT_BOUNDARY, "$1" + _SENTINEL)
    return F.filter(F.split(marked, _SENTINEL, -1), lambda s: s != "")


def split_sentences(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per sentence: ``(id_col, sent_idx, sentence, n_sents)``
    with ``sent_idx`` 0-based in document order. Docs with no
    sentences (empty/NULL text) emit no rows."""
    staged = df.select(F.col(id_col),
                       sentences_expr(F.col(text_col)).alias("_s"))
    return (staged.select(
        id_col, F.size("_s").cast("long").alias("n_sents"),
        F.posexplode_outer("_s").alias("sent_idx", "sentence"))
        .where(F.col("sentence").isNotNull())
        .select(id_col, F.col("sent_idx").cast("long"), "sentence",
                "n_sents"))


def sentence_dedup(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_docs: int = 2,
                   min_len: int = 1,
                   broadcast_blacklist: bool = True) -> DataFrame:
    """Remove sentences recurring verbatim in >= ``min_docs`` docs
    (every occurrence — template noise has no keeper copy).

    Returns ``(id_col, n_sentences, n_removed, cleaned)`` with
    ``cleaned`` the surviving sentences re-joined by single spaces in
    document order. Sentences shorter than ``min_len`` chars are never
    counted or removed. Delegates the corpus pass to
    ``paragraph_dedup`` over a sentinel-delimited rendering, so the
    blacklist/broadcast/skew behavior is identical to the paragraph
    tier (see that docstring for the 100 TB audit).
    """
    staged = df.select(
        F.col(id_col),
        F.concat_ws(_SENTINEL, sentences_expr(F.col(text_col)))
        .alias("_s"))
    out = paragraph_dedup(staged, "_s", id_col, sep=_SENTINEL,
                          min_docs=min_docs, min_len=min_len,
                          broadcast_blacklist=broadcast_blacklist)
    return out.select(
        F.col(id_col),
        F.col("n_paragraphs").alias("n_sentences"), "n_removed",
        F.replace(F.col("cleaned"), F.lit(_SENTINEL), F.lit(" "))
        .alias("cleaned"))
