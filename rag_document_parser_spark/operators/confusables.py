"""Unicode confusable-skeleton normalization: the dedup-evasion
hardening pass. Exact and shingle dedup key on byte-identical tokens,
so a plagiarized or spam-duplicated document that swaps Latin letters
for Cyrillic/Greek homoglyphs (а for a, о for o) or salts text with
zero-width characters hashes as "new" while rendering identically.
UTS #39 (Unicode Security Mechanisms, "confusable detection") defines
the skeleton transform — map visually-confusable characters to a
canonical prototype, strip default-ignorable code points, THEN
compare. This module implements the documented high-frequency subset
as pure Catalyst string ops (the full UTS #39 data file is ~6k
mappings; the subset below covers the Cyrillic/Greek homoglyph
alphabet plus the invisible characters actually seen in web spam —
extend SKELETON_MAP to widen, both engines read the same table). The
reference has no security-normalization tier
(/root/reference/parsers/text_parser.py:339-362 normalizes
whitespace only).

NFKC (the extract kernel's normalizer, extract_arrow.py) is
complementary, not overlapping: NFKC folds COMPATIBILITY variants
(fullwidth Ａ, ligatures) but never crosses scripts — Cyrillic а
stays а under NFKC. Skeletonization is what closes that hole.

Scale shape: ``translate`` + ``regexp_replace`` inside the scan's
codegen span — zero shuffles, zero UDFs; the hardened-dedup query is
the existing ``dedup.exact_dedup`` shape keyed on the skeleton md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["SKELETON_MAP", "INVISIBLES", "skeleton", "confusable_stats",
           "skeleton_dedup_pairs"]

# visually-confusable -> Latin prototype (UTS #39 subset: the Cyrillic
# and Greek homoglyph alphabet). Single code point -> single code point,
# so one JVM-side translate() applies the whole table.
SKELETON_MAP = {
    # Cyrillic lowercase
    "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "х": "x",
    "у": "y", "і": "i", "ѕ": "s", "ј": "j", "ԁ": "d", "ɡ": "g",
    "һ": "h", "ԛ": "q", "ԝ": "w", "ν": "v",
    # Cyrillic uppercase
    "А": "A", "В": "B", "Е": "E", "К": "K", "М": "M", "Н": "H",
    "О": "O", "Р": "P", "С": "C", "Т": "T", "Х": "X", "Ѕ": "S",
    "І": "I", "Ј": "J", "Ԛ": "Q", "Ԝ": "W",
    # Greek
    "ο": "o", "α": "a", "ι": "i", "κ": "k", "ρ": "p", "τ": "t",
    "υ": "u", "Α": "A", "Β": "B", "Ε": "E", "Ζ": "Z", "Η": "H",
    "Ι": "I", "Κ": "K", "Μ": "M", "Ν": "N", "Ο": "O", "Ρ": "P",
    "Τ": "T", "Υ": "Y", "Χ": "X",
}

# default-ignorable / invisible code points stripped by the skeleton:
# zero-width space/joiners, word joiner, BOM, soft hyphen, LTR/RTL marks
INVISIBLES = "​‌‍⁠﻿­‎‏"

_FROM = "".join(SKELETON_MAP)
_TO = "".join(SKELETON_MAP.values())
_INVIS_RE = "[" + INVISIBLES + "]"


def skeleton(c: Column) -> Column:
    """UTS #39-subset skeleton of a string column: confusables mapped
    to their Latin prototypes, invisibles removed. Pure Catalyst."""
    return F.regexp_replace(F.translate(c, _FROM, _TO), _INVIS_RE, "")


def confusable_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc evasion signals: ``(id_col, n_confusables,
    n_invisibles, changed)`` — how many characters the skeleton
    rewrote or removed, and whether the doc was touched at all (the
    gate a curation chain uses to route suspicious docs into hardened
    dedup)."""
    t = F.col(text_col)
    n_conf = (F.length(t)
              - F.length(F.translate(t, _FROM, ""))).cast("long")
    n_invis = (F.length(t)
               - F.length(F.regexp_replace(t, _INVIS_RE, ""))
               ).cast("long")
    return df.select(
        F.col(id_col),
        n_conf.alias("n_confusables"),
        n_invis.alias("n_invisibles"),
        ((n_conf + n_invis) > 0).alias("changed"))


def skeleton_dedup_pairs(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate pairs UNDER the skeleton: ``(id_a, id_b)``
    where the skeletons are byte-identical but at least one side was
    rewritten (raw-identical dups are the plain ``exact_dedup``'s
    catch — this reports only what evasion HID from it). One uniform
    shuffle on the skeleton md5; pairs form per-group against the
    md5-minimal representative, never all-pairs."""
    sk = df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("raw_md5"),
        F.md5(skeleton(F.col(text_col))).alias("skel_md5"))
    grp = (sk.groupBy("skel_md5")
           .agg(F.count("*").alias("n"),
                F.count_distinct("raw_md5").alias("n_raw"),
                F.min(F.struct("id", "raw_md5")).alias("rep"))
           .where((F.col("n") > 1) & (F.col("n_raw") > 1)))
    return (sk.join(grp, "skel_md5")
            .where(F.col("id") != F.col("rep.id"))
            .select(F.col("rep.id").alias("id_a"),
                    F.col("id").alias("id_b"),
                    (F.col("raw_md5") != F.col("rep.raw_md5"))
                    .alias("disguised")))
