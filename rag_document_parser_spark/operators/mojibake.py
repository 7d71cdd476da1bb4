"""Mojibake repair: fix UTF-8 text that was once decoded as cp1252
(the single most common web-crawl encoding damage — ``Ã©`` for ``é``,
``â€œ`` for a left curly quote).

The reference decodes raw bytes ONCE with a confidence-gated sniff
(`/root/reference/utils/`, reimplemented in ``sources/decode.py``); it
has no repair pass for text that arrives *already* damaged — which at
crawl scale is most damage, because the mis-decode happened on someone
else's server years ago. This operator is the ftfy-style (Speer,
ftfy — public tool) repair leg for exactly that text, restricted to a
documented closed subset:

- **the cp1252- and latin-1-misdecode round-trips**, i.e. sequences
  that are the cp1252 OR ISO-8859-1 *decoding* of the UTF-8 *encoding*
  of: Latin-1 Supplement letters/punctuation (U+00A0–U+00FF), the
  cp1252 extras (Œ œ Š š Ÿ Ž ž ƒ ˆ ˜), and common Windows punctuation
  (– — ‘ ’ ‚ “ ” „ † ‡ • … ‰ ‹ › € ™). The two flavors differ only
  where a UTF-8 continuation byte lands in 0x80–0x9F: cp1252 shows a
  printable (``â€œ``), latin-1 a C1 control char — both occur in real
  crawls and both repair to the same target. Bytes hitting cp1252's
  five undefined slots (0x81 0x8D 0x8F 0x90 0x9D) simply have no
  cp1252-flavor rule (the latin-1 flavor still covers them); ftfy's
  wider "sloppy" codecs are out of subset.
- ONE repair pass, rules applied in a fixed order: trigraphs, then
  digraphs by ascending target codepoint, then the trigraphs ONCE
  more. Ascending digraph order unwinds double-encoded 2-byte targets
  in place (``ÃƒÂ©`` → (``Â©``→©) → (``Ãƒ``→Ã) → (``Ã©``→é)); the
  trailing trigraph pass catches the 3-byte targets those digraph
  repairs materialize (``Ã¢â€šÂ¬`` → ``â‚¬`` → €). The second pass
  cannot touch single-encoded text: the leading pass already consumed
  every original trigraph, so only double-encoded residue matches.
- Inherent ambiguity is accepted, not hidden: text that *legitimately*
  contains ``Ã©`` is indistinguishable from damage (ftfy has the same
  failure mode); the ``changed`` flag lets callers audit.

The rule table is GENERATED from the codec pair at import (pure
byte-level arithmetic, no hand-typed mappings to drift) and is the
single source for both the Spark chain and the DuckDB oracle's nested
``replace`` chain in ``__spark_entry__``.

Scale shape: a row-local projection — zero shuffles, zero Python at
runtime. Rows with none of the six possible damage lead-ins
(Â Ã Å Æ Ë â) skip the whole chain behind a ``when`` guard, so the
~120-replace chain prices only the damaged minority.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["MOJIBAKE_CHAIN", "MOJIBAKE_RULES", "fix_mojibake",
           "fix_mojibake_expr"]

# Windows punctuation whose UTF-8 form is 3 bytes (all lead with 0xE2)
_TRI_CPS = (0x2013, 0x2014, 0x2018, 0x2019, 0x201A, 0x201C, 0x201D,
            0x201E, 0x2020, 0x2021, 0x2022, 0x2026, 0x2030, 0x2039,
            0x203A, 0x20AC, 0x2122)
# cp1252 extras outside Latin-1 (2-byte UTF-8, lead bytes C5/C6/CB)
_EXTRA_CPS = (0x0152, 0x0153, 0x0160, 0x0161, 0x0178, 0x017D, 0x017E,
              0x0192, 0x02C6, 0x02DC)


def _build_rules() -> tuple[tuple[str, str], ...]:
    rules: list[tuple[str, str]] = []
    for group in (_TRI_CPS,
                  tuple(range(0xA0, 0x100)) + _EXTRA_CPS):
        for cp in sorted(group):
            ch = chr(cp)
            raw = ch.encode("utf-8")
            variants = []
            try:
                variants.append(raw.decode("cp1252"))
            except UnicodeDecodeError:
                pass  # byte in a cp1252 hole — no cp1252-flavor rule
            latin1 = raw.decode("latin-1")
            if latin1 not in variants:
                variants.append(latin1)
            rules.extend((m, ch) for m in variants)
    return tuple(rules)


MOJIBAKE_RULES: tuple[tuple[str, str], ...] = _build_rules()

# the APPLIED sequence: unique table + the trigraph rules once more at
# the end (double-encoding unwind for 3-byte targets, see module doc)
MOJIBAKE_CHAIN: tuple[tuple[str, str], ...] = MOJIBAKE_RULES + tuple(
    r for r in MOJIBAKE_RULES if len(r[0]) == 3)

# every rule's first char — the cheap row gate
_LEAD_CHARS = "".join(sorted({m[0] for m, _ in MOJIBAKE_RULES}))


def fix_mojibake_expr(c: Column) -> Column:
    """The repair chain as a column expression (NULL-safe, one pass).

    Clean rows (no lead-in char anywhere) return the input column
    unevaluated past one ``translate`` probe — the chain's ~190
    ``replace`` nodes run only on the damaged branch.
    """
    fixed = c
    for moji, ch in MOJIBAKE_CHAIN:
        fixed = F.replace(fixed, F.lit(moji), F.lit(ch))
    suspect = F.length(F.translate(c, _LEAD_CHARS, "")) < F.length(c)
    return F.when(c.isNull(), F.lit(None).cast("string")) \
            .when(suspect, fixed).otherwise(c)


def fix_mojibake(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-doc repair: ``(id_col, <passthrough>, fixed, changed)``.

    ``fixed`` is the repaired text (identical object for clean rows),
    ``changed`` a 0/1 INTEGER audit flag. Non-text columns pass through
    so callers thread metadata without a re-join (the ``redact_pii``
    convention).
    """
    keep = [c for c in df.columns if c != text_col]
    staged = df.select(*keep, F.col(text_col).alias("_t"),
                       fix_mojibake_expr(F.col(text_col)).alias("fixed"))
    return staged.select(
        *keep, "fixed",
        F.when(F.col("_t").isNull(), F.lit(0))
        .when(F.col("fixed") != F.col("_t"), F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("changed"))
