"""PII detection + redaction for training-data pipelines.

A web-scale corpus headed for model training needs personally
identifiable information scrubbed before anything else touches it.
This tier is pure Catalyst — a fixed, ordered chain of
``regexp_count`` / ``regexp_replace`` passes, one per PII category, so
the whole operator stays inside whole-stage codegen with zero Python
and zero shuffles (it is a row-local projection).

Pattern discipline (shared with the DuckDB oracle):

- RE2-safe: no lookaround, no backreferences, explicit ASCII classes —
  the same literal pattern string runs under Java regex (Spark) and
  RE2 (DuckDB) with identical match semantics (both leftmost-first).
- The chain is ORDERED and each stage counts on the output of the
  previous stage: emails are taken first (they may embed digit runs),
  then dotted quads, then SSN-shaped ids, then +international phone
  runs. Counting the progressively-redacted text means "n_phone" is
  exactly the number of ``<PHONE>`` tokens emitted, never a match that
  an earlier stage already consumed.
- Each stage is staged as a bound attribute via a stacked ``select``
  so Catalyst never re-inlines the (expensive) replace chain into a
  later count — see the lambda re-evaluation note in
  ``dedup.shingle_df``.

At 100 TB: a pure projection — no shuffle, no skew, scales linearly
with input splits; the regex passes are the only cost and they are
JVM-side and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, RE2-safe pattern, replacement token) — ORDER MATTERS; see
# module docstring. Tuple of tuples so callers can't mutate the chain.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # leading '+' is required: without an anchor this class would eat
    # arbitrary digit runs (dates, quantities) and the leftovers of the
    # SSN stage; international-prefix phones are the unambiguous form.
    ("phone", r"\+[0-9][0-9()\- ]{6,14}[0-9]", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII counts + redacted text.

    Returns ``(id_col, <passthrough cols>, n_email, n_ip, n_ssn,
    n_phone, redacted)`` where ``redacted`` has every match replaced by
    its ``<CATEGORY>`` token and each ``n_*`` is the number of tokens
    that stage emitted. Columns other than ``text_col`` pass through
    untouched, so callers can thread metadata without a re-join.
    """
    keep = [c for c in df.columns if c != text_col]
    out = df.select(*keep, F.col(text_col).alias("_t"))
    for name, pat, repl in PII_RULES:
        # one stacked select per stage: count + replace both read the
        # PREVIOUS stage's bound attribute, so the plan is a straight
        # projection pipeline, not an exponential re-inline
        out = out.select(
            "*",
            F.regexp_count("_t", F.lit(pat)).alias(f"n_{name}"),
        ).select(
            *[c for c in out.columns if c != "_t"], f"n_{name}",
            F.regexp_replace("_t", pat, repl).alias("_t"),
        )
    return out.withColumnRenamed("_t", "redacted")


def pii_features(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Counts-only variant (drops the redacted payload column)."""
    return redact_pii(df, text_col, id_col).drop("redacted")
