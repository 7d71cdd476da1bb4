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


# Payment-card candidates: 13-19 digits with optional single space/dash
# separators between digits, word-bounded on both sides. The boundary
# anchors make a 20+-digit run yield NO candidate (every greedy retry
# leaves a digit adjacent to the match edge), so long ids/serials are
# never mistaken for cards — the same leftmost-first semantics under
# Java regex (Spark) and RE2 (DuckDB).
CARD_PATTERN = r"\b[0-9](?:[ \-]?[0-9]){12,18}\b"

# Luhn checksum over the separator-stripped digit string {d}: 1-based
# position i from the left doubles (with the >9 fold) exactly when
# (len - i) is odd — i.e. every second digit moving left from the
# check digit. Pure integer arithmetic, identical under Spark and the
# DuckDB oracle's list-comprehension twin.
_LUHN_SQL = (
    "length({d}) BETWEEN 13 AND 19 AND aggregate("
    "sequence(1, length({d})), 0, (acc, i) -> acc + "
    "(CASE WHEN (length({d}) - i) % 2 = 1 THEN "
    "if(cast(substring({d}, i, 1) AS INT) * 2 > 9, "
    "cast(substring({d}, i, 1) AS INT) * 2 - 9, "
    "cast(substring({d}, i, 1) AS INT) * 2) "
    "ELSE cast(substring({d}, i, 1) AS INT) END)) % 10 = 0"
)


def detect_cards(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Luhn-validated payment-card detection + redaction.

    Digit-run pattern matching alone false-positives on order numbers,
    timestamps, and serials; real PII scrubbers (and PCI-DSS scanners)
    validate the Luhn check digit before redacting. Returns
    ``(id_col, <passthrough>, n_card_candidates, n_card_valid,
    redacted)`` where candidates are word-bounded 13-19 digit runs
    (optional single space/dash separators), valid ones pass the Luhn
    mod-10 checksum, and ``redacted`` replaces each VALID candidate
    (as matched, separators and all) with ``<CARD>`` — invalid
    candidates stay untouched, because a failed checksum means the run
    is not a card and blanking it would destroy real content.

    At 100 TB: a row-local projection like :func:`redact_pii` — the
    extract / filter / fold chain is nested higher-order functions
    inside whole-stage codegen, zero Python, zero shuffles. Candidates
    per document are O(1) in practice, so the per-row fold is bounded.
    """
    keep = [c for c in df.columns if c != text_col]
    luhn = _LUHN_SQL.format(d="regexp_replace(c, '[ -]', '')")
    return (
        df.select(*keep, F.col(text_col).alias("_t"))
        .select("*", F.expr(
            f"regexp_extract_all(_t, r'{CARD_PATTERN}', 0)"
        ).alias("_cands"))
        # sort before the replace fold so redaction order (and thus the
        # output bytes) never depends on match order
        .select("*", F.expr(
            f"array_sort(filter(_cands, c -> {luhn}))").alias("_valid"))
        .select(
            *keep,
            F.size("_cands").cast("long").alias("n_card_candidates"),
            F.size("_valid").cast("long").alias("n_card_valid"),
            F.expr("aggregate(_valid, _t, "
                   "(acc, x) -> replace(acc, x, '<CARD>'))")
            .alias("redacted"),
        )
    )


# IBAN candidates: 2 uppercase country letters, 2 check digits, 11-30
# alphanumerics (total 15-34 chars), word-bounded. The mod-97 proof
# (ISO 13616 / ECBS): move the first 4 chars to the end, expand
# letters to two-digit values (A=10..Z=35), and the resulting decimal
# number must be ≡ 1 (mod 97). Computed as an incremental fold — the
# accumulator stays < 97·100 + 99, no big-integer needed — identical
# arithmetic in Spark and the DuckDB oracle's list_reduce twin.
IBAN_PATTERN = r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b"

_IBAN_SQL = (
    "aggregate(sequence(1, length({r})), 0, (acc, i) -> "
    "CASE WHEN ascii(substring({r}, i, 1)) BETWEEN 48 AND 57 "
    "THEN (acc * 10 + ascii(substring({r}, i, 1)) - 48) % 97 "
    "ELSE (acc * 100 + ascii(substring({r}, i, 1)) - 55) % 97 END"
    ") = 1"
)


def detect_ibans(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """mod-97-validated IBAN detection + redaction (the ``detect_cards``
    contract for international bank account numbers): candidates are
    word-bounded ``CCkk<bban>`` runs, valid ones pass the ISO 13616
    checksum, and ``redacted`` replaces each VALID candidate with
    ``<IBAN>`` — a failed checksum means the run is a reference code
    or serial, not an account, and stays untouched.

    Documented subset: structural pattern + mod-97 only; the
    per-country BBAN length registry is not consulted (a wrong-length
    candidate for its country still almost surely fails mod-97).
    Row-local projection: extract / filter / fold inside codegen, zero
    Python, zero shuffles.
    """
    keep = [c for c in df.columns if c != text_col]
    rearr = "concat(substring(c, 5), substring(c, 1, 4))"
    ok = _IBAN_SQL.format(r=rearr)
    return (
        df.select(*keep, F.col(text_col).alias("_t"))
        .select("*", F.expr(
            f"regexp_extract_all(_t, r'{IBAN_PATTERN}', 0)"
        ).alias("_cands"))
        .select("*", F.expr(
            f"array_sort(filter(_cands, c -> {ok}))").alias("_valid"))
        .select(
            *keep,
            F.size("_cands").cast("long").alias("n_iban_candidates"),
            F.size("_valid").cast("long").alias("n_iban_valid"),
            F.expr("aggregate(_valid, _t, "
                   "(acc, x) -> replace(acc, x, '<IBAN>'))")
            .alias("redacted"),
        )
    )
