"""Spreadsheet structure analysis (A15) — dialect sniff + sheet stats.

Re-expresses ``analyze_spreadsheet_structure``
(/root/reference/parsers/spreadsheet_parser.py:548-622) as pure Catalyst
column expressions over a text payload column:

- sample the first ``sample_lines`` lines (the reference reads <= 11);
- delimiter sniff: a documented, deterministic subset of ``csv.Sniffer``
  — among candidate delimiters, pick the one whose per-line occurrence
  count is most consistent with the first line's (ties break in
  candidate order), requiring at least one occurrence;
- columns = first-line field count under the sniffed delimiter;
- ``cells_with_data`` = non-blank cell count over the sample (the xlsx
  per-sheet ``cells_with_data`` analog, :612);
- ``has_header``: type-contrast subset of ``Sniffer.has_header`` — the
  first row has no numeric cells while the second does.

Everything is JVM-side string/array expressions — no UDFs — so the
operator pipelines with the scan at any scale (one projection, zero
shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DELIM_CANDIDATES = [",", ";", "\t", "|"]

RE_NUMERIC = r"^[0-9]+(\.[0-9]+)?$"


def _count(line: Column, d: str) -> Column:
    return F.length(line) - F.length(F.replace(line, F.lit(d), F.lit("")))


def sheet_structure(df: DataFrame, text_col: str = "payload",
                    id_col: str = "doc_id",
                    sample_lines: int = 11) -> DataFrame:
    lines = F.slice(F.split(F.col(text_col), "\n"), 1, sample_lines)
    first = F.element_at(lines, 1)

    cands = []
    for i, d in enumerate(DELIM_CANDIDATES):
        c0 = _count(first, d)
        consistent = F.size(F.filter(lines, lambda l: _count(l, d) == c0))
        # sortable key: consistency dominates, earlier candidate wins ties;
        # candidates absent from the first line are ineligible (-1)
        key = (F.when(c0 > 0, consistent * 16 + (15 - i))
               .otherwise(F.lit(-1)))
        cands.append(F.struct(key.alias("key"), F.lit(d).alias("delim"),
                              c0.alias("c0")))
    best = F.array_max(F.array(*cands))
    sniffed = best["key"] >= 0
    delimiter = F.when(sniffed, best["delim"])
    n_columns = F.when(sniffed, best["c0"] + 1).otherwise(F.lit(1))

    # literal-split pattern: \Qd\E quoting; unsniffable -> NUL (never
    # matches, whole line = one cell)
    esc = F.coalesce(F.concat(F.lit("\\Q"), delimiter, F.lit("\\E")),
                     F.lit("\\x00"))

    def cells(line: Column) -> Column:
        return F.split(line, esc)

    def numeric_cells(line: Column) -> Column:
        return F.size(F.filter(
            cells(line),
            lambda c: F.regexp_like(F.trim(c), F.lit(RE_NUMERIC))))

    cells_with_data = F.aggregate(
        lines, F.lit(0),
        lambda acc, l: acc + F.size(F.filter(cells(l),
                                             lambda c: F.trim(c) != "")))
    second = F.element_at(lines, 2)
    has_header = (
        (F.size(lines) > 1)
        & (numeric_cells(first) == 0)
        & (F.coalesce(numeric_cells(second), F.lit(0)) > 0)
    )

    return df.select(
        F.col(id_col),
        F.size(lines).alias("estimated_rows"),
        n_columns.alias("n_columns"),
        delimiter.alias("delimiter"),
        has_header.alias("has_header"),
        cells_with_data.alias("cells_with_data"),
    )
