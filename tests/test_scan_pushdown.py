"""Scan-level pushdown: filters and projections must reach the parquet
reader. A plan that reads all columns for a two-column projection, or
filters after a full scan, multiplies I/O by the table width at 100 TB
— these tests pin the scan contract for the patterns the operators
rely on."""

import re


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "Scan parquet" in ln or
            "PushedFilters" in ln or "ReadSchema" in ln], plan


SF_DIR = "/root/testdata/sf0.001"


def test_filter_pushed_to_documents_scan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lines, plan = _scan_lines(
        docs.where("lang = 'en'").select("doc_id", "n_chars"))
    joined = " ".join(lines)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", joined), plan


def test_projection_pruned_to_selected_columns(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lines, plan = _scan_lines(docs.select("doc_id", "lang"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", " ".join(lines))
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # text (the wide column) must NOT be read for a 2-column projection
    assert cols == {"doc_id", "lang"}, cols


def test_operator_input_scans_prune(spark):
    # quality_features reads only what it uses: text + the id
    from rag_document_parser_spark.operators.textstats import (
        quality_features)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lines, plan = _scan_lines(quality_features(docs))
    m = re.search(r"ReadSchema: struct<([^>]*)>", " ".join(lines))
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "text" in cols and "source" not in cols, cols


def test_qsketch_and_mixture_scans_prune_text(spark):
    # both stats passes must never read the wide text column
    from rag_document_parser_spark.operators.mixture import (
        temperature_weights)
    from rag_document_parser_spark.operators.sketches import qsketch_build

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (qsketch_build(docs, "n_chars"),
               temperature_weights(docs, "lang", size_col="n_chars")):
        lines, plan = _scan_lines(df)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>",
                             " ".join(lines)):
            cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            assert "text" not in cols, plan
