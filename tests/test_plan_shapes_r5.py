"""Physical-plan shape pins for the round-5 web-source tier: the
docstring scale claims (zero-shuffle projection, no join in the suffix
probe, per-host window only) asserted structurally."""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _counts(df):
    p = _plan(df)
    return {
        "exchange": len(re.findall(r"Exchange hashpartitioning", p)),
        "bcast": len(re.findall(r"BroadcastHashJoin", p)),
        "smj": len(re.findall(r"SortMergeJoin", p)),
        "window": len(re.findall(r"\bWindow \[", p)),
        "plan": p,
    }


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"see http://a{i % 3}.pub{i % 5}.co.uk/p{i} "
             f"<meta property=\"og:title\" content=\"t{i}\"/>")
         for i in range(40)],
        ["doc_id", "text"])


def test_page_meta_is_a_pure_projection(docs):
    """Every extraction regex lives in the scan projection: zero
    shuffles, zero joins, zero windows."""
    from rag_document_parser_spark.operators.webmeta import page_meta
    c = _counts(page_meta(docs))
    assert c["exchange"] == 0, c["plan"]
    assert c["bcast"] == 0 and c["smj"] == 0 and c["window"] == 0, c["plan"]


def test_registrable_domain_probe_has_no_join(docs):
    """The suffix table is a literal isin probe, not a join; the only
    exchange is the publisher aggregate (map-side combinable)."""
    from rag_document_parser_spark.operators.urls import (
        registrable_domain_stats)
    c = _counts(registrable_domain_stats(docs))
    assert c["bcast"] == 0 and c["smj"] == 0, c["plan"]
    # the two count_distincts expand to a two-level hash aggregate:
    # exactly two exchanges (dedup level + final), both fed by partial
    # map-side aggregates, then TakeOrderedAndProject (no global sort)
    assert c["exchange"] == 2, c["plan"]
    assert "TakeOrderedAndProject" in c["plan"]


def test_frontier_schedule_one_host_window_no_smj(spark):
    """Per-host politeness ranking is the only Window; the guard rides
    a broadcast nested-loop (1-row frame), never a sort-merge join."""
    from rag_document_parser_spark.operators.frontier import (
        frontier_schedule)
    f = spark.createDataFrame(
        [(i, f"h{i % 4}", i % 7, 100) for i in range(40)],
        ["url_id", "host", "priority", "delay_ms"])
    c = _counts(frontier_schedule(f))
    assert c["window"] == 1, c["plan"]
    assert c["smj"] == 0, c["plan"]


def test_html_tables_is_a_pure_projection(spark):
    """Three nested block extracts + two posexplodes all live inside
    the scan: zero shuffles, zero joins."""
    from rag_document_parser_spark.operators.webmeta import html_tables
    df = spark.createDataFrame(
        [(1, "<table><tr><td>a</td></tr></table>")], ["doc_id", "text"])
    c = _counts(html_tables(df))
    assert c["exchange"] == 0 and c["bcast"] == 0 and c["smj"] == 0, \
        c["plan"]


def test_outlink_profile_single_aggregate_no_join(spark):
    """The registrable probe is a literal isin and explode_outer's
    NULL row keeps link-less docs through the one aggregate: exactly
    one exchange, no join of any kind."""
    from rag_document_parser_spark.operators.urls import outlink_profile
    df = spark.createDataFrame(
        [(1, "https://www.a.co.uk/p", "see https://b.com/x")],
        ["doc_id", "url", "text"])
    c = _counts(outlink_profile(df))
    assert c["exchange"] == 1, c["plan"]
    assert c["smj"] == 0 and c["bcast"] == 0, c["plan"]


def test_recrawl_schedule_single_aggregate_no_window(spark):
    """One map-side-combinable aggregate and a closed-form projection:
    exactly one exchange, zero windows, zero joins."""
    from datetime import datetime
    from rag_document_parser_spark.operators.frontier import (
        recrawl_schedule)
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), True)], ["url_id", "ts", "changed"])
    c = _counts(recrawl_schedule(df))
    assert c["exchange"] == 1 and c["window"] == 0, c["plan"]
    assert c["bcast"] == 0 and c["smj"] == 0, c["plan"]
