"""WARC/WET ingestion (sources/warc.py): synth round trip, HTTP
response records, the Content-Length audit on mis-splits, malformed
chunks."""

from pyspark.sql import functions as F

from rag_document_parser_spark.sources import warc as W

CRLF = "\r\n"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_roundtrip_exact(spark):
    rows = [(1, "hello world"), (2, "نص عربي قصير"),
            (3, "multi\nline\ntext"), (4, "")]
    docs = _docs(spark, rows)
    recs = W.parse_warc_records(W.synth_warc_corpus(docs))
    got = {int(r["target_uri"].rsplit("/", 1)[1]): r
           for r in recs.collect()}
    assert set(got) == {1, 2, 3, 4}
    for did, text in rows:
        r = got[did]
        assert r["warc_type"] == "conversion"
        assert r["body"] == text
        assert r["content_length"] == len(text)
        assert r["len_ok"] is True
        assert r["http_status"] is None
        assert r["record_id"].startswith("<urn:uuid:")


def test_http_response_record(spark):
    body = "<html>hi</html>"
    http = ("HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html"
            + CRLF + CRLF + body)
    blob = (W.MAGIC + "WARC-Type: response" + CRLF
            + "WARC-Target-URI: http://x/" + CRLF
            + f"Content-Length: {len(http)}" + CRLF + CRLF
            + http + CRLF + CRLF)
    one = spark.createDataFrame([("f0", blob)],
                                "file_id string, blob string")
    r = W.parse_warc_records(one).collect()[0]
    assert (r["warc_type"], r["http_status"], r["body"],
            r["len_ok"]) == ("response", 200, body, True)


def test_embedded_magic_flagged_not_silent(spark):
    poison = "evil " + W.MAGIC + ("WARC-Type: conversion" + CRLF
                                  + "Content-Length: 3" + CRLF + CRLF
                                  + "abc")
    docs = _docs(spark, [(1, "clean"), (2, poison)])
    recs = W.parse_warc_records(W.synth_warc_corpus(docs)).collect()
    assert len(recs) == 3  # doc 2 fragments into host + embedded fake
    by_uri = {}
    for r in recs:
        by_uri.setdefault(r["target_uri"], []).append(r)
    host = by_uri["https://example.org/doc/2"][0]
    assert host["len_ok"] is False  # block truncated at embedded magic
    assert by_uri["https://example.org/doc/1"][0]["len_ok"] is True


def test_malformed_chunk_no_blank_line(spark):
    one = spark.createDataFrame(
        [("f0", W.MAGIC + "WARC-Type: broken" + CRLF)],
        "file_id string, blob string")
    r = W.parse_warc_records(one).collect()[0]
    assert r["warc_type"] == "broken"
    assert r["body"] == ""
    assert r["content_length"] is None and r["len_ok"] is None


def test_parse_plan_is_scan_local(spark):
    """Filter on parsed columns stays with the split in one stage —
    no Exchange before the generate+project pipeline."""
    docs = _docs(spark, [(i, f"text {i}") for i in range(20)])
    files = W.synth_warc_corpus(docs)
    plan = (W.parse_warc_records(files)
            .where(F.col("warc_type") == "conversion")
            ._jdf.queryExecution().executedPlan().toString())
    gen = plan.index("Generate")
    # the only Exchange is the synth groupBy upstream of Generate
    assert "Exchange" not in plan[:gen]
