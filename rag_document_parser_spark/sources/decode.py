"""S8 — encoding-aware text decode (SURVEY.md §2.1).

The reference reads text files by trying the detected encoding, then
chardet (if confident), then a fixed list utf-8 / utf-16 / latin-1 /
cp1252 / iso-8859-1, always with ``errors='ignore'``
(/root/reference/parsers/text_parser.py:113-148). Spark's own readers
take one encoding for the whole load; per-row detection needs a kernel.

Batch-first design: the common case (valid UTF-8) is handled for the
WHOLE Arrow array by a single vectorized cast — only rows that fail
UTF-8 validation drop into the per-row fallback chain, mirroring how the
reference treats non-UTF-8 files as the exceptional path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# fixed fallback list (/root/reference/parsers/text_parser.py:134-144);
# utf-8 first is handled vectorized, the rest per failing row
FALLBACK_ENCODINGS = ("utf-8", "utf-16", "latin-1", "cp1252", "iso-8859-1")

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("text", T.StringType()),
    T.StructField("encoding", T.StringType()),
])


def _decode_one(b: bytes) -> tuple[str | None, str | None]:
    for enc in FALLBACK_ENCODINGS[1:]:
        try:
            return b.decode(enc, errors="ignore"), enc
        except Exception:
            continue
    return None, None


def _decode_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    doc_id = batch.column("doc_id")
    payload = batch.column("payload")
    n = batch.num_rows

    # vectorized fast path: one utf-8 validation pass over the whole array
    try:
        text = payload.cast(pa.string())
        enc = pa.array(np.where(
            pc.is_valid(payload).to_numpy(zero_copy_only=False),
            "utf-8", None), type=pa.string())
        return pa.RecordBatch.from_arrays([doc_id, text, enc],
                                          names=["doc_id", "text", "encoding"])
    except pa.ArrowInvalid:
        pass

    # mixed batch: validate per row (still a single C pass for the valid
    # majority), python-decode only the failures
    texts = np.empty(n, dtype=object)
    encs = np.empty(n, dtype=object)
    vals = payload.to_pylist()
    for i, b in enumerate(vals):
        if b is None:
            continue
        try:
            texts[i] = b.decode("utf-8")
            encs[i] = "utf-8"
        except UnicodeDecodeError:
            texts[i], encs[i] = _decode_one(b)
    return pa.RecordBatch.from_arrays(
        [doc_id, pa.array(texts, type=pa.string()),
         pa.array(encs, type=pa.string())],
        names=["doc_id", "text", "encoding"])


def decode_text_payloads(df: DataFrame) -> DataFrame:
    """(doc_id string, payload binary) → (doc_id, text, encoding)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield _decode_batch(batch)

    return df.select("doc_id", "payload").mapInArrow(run, DECODED_SCHEMA)
