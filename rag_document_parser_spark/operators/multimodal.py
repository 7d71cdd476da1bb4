"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The reference decodes real images for OCR (PIL/EasyOCR,
/root/reference/parsers/image_parser.py:147-259). Those libraries are not
in this container, so the *decode* step is stubbed — but everything Spark
cares about is real and tested:

- schema: ``media(media_ref string, modality string, payload binary,
  width int, height int, sample_rate int, duration_ms int)``
- batch shape: ``mapInPandas`` over Arrow batches; the stub measures the
  payload exactly the way a real decoder would receive it (contiguous
  bytes per batch, zero-copy from Arrow)
- partitioning: callers repartition on ``xxhash64(media_ref)`` before the
  decode pass so hot refs don't serialize a task
- per-executor singleton: ``_decoder()`` shows the lazy-init pattern a
  real EasyOCR/ffmpeg handle uses (init once per Python worker,
  /root/reference/parsers/image_parser.py:66-75 amortization)

Swap ``fake_decode_image`` for a real decoder and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("modality", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("modality", T.StringType()),
    T.StructField("payload_sha", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("decode_error", T.StringType()),
])

_DECODER = None


def _decoder():
    """Per-executor lazy singleton (the EasyOCR-init amortization pattern)."""
    global _DECODER
    if _DECODER is None:
        _DECODER = {"initialized": True}  # a real impl loads models here
    return _DECODER


def fake_decode_image(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→resize→feature-extract.

    A real implementation (PIL.open → resize → normalize → model) is not
    available in this container; raising NotImplementedError here would be
    correct too, but a deterministic fake lets the Spark-side plumbing be
    tested end-to-end. 8-dim feature from the payload digest.
    """
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_media_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media table → per-ref feature rows via an Arrow-batched pandas UDF.

    The pandas iterator shape is the real contract: each `pdf` chunk is an
    Arrow batch materialized as pandas; a real decoder loops the *batch*
    through the C library, not Spark rows through Python.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _decoder()
        for pdf in batches:
            feats, oks, errs, shas = [], [], [], []
            for payload in pdf["payload"]:  # per-image library call, as real
                try:
                    b = bytes(payload) if payload is not None else b""
                    feats.append(fake_decode_image(b))
                    shas.append(hashlib.sha256(b).hexdigest())
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # decoder errors are per-item data
                    feats.append(None)
                    shas.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "modality": pdf["modality"],
                "payload_sha": shas,
                "feature": feats,
                "decode_ok": oks,
                "decode_error": errs,
            })

    # decode-cost balancing: repartition on ref hash before the UDF pass
    balanced = df.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(64)))
    return balanced.mapInPandas(run, FEATURE_SCHEMA)


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench (payload = seeded bytes)."""
    return spark.range(n).select(
        F.concat(F.lit("img://64x64/m"), F.col("id")).alias("media_ref"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("modality"),
        F.encode(F.repeat(F.concat(F.lit("payload-"), F.col("id")), 16), "utf-8")
        .cast("binary").alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"), F.lit(1000).alias("duration_ms"),
    )
