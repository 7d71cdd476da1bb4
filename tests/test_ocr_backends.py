"""Real-OCR backend integration (E41) + engine-fallback loop (E42).

The sandbox has no imaging libraries, so the two real-backend tests are
``importorskip``-guarded: they report SKIPPED here and activate — with
no edits — the day the environment gains easyocr / pytesseract+PIL.
The fallback-loop test needs no libs: it pickles a failing engine into
the mapInPandas closure and proves the chain skips it.
"""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators import multimodal as MM


def _png_with_text() -> bytes:
    """A tiny rendered-text PNG (needs PIL, so only the guarded tests
    call this)."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (220, 60), "white")
    ImageDraw.Draw(img).text((10, 20), "HELLO 42", fill="black")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_easyocr_recognize_contract():
    pytest.importorskip("easyocr")
    pytest.importorskip("PIL")
    toks = MM._easyocr_recognize(_png_with_text(), conf_threshold=0.0)
    assert isinstance(toks, list)
    for t, c in toks:
        assert isinstance(t, str) and 0.0 <= c <= 1.0
    # threshold=1.01 filters everything — the conf gate is live
    assert MM._easyocr_recognize(_png_with_text(), 1.01) == []


def test_tesseract_recognize_contract():
    pytest.importorskip("pytesseract")
    pytest.importorskip("PIL")
    toks = MM._tesseract_recognize(_png_with_text(), conf_threshold=0.0)
    assert isinstance(toks, list)
    for t, c in toks:
        assert isinstance(t, str) and t.strip() and 0.0 <= c <= 1.0


def test_engine_fallback_loop_skips_failing_engine(spark, monkeypatch):
    """E42: a raising engine falls through to the next one; the chosen
    engine name lands in ocr_engine. The fake engines travel to the
    Python workers inside the mapInPandas closure, so this exercises
    the real distributed path, not a driver-side shortcut."""
    def boom(payload, conf):
        raise RuntimeError("engine exploded")

    def fake(payload, conf):
        return [("ok", 0.9)] if payload else []

    monkeypatch.setattr(MM, "OCR_ENGINES", [
        ("boom", lambda: True, boom),
        ("fake", lambda: True, fake),
    ])
    media = spark.createDataFrame(
        [("img://10x10/a", bytearray(b"\x89PNG..."))],
        "media_ref string, payload binary")
    row = MM.ocr_media(media).collect()[0]
    assert row["ocr_engine"] == "fake"
    assert row["ocr_text"] == "ok"
    assert row["mean_conf_e4"] == 9000
