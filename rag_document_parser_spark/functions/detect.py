"""Detection / routing tier (SURVEY.md §2.2, R1-R5) as pure Catalyst.

The reference detects a file's category via a cascade
(/root/reference/utils/file_detector.py:150-200): magic MIME → MIME map →
extension map (confidence 0.8) → guessed MIME (0.6) → txt-ish fallback
(0.5) → unknown. python-magic is a per-file C call and has no place in a
column engine; in the span model the routing key usually arrives as data.
This module re-expresses the *decision* tier — the maps and the cascade —
as broadcast-free CASE/COALESCE column expressions, so routing compiles
into whole-stage codegen and costs nothing at 100 TB.

The maps are transcribed from the reference verbatim:
- MIME → category: /root/reference/utils/file_detector.py:32-72
- extension → category: /root/reference/utils/file_detector.py:74-134
- MIME substring fallback (R5): /root/reference/utils/file_detector.py:224-246
- cascade + confidences (R4): /root/reference/utils/file_detector.py:150-200
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# /root/reference/utils/file_detector.py:32-72
MIME_CATEGORY = {
    "application/pdf": "pdf",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "document",
    "application/msword": "document",
    "application/vnd.oasis.opendocument.text": "document",
    "application/rtf": "document",
    "text/rtf": "document",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "powerpoint",
    "application/vnd.ms-powerpoint": "powerpoint",
    "application/vnd.oasis.opendocument.presentation": "powerpoint",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "spreadsheet",
    "application/vnd.ms-excel": "spreadsheet",
    "application/vnd.oasis.opendocument.spreadsheet": "spreadsheet",
    "text/csv": "spreadsheet",
    "text/plain": "text",
    "text/html": "text",
    "text/xml": "text",
    "application/xml": "text",
    "text/markdown": "text",
    "application/json": "text",
    "application/javascript": "text",
    "text/css": "text",
    "image/jpeg": "image",
    "image/png": "image",
    "image/gif": "image",
    "image/bmp": "image",
    "image/tiff": "image",
    "image/webp": "image",
    "image/svg+xml": "image",
}

# /root/reference/utils/file_detector.py:74-134
EXT_CATEGORY = {
    ".pdf": "pdf",
    ".docx": "document", ".doc": "document", ".odt": "document",
    ".rtf": "document", ".pages": "document", ".wpd": "document",
    ".wps": "document",
    ".pptx": "powerpoint", ".ppt": "powerpoint", ".odp": "powerpoint",
    ".key": "powerpoint",
    ".xlsx": "spreadsheet", ".xls": "spreadsheet", ".ods": "spreadsheet",
    ".csv": "spreadsheet", ".numbers": "spreadsheet",
    ".txt": "text", ".md": "text", ".markdown": "text", ".html": "text",
    ".htm": "text", ".xml": "text", ".json": "text", ".js": "text",
    ".css": "text", ".py": "text", ".java": "text", ".cpp": "text",
    ".c": "text", ".h": "text", ".yaml": "text", ".yml": "text",
    ".ini": "text", ".cfg": "text", ".conf": "text", ".log": "text",
    ".jpg": "image", ".jpeg": "image", ".png": "image", ".gif": "image",
    ".bmp": "image", ".tiff": "image", ".tif": "image", ".webp": "image",
    ".svg": "image",
}

# R4 txt-ish final fallback (/root/reference/utils/file_detector.py:190-194)
TXTISH_EXTS = (".txt", ".log", ".cfg", ".conf")


def _map_lookup(c: Column, mapping: dict[str, str]) -> Column:
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return m[c]


def category_from_mime(mime: Column) -> Column:
    """R2 + R5: MIME map, then the reference's substring fallbacks
    (/root/reference/utils/file_detector.py:224-246)."""
    lower = F.lower(mime)
    return F.coalesce(
        _map_lookup(mime, MIME_CATEGORY),
        F.when(mime.startswith("text/"), "text")
        .when(mime.startswith("image/"), "image")
        .when(lower.contains("pdf"), "pdf")
        .when(lower.contains("word") | lower.contains("document")
              | lower.contains("office"), "document")
        .when(lower.contains("excel") | lower.contains("spreadsheet")
              | lower.contains("sheet"), "spreadsheet")
        .when(lower.contains("powerpoint") | lower.contains("presentation"),
              "powerpoint"),
    )


def category_from_extension(ext: Column) -> Column:
    """R3: extension map (input should already be lowercased with dot)."""
    return _map_lookup(F.lower(ext), EXT_CATEGORY)


# R1 content sniffing — the python-magic leg of the cascade
# (/root/reference/utils/file_detector.py:150-165) re-expressed as magic
# signatures over the first payload bytes: hex-prefix match, pure
# Catalyst (hex + startswith compile into codegen). Signatures cover the
# reference's supported families; PK-zip is the container for all OOXML
# formats and D0CF11E0 for legacy OLE office files, which the cascade
# then refines by extension (exactly what libmagic + ext does).
MAGIC_SIGNATURES: list[tuple[str, str, str]] = [
    ("25504446", "application/pdf", "pdf"),                 # %PDF
    ("504b0304", "application/zip", "archive"),             # PK\x03\x04
    ("d0cf11e0a1b11ae1", "application/x-ole-storage", "document"),
    ("89504e47", "image/png", "image"),
    ("ffd8ff", "image/jpeg", "image"),
    ("47494638", "image/gif", "image"),
    ("7b5c727466", "application/rtf", "document"),          # {\rtf
    ("1f8b", "application/gzip", "archive"),
]


def sniff_magic(payload: Column) -> Column:
    """binary payload -> struct(mime, category) from magic bytes;
    both fields NULL when no signature matches."""
    hexp = F.lower(F.hex(F.substring(payload, 1, 8)))
    mime = F.lit(None).cast("string")
    cat = F.lit(None).cast("string")
    for sig, m, c in reversed(MAGIC_SIGNATURES):
        hit = hexp.startswith(sig)
        mime = F.when(hit, F.lit(m)).otherwise(mime)
        cat = F.when(hit, F.lit(c)).otherwise(cat)
    return F.struct(mime.alias("mime"), cat.alias("category"))


def detect_columns(df: DataFrame, mime_col: str = "mime_type",
                   ext_col: str = "extension",
                   payload_col: str | None = None) -> DataFrame:
    """R4 cascade: adds ``category`` + ``confidence`` columns.

    Mirrors /root/reference/utils/file_detector.py:150-200: content
    sniff (magic bytes, when a ``payload_col`` is given — the libmagic
    leg the reference tries FIRST) → 1.0; mime hit → 1.0; extension hit
    → 0.8; (guessed-mime leg collapses into the mime map here — a
    guessed MIME that maps is the same lookup, kept at 0.6 when the
    direct mime was null); txt-ish extension → 0.5; otherwise 'unknown'
    at 0.0. An archive-category sniff (zip/gzip container) defers to the
    extension, matching the reference's refine-by-extension behavior for
    OOXML containers.
    """
    mime, ext = F.col(mime_col), F.lower(F.col(ext_col))
    if payload_col is not None:
        sniffed = sniff_magic(F.col(payload_col))["category"]
        by_magic = F.when(sniffed != "archive", sniffed)
    else:
        by_magic = F.lit(None).cast("string")
    by_mime = category_from_mime(mime)
    by_ext = category_from_extension(ext)
    guessed = category_from_mime(_map_lookup(ext, GUESS_MIME))
    category = F.coalesce(
        by_magic, by_mime, by_ext, guessed,
        F.when(ext.isin(*TXTISH_EXTS), "text"),
        F.lit("unknown"),
    )
    confidence = (
        F.when(by_magic.isNotNull(), F.lit(1.0))
        .when(by_mime.isNotNull(), F.lit(1.0))
        .when(by_ext.isNotNull(), F.lit(0.8))
        .when(guessed.isNotNull(), F.lit(0.6))
        .when(ext.isin(*TXTISH_EXTS), F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    return df.withColumns({"category": category, "confidence": confidence})


# mimetypes.guess_type stand-in for the 0.6 leg — the small deterministic
# subset the cascade can reach (exts NOT in EXT_CATEGORY but with known
# MIME); kept tiny on purpose.
GUESS_MIME = {
    ".mp3": "audio/mpeg",
    ".mp4": "video/mp4",
    ".zip": "application/zip",
    ".gz": "application/gzip",
    ".tex": "application/x-tex",
}
