"""Pure-Catalyst extraction — zero Python at runtime.

Implements the same contract as the Arrow kernel using only built-in
higher-order functions (``transform``/``filter``/``sort_array``): the whole
operator is one JVM-side projection, whole-stage-codegen eligible, with no
Arrow serialization boundary at all. At 100 TB this is the cheapest possible
plan shape: scan → project → write, no exchange required by the operator
itself.

Caveat (documented in ``functions.text.post_process_text``): NFKC unicode
normalization is not expressible in Catalyst, so this path implements the
contract with ``normalize_unicode=False``. Use ``extract_arrow`` when NFKC
matters; golden tests verify both against the oracle at their respective
config.

Reading-order sort (L1) is ``sort_array`` over structs whose *leading*
fields are the sort key ``(offset_is_null, offset, original_position)`` —
lexicographic struct ordering gives the stable offset sort with
array-position tie-break, matching ``semantics.clean_doc``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.config import CATALYST_CONFIG, ExtractConfig
from rag_document_parser_spark.functions import text as X
from rag_document_parser_spark.semantics import KIND_CLASS


def _clean_text(s: Column, cfg: ExtractConfig) -> Column:
    kind, txt, ref = s["kind"], s["text"], s["media_ref"]
    html_leg = (X.html_dom_strip(txt, cfg) if cfg.html_mode == "dom"
                else X.post_process_text(X.html_strip(txt), cfg))
    return (
        F.when(kind == "html", html_leg)
        .when(kind.isin("text", "code"), X.post_process_text(txt, cfg))
        .when(kind == "xml", X.xml_strip(txt, cfg))
        .when(kind == "markdown", X.markdown_strip(txt, cfg))
        .when(kind == "rtf", X.rtf_strip(txt, cfg))
        # json: Catalyst implements the raw_json fallback leg of the
        # contract (cfg.flatten_json=False) — no JSON recursion in Catalyst
        .when(kind == "json", X.post_process_text(txt, cfg))
        .when(kind == "pdf_block", txt)
        .when(kind == "table", X.render_table(txt, cfg))
        .when(kind == "table_slide", X.render_table_lax(txt, cfg))
        .when(kind.isin("media", "media_slide"), X.ocr_standin(ref, kind, cfg))
        .when(kind == "slide",
              F.when(X.strip(txt) != "",
                     F.concat(F.lit("=== Slide "), txt, F.lit(" ==="))))
        .when(kind == "sheet",
              F.when(X.strip(txt) != "",
                     F.concat(F.lit("=== Sheet: "), txt, F.lit(" ==="))))
        .when(kind == "header",
              F.when(X.strip(txt) != "", F.concat(F.lit("[HEADER] "), txt)))
        .when(kind == "footer",
              F.when(X.strip(txt) != "", F.concat(F.lit("[FOOTER] "), txt)))
        .otherwise(txt)
    )


def _keep(s: Column) -> Column:
    """Keep predicate over the *cleaned* span struct."""
    kind, txt = s["kind"], s["text"]
    text_kinds = ("html", "text", "code", "xml", "markdown", "json", "rtf",
                  "pdf_block", "table", "table_slide", "header", "footer",
                  "slide", "sheet")
    return F.when(kind.isin("media", "media_slide"), F.lit(True)).otherwise(
        F.when(kind.isin(*text_kinds), txt.isNotNull() & (txt != ""))
        .otherwise(F.lit(True))
    )


def extract_catalyst(df: DataFrame, cfg: ExtractConfig = CATALYST_CONFIG) -> DataFrame:
    """documents(doc_id, spans) -> (doc_id, spans_clean, route, title, success, error, wall_us).

    Raises on configs this engine cannot implement (see CATALYST_CONFIG):
    silently downgrading normalize_unicode/flatten_json would diverge
    from the Arrow kernel and the semantics contract with no signal.
    """
    if cfg.normalize_unicode or cfg.flatten_json:
        raise ValueError(
            "extract_catalyst implements normalize_unicode=False (NFKC is "
            "not expressible in Catalyst) and flatten_json=False (the "
            "reference's raw_json fallback leg). Pass "
            "config.CATALYST_CONFIG, or use extract_arrow for the full "
            "DEFAULT_CONFIG semantics.")
    # 1. clean each span, carrying original position for the stable tie-break
    # (_title rides along after the sort-key fields; _pos is unique per
    # array so the struct sort never compares it)
    span_title = (
        (lambda s: F.when(s["kind"] == "html", X.html_title(s["text"])))
        if cfg.html_mode == "dom"
        else (lambda s: F.lit(None).cast("string"))
    )
    cleaned = F.transform(
        F.col("spans"),
        lambda s, i: F.struct(
            s["offset"].isNull().cast("int").alias("_onull"),
            F.coalesce(s["offset"], F.lit(0)).alias("_off"),
            i.alias("_pos"),
            span_title(s).alias("_title"),
            s["kind"].alias("kind"),
            _clean_text(s, cfg).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    kept = F.filter(cleaned, _keep)
    ordered = F.sort_array(kept)  # lexicographic on (_onull, _off, _pos, ...)
    spans_clean = F.transform(
        ordered,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    # doc title = first non-null span title in reading order (E1 metadata);
    # title_key = that span's (nl, off, pos) so chunk reassembly can merge
    # per-chunk titles exactly (null padding keeps element_at ANSI-safe)
    titled = F.filter(ordered, lambda s: s["_title"].isNotNull())
    keyed = F.transform(titled, lambda s: F.struct(
        s["_onull"].cast("int").alias("nl"),
        s["_off"].cast("int").alias("off"),
        s["_pos"].cast("int").alias("pos"),
        s["_title"].alias("t"),
    ))
    first_t = F.element_at(
        F.concat(keyed, F.array(F.lit(None).cast(
            "struct<nl:int,off:int,pos:int,t:string>"))), 1)
    doc_title = first_t["t"]
    title_key = F.when(first_t.isNotNull(), F.struct(
        first_t["nl"].alias("nl"), first_t["off"].alias("off"),
        first_t["pos"].alias("pos")))

    class_map = F.create_map(
        *[F.lit(x) for kv in KIND_CLASS.items() for x in kv]
    )
    classes = F.array_sort(F.array_distinct(F.transform(
        kept, lambda s: F.coalesce(class_map[s["kind"]], F.lit("other"))
    )))
    route = F.when(F.size(classes) > 0, F.array_join(classes, ",")).otherwise(
        F.lit("empty"))

    # unknown_kinds="error": the doc becomes an error result, named after
    # its first unrecognized kind in array order (semantics.clean_doc)
    if cfg.unknown_kinds == "error":
        unk = F.filter(F.col("spans"),
                       lambda s: class_map[s["kind"]].isNull())
        is_err = F.coalesce(F.size(unk) > 0, F.lit(False))
        err_msg = F.concat(F.lit("Unsupported kind: "),
                           F.coalesce(F.element_at(unk, 1)["kind"],
                                      F.lit("None")))
    else:
        is_err = F.lit(False)
        err_msg = F.lit(None).cast("string")

    empty = F.array().cast(spans_clean_type())
    return df.select(
        F.col("doc_id"),
        F.when(is_err, empty)
        .otherwise(F.coalesce(spans_clean, empty)).alias("spans_clean"),
        F.when(is_err, F.lit("error")).otherwise(route).alias("route"),
        F.when(~is_err, doc_title).alias("title"),
        F.when(~is_err, title_key).alias("title_key"),
        (~is_err).alias("success"),
        F.when(is_err, err_msg).alias("error"),
        F.lit(0).cast("long").alias("wall_us"),
    )


def spans_clean_type():
    from rag_document_parser_spark.schema import SPAN_ARRAY

    return SPAN_ARRAY
