"""The Arrow extraction kernel — the engine's hot path.

``extract_arrow(df)`` runs the full extraction contract
(``semantics.clean_doc``) as a ``mapInArrow`` kernel: whole Arrow record
batches in, whole batches out. Everything inside operates on *flattened*
span arrays with ``pyarrow.compute`` (C++ vectorized) and numpy index
arithmetic — never per-row Python (north rule). The only Python-level loop
is over *unique* media slugs for the deterministic OCR stand-in, mirroring
the one-call-per-image reality of a real OCR engine
(/root/reference/parsers/image_parser.py:213-234); a real EasyOCR backend
would slot in at the same point as a per-executor lazy singleton
(/root/reference/parsers/image_parser.py:66-75 amortization, SURVEY.md §4).

Scale notes (100 TB): the kernel is shape-preserving (1 row in → 1 row out),
so it pipelines with the upstream salted exchange and the downstream write
without extra shuffles. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; giant documents are
pre-chunked by ``plans.job.chunk_giant_docs`` so a single doc cannot blow
the Arrow batch budget.
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rag_document_parser_spark.config import DEFAULT_CONFIG, ExtractConfig
from rag_document_parser_spark.schema import ARROW_KERNEL_OUTPUT, ARROW_SPAN_STRUCT
from rag_document_parser_spark import semantics as S

_KIND_CLASS_BIT = {
    "html": 1, "pdf": 2, "text": 4, "media": 8, "doc": 16, "other": 32,
}


def _nfkc(t: pa.Array) -> pa.Array:
    """True NFKC over a string array.

    NOT ``pc.utf8_normalize``: pyarrow's utf8proc backend decomposes but
    never RE-composes (its "NFC" output equals its "NFD" — observed on
    16.1.0), so its "NFKC" leaves é as e+U+0301, diverging from
    unicodedata/ICU NFKC. Instead: select the non-ASCII rows (NFKC is
    identity on ASCII), join them with NUL — combining class 0, no
    decomposition, so normalization never crosses the sentinel — and
    make ONE C-level ``unicodedata.normalize`` call per batch; per-row
    fallback only if a payload itself contains NUL."""
    import unicodedata

    need = pc.and_(pc.is_valid(t),
                   pc.invert(pc.string_is_ascii(pc.fill_null(t, "")))) \
        .to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(need)
    if not len(idx):
        return t
    sub = t.take(pa.array(idx)).to_pylist()
    if any("\x00" in s for s in sub):
        normed = [unicodedata.normalize("NFKC", s) for s in sub]
    else:
        normed = unicodedata.normalize("NFKC", "\x00".join(sub)) \
            .split("\x00")
    out = np.asarray(t.to_pandas(), dtype=object)
    out[idx] = normed
    return pa.array(out, type=pa.string())


def _e8(t, cfg: ExtractConfig):
    """E8 post-process chain over a whole Arrow string array
    (text_parser.py:339-362), shared by the text/xml/markdown/json routes."""
    if cfg.normalize_unicode:
        t = _nfkc(t)
    if cfg.remove_empty_lines:
        t = pc.replace_substring_regex(t, pattern=S.RE_EMPTY_LINES_LEAD, replacement="")
        t = pc.replace_substring_regex(t, pattern=S.RE_EMPTY_LINES_MID, replacement="\n")
    if not cfg.preserve_whitespace:
        t = pc.replace_substring_regex(t, pattern=S.RE_SPACE_RUN, replacement=" ")
    return pc.replace_substring_regex(t, pattern=S.RE_STRIP, replacement="")
_BIT_NAME = {1: "html", 2: "pdf", 4: "text", 8: "media", 16: "doc", 32: "other"}

# pc.extract_regex needs a named group; same pattern as semantics.RE_TITLE
_RE_TITLE_NAMED = S.RE_TITLE.replace("(.*?)", "(?P<t>.*?)")


def _gated_pass(arr, probe: str, fn, regex_probe: bool = False):
    """Run an expensive string transform only on elements containing
    ``probe`` (others pass through). Each replace pass is a full copy of
    the batch's text; on this contract most blocks contain no entities/
    comments/head, so probing (a read-only scan) before transforming
    cuts the DOM path's memory-bandwidth cost substantially — the
    binding resource when many cores share one socket."""
    matcher = (pc.match_substring_regex if regex_probe
               else pc.match_substring)
    has = pc.fill_null(matcher(arr, pattern=probe), False)
    out = fn(pc.if_else(has, arr, ""))
    return pc.if_else(has, out, arr)


# anchored fragment pattern with named groups for pc.extract_regex; (?s)
# because the fragment tail can contain newlines
_CHARREF_FRAG_NAMED = (r"(?s)^(?P<c>[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"
                       r"(?P<rest>.*)$")


def _decode_charrefs(arr):
    """semantics.decode_charrefs over a whole Arrow string array.

    Split on the "&#" opener; fragments after the first either start
    with a valid code (decode via a per-unique-code Python chr — the
    only Python here, bounded by DISTINCT references in the batch, same
    amortization class as the OCR-slug cache) or get their literal "&#"
    restored; rejoin positionally. Equivalent to re.sub's single pass.
    """
    parts = pc.split_pattern(arr, pattern="&#")
    flat = pc.list_flatten(parts)
    m = pc.extract_regex(flat, pattern=_CHARREF_FRAG_NAMED)
    # NB: field() of a null struct slot yields "" not null — gate every
    # use on the STRUCT validity
    m_ok = pc.is_valid(m).to_numpy(zero_copy_only=False)
    code_np = np.asarray(m.field("c").to_pandas(), dtype=object)
    cache: dict[str, str] = {}
    ch_np = np.empty(len(code_np), dtype=object)
    for i, cs in enumerate(code_np):
        if not m_ok[i]:
            continue
        got = cache.get(cs)
        if got is None:
            got = cache[cs] = S.charref_char(cs)
        ch_np[i] = got
    decoded = pc.binary_join_element_wise(
        pa.array(ch_np, type=pa.string()),
        pc.fill_null(m.field("rest"), ""), "")
    restored = pc.binary_join_element_wise(
        pa.array(["&#"] * len(flat), type=pa.string()), flat, "")
    # first fragment of each row is the literal prefix before any "&#"
    off = parts.offsets.to_numpy(zero_copy_only=False)
    first = np.zeros(len(flat), dtype=bool)
    first[off[:-1][off[:-1] < len(flat)]] = True
    pieces = pc.if_else(pa.array(first), flat,
                        pc.if_else(pc.is_valid(m), decoded, restored))
    return pc.binary_join(pa.ListArray.from_arrays(parts.offsets, pieces),
                          "")


def _visible(t):
    """Visible text of markup fragments: strip tags, decode numeric
    character references (html5-table subset) then the named entity
    subset (semantics.HTML_ENTITIES, &amp; last)."""
    t = pc.replace_substring_regex(t, pattern=S.RE_TAG, replacement="")

    def decode(x):
        x = _gated_pass(x, "&#", _decode_charrefs)
        for ent, ch in S.HTML_ENTITIES:
            x = pc.replace_substring(x, pattern=ent, replacement=ch)
        return x

    return _gated_pass(t, "&", decode)


def _nws_len_of_visible(vis) -> np.ndarray:
    """Non-whitespace char count of an already-computed visible-text
    array (density unit). Callers compute ``_visible`` once and reuse it
    for both the display text and the length — the entity chain is 7
    string passes, the most expensive part of the block pipeline."""
    t = pc.replace_substring_regex(vis, pattern=rf"[{S.WS}]",
                                   replacement="")
    return pc.utf8_length(t).to_numpy(zero_copy_only=False)


def _html_dom_batch(text: pa.Array, html_m: np.ndarray,
                    cfg: ExtractConfig) -> tuple[np.ndarray, np.ndarray]:
    """E1 DOM html extraction over a whole Arrow string array.

    Mirrors ``semantics.html_dom_strip`` / ``html_title``: script/style/
    comment/head removal, block segmentation at block-element boundaries,
    per-block link-density filtering, newline join, E8. All passes are
    C++ regex/list kernels over the flattened block array — no per-row
    Python. Returns (cleaned_text, title) numpy object arrays aligned to
    the batch; only positions where ``html_m`` holds are meaningful.
    """
    mask = pa.array(html_m)
    h_in = pc.if_else(mask, pc.fill_null(text, ""), "")

    # title capture (text_parser.py:159-162), gated on a <title probe
    ti_in = pc.if_else(
        pc.fill_null(pc.match_substring_regex(h_in, pattern="(?i)<title"),
                     False), h_in, "")
    ti_struct = pc.extract_regex(ti_in, pattern=_RE_TITLE_NAMED)
    ti = pc.replace_substring_regex(
        _visible(ti_struct.field("t")), pattern=S.RE_WS_RUN, replacement=" ")
    ti = pc.replace_substring_regex(ti, pattern=S.RE_STRIP, replacement="")
    ti_np = np.asarray(ti.to_pandas(), dtype=object)
    ti_np[ti_np == ""] = None

    # body: decompose script/style + comments + head, then segment
    # (comment/head passes gated on a substring probe — absent in most
    # real-world fragments and all non-wrapper spans)
    s1 = _gated_pass(
        h_in, "(?i)<script|<style",
        lambda x: pc.replace_substring_regex(
            x, pattern=S.RE_SCRIPT_STYLE, replacement=""),
        regex_probe=True)
    s1 = _gated_pass(
        s1, "<!--",
        lambda x: pc.replace_substring_regex(
            x, pattern=S.RE_HTML_COMMENT, replacement=""))
    s1 = _gated_pass(
        s1, "(?i)<head",
        lambda x: pc.replace_substring_regex(
            x, pattern=S.RE_HEAD, replacement=""),
        regex_probe=True)
    s1 = pc.replace_substring_regex(s1, pattern=S.RE_BLOCK_TAG,
                                    replacement=S.BLOCK_SEP)
    blocks = pc.split_pattern(s1, pattern=S.BLOCK_SEP)
    flat = pc.list_flatten(blocks)

    vis = _visible(flat)
    disp = pc.replace_substring_regex(vis, pattern=S.RE_WS_RUN,
                                      replacement=" ")
    disp = pc.replace_substring_regex(disp, pattern=S.RE_STRIP,
                                      replacement="")
    disp_np = np.asarray(disp.to_pandas(), dtype=object)
    # non-ws count of vis == len(disp) - its single-space count (collapse
    # and strip only touch [WS] chars) — a count instead of another
    # remove-pass copy
    tlen = (pc.utf8_length(disp).to_numpy(zero_copy_only=False)
            - pc.count_substring(disp, " ").to_numpy(zero_copy_only=False))
    # anchor-free blocks (the common case) have link_len 0 by definition;
    # run the anchor-removal pipeline only where an <a> could appear —
    # probe uses the same `<a\b` prefix as RE_ANCHOR so the gated subset
    # is exactly a superset of what the replace would touch (a ws-class
    # probe missed `<a/...` forms RE_ANCHOR matches: engine divergence)
    has_a = pc.match_substring_regex(flat, pattern=r"(?i)<a\b")
    sans_in = pc.if_else(has_a, flat, "")
    slen0 = _nws_len_of_visible(_visible(
        pc.replace_substring_regex(sans_in, pattern=S.RE_ANCHOR,
                                   replacement="")))
    has_a_np = pc.fill_null(has_a, False).to_numpy(zero_copy_only=False)
    slen = np.where(has_a_np, slen0, tlen)
    link = tlen - slen
    keep_b = (disp_np != "") & ~((2 * link > tlen)
                                 & (tlen < cfg.html_density_min_chars))

    vals = pa.array(np.where(keep_b, disp_np, ""), type=pa.string())
    joined = pc.binary_join(pa.ListArray.from_arrays(blocks.offsets, vals),
                            "\n")
    # dropped blocks joined as empty lines; collapsing them restores the
    # exact '\n'.join(kept) of the contract (kept lines are never blank)
    joined = pc.replace_substring_regex(
        joined, pattern=S.RE_EMPTY_LINES_LEAD, replacement="")
    joined = pc.replace_substring_regex(
        joined, pattern=S.RE_EMPTY_LINES_MID, replacement="\n")
    out = np.asarray(_e8(joined, cfg).to_pandas(), dtype=object)
    return out, ti_np


def _route_names(mask: int) -> str:
    if mask == 0:
        return "empty"
    return ",".join(sorted(_BIT_NAME[b] for b in _BIT_NAME if mask & b))


_ROUTE_LOOKUP = np.array([_route_names(m) for m in range(64)], dtype=object)


def _ocr_lookup(slugs: np.ndarray, kinds: np.ndarray,
                refs: np.ndarray, cfg: ExtractConfig) -> np.ndarray:
    """Deterministic OCR stand-in, computed once per unique (kind, ref)."""
    out = np.empty(len(slugs), dtype=object)
    out[:] = None
    cache: dict[tuple[str, str], object] = {}
    for i, (slug, kind, ref) in enumerate(zip(slugs, kinds, refs)):
        if slug is None:
            continue
        key = (kind, ref)
        if key not in cache:
            cache[key] = S.ocr_standin(ref, kind, cfg)
        out[i] = cache[key]
    return out


def _clean_batch(batch: pa.RecordBatch, cfg: ExtractConfig) -> pa.RecordBatch:
    t0 = time.perf_counter_ns()
    n = batch.num_rows
    doc_id = batch.column("doc_id")
    spans = batch.column("spans")

    flat = pc.list_flatten(spans)  # StructArray of every span in the batch
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kind = flat.field("kind")
    text = flat.field("text")
    media_ref = flat.field("media_ref")
    offset = flat.field("offset")
    m = len(flat)

    kind_np = np.asarray(kind.to_pandas(), dtype=object)

    def is_kind(*ks: str) -> np.ndarray:
        mask = np.zeros(m, dtype=bool)
        for k in ks:
            mask |= kind_np == k
        return mask

    html_m = is_kind("html")
    textlike_m = is_kind("text", "code")
    xml_m = is_kind("xml")
    md_m = is_kind("markdown")
    rtf_m = is_kind("rtf")
    json_m = is_kind("json")
    pdf_m = is_kind("pdf_block")
    table_m = is_kind("table")
    tslide_m = is_kind("table_slide")
    media_m = is_kind("media", "media_slide")
    hf_m = is_kind("header", "footer")
    blk_m = is_kind("slide", "sheet")
    known_m = (html_m | textlike_m | xml_m | md_m | rtf_m | json_m | pdf_m
               | table_m | tslide_m | media_m | hf_m | blk_m)

    # unknown_kinds="error": whole-doc error result for any doc carrying
    # an unrecognized kind (first such kind in array order names the
    # error, matching semantics.clean_doc / the reference's unsupported-
    # category ParseResult)
    err_doc = np.zeros(n, dtype=bool)
    err_msg = np.empty(n, dtype=object)
    err_msg[:] = None
    if cfg.unknown_kinds == "error":
        unk_idx = np.flatnonzero(~known_m)
        if len(unk_idx):
            u, fi = np.unique(parent[unk_idx], return_index=True)
            err_doc[u] = True
            for d, k in zip(u, kind_np[unk_idx][fi]):
                err_msg[d] = f"Unsupported kind: {k}"

    out_text = np.asarray(text.to_pandas(), dtype=object)
    keep = np.ones(m, dtype=bool)
    valid_text = np.asarray(pc.is_valid(text).to_numpy(zero_copy_only=False))

    # ---- html route: DOM path (E1, default) or regex fallback (E2) ----
    span_title = np.empty(m, dtype=object)
    span_title[:] = None
    if html_m.any():
        if cfg.html_mode == "dom":
            t_np, ti_np = _html_dom_batch(text, html_m, cfg)
            span_title[html_m] = ti_np[html_m]
        else:
            t = pc.replace_substring_regex(text, pattern=S.RE_SCRIPT_STYLE,
                                           replacement="")
            t = pc.replace_substring_regex(t, pattern=S.RE_TAG, replacement="")
            t = pc.replace_substring_regex(t, pattern=S.RE_WS_RUN,
                                           replacement=" ")
            t = pc.replace_substring_regex(t, pattern=S.RE_STRIP,
                                           replacement="")
            # E8 runs after the strip (text_parser.py:99) — only NFKC can
            # still change anything once whitespace is collapsed
            t_np = np.asarray(_e8(t, cfg).to_pandas(), dtype=object)
        out_text[html_m] = t_np[html_m]
        keep[html_m] = valid_text[html_m] & (t_np[html_m] != "")

    # ---- text/code route (E8 post-process; text_parser.py:339-362) ----
    if textlike_m.any():
        t_np = np.asarray(_e8(text, cfg).to_pandas(), dtype=object)
        out_text[textlike_m] = t_np[textlike_m]
        keep[textlike_m] = valid_text[textlike_m] & (t_np[textlike_m] != "")

    # ---- xml route (E3 + E8; text_parser.py:182-214) ----
    if xml_m.any():
        t = pc.if_else(pa.array(xml_m), pc.fill_null(text, ""), "")
        t = pc.replace_substring_regex(t, pattern=S.RE_XML_CDATA,
                                       replacement="\\1")
        t = pc.replace_substring_regex(t, pattern=S.RE_TAG, replacement="")
        t = _gated_pass(t, "&#", _decode_charrefs)
        for ent, ch in S.XML_ENTITIES:
            t = pc.replace_substring(t, pattern=ent, replacement=ch)
        t_np = np.asarray(_e8(t, cfg).to_pandas(), dtype=object)
        out_text[xml_m] = t_np[xml_m]
        keep[xml_m] = valid_text[xml_m] & (t_np[xml_m] != "")

    # ---- markdown route (E4 + E8; text_parser.py:216-248) ----
    if md_m.any():
        t = text
        for pat, repl in S.MD_RULES:
            t = pc.replace_substring_regex(
                t, pattern=pat, replacement=repl.replace("G1", "\\1"))
        t_np = np.asarray(_e8(t, cfg).to_pandas(), dtype=object)
        out_text[md_m] = t_np[md_m]
        keep[md_m] = valid_text[md_m] & (t_np[md_m] != "")

    # ---- rtf route (E27 + E8; document_parser.py:465-506) ----
    if rtf_m.any():
        t = text
        for pat, repl in S.RTF_RULES:
            t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
        t_np = np.asarray(_e8(t, cfg).to_pandas(), dtype=object)
        out_text[rtf_m] = t_np[rtf_m]
        keep[rtf_m] = valid_text[rtf_m] & (t_np[rtf_m] != "")

    # ---- json route (E5 + E8; text_parser.py:250-273) ----
    # json.loads is a per-document C-library call (mirroring the reference's
    # per-file parse), applied only to the masked rows; the E8 chain stays
    # whole-batch Arrow.
    if json_m.any():
        raw = np.asarray(text.to_pandas(), dtype=object)
        flats = np.empty(m, dtype=object)
        for i in np.flatnonzero(json_m):
            v = raw[i]
            if v is not None:
                flat = S.json_flatten(v) if cfg.flatten_json else None
                flats[i] = v if flat is None else flat
        t_np = np.asarray(
            _e8(pa.array(flats, type=pa.string()), cfg).to_pandas(),
            dtype=object)
        out_text[json_m] = t_np[json_m]
        keep[json_m] = valid_text[json_m] & (t_np[json_m] != "")

    # ---- pdf_block route: verbatim, drop empties (pdf_parser.py:141-160) ----
    if pdf_m.any():
        keep[pdf_m] = valid_text[pdf_m] & (out_text[pdf_m] != "")

    # ---- table routes (E14 strict pdf accept / E30 lax slide accept,
    # row/col caps, E38 render) ----
    # list-kernel form: split rows / cells as Arrow ListArrays, cap with
    # list_slice (semantics.render_table caps, reference utils/config.py:
    # 110-111), rejoin with binary_join — all C++-vectorized, no Python
    # per row. Non-table rows are blanked first so their payloads don't
    # pay the split cost.
    tbl_m = table_m | tslide_m
    if tbl_m.any():
        # blank invalid (null-text) rows too, not just non-table rows: a
        # null survives np.where as None -> null list after split ->
        # pc.list_element(piped, 0) raises ArrowInvalid and the catch-all
        # in make_kernel would fail the WHOLE batch, diverging from
        # clean_doc which just drops the span
        t_in = pa.array(np.where(tbl_m & valid_text, out_text, ""),
                        type=pa.string())
        rows = pc.split_pattern(t_in, pattern="\n")
        n_rows = pc.list_value_length(rows).to_numpy(zero_copy_only=False)
        rows_c = pc.list_slice(rows, 0, cfg.max_table_rows + 1)
        cells = pc.split_pattern(pc.list_flatten(rows_c), pattern="\t")
        piped_flat = pc.binary_join(
            pc.list_slice(cells, 0, cfg.max_table_columns), " | ")
        piped = pa.ListArray.from_arrays(rows_c.offsets, piped_flat)
        head = pc.list_element(piped, 0)
        rest = pc.binary_join(pc.list_slice(piped, 1, cfg.max_table_rows + 1),
                              "\n")
        dash = pc.replace_substring_regex(head, pattern=".", replacement="-")
        with_rest = np.asarray(
            pc.binary_join_element_wise(head, dash, rest, "\n").to_pandas(),
            dtype=object)
        head_only = np.asarray(
            pc.binary_join_element_wise(head, dash, "\n").to_pandas(),
            dtype=object)
        r_np = np.where(n_rows >= 2, with_rest, head_only)
        nonempty = np.zeros(m, dtype=bool)
        nonempty[tbl_m] = valid_text[tbl_m] & (out_text[tbl_m] != "")
        ok = (table_m & valid_text & (n_rows >= 2)) | (tslide_m & nonempty)
        out_text[tbl_m] = np.where(ok, r_np, None)[tbl_m]
        keep[tbl_m] = ok[tbl_m]

    # ---- media route: size gate + OCR stand-in over unique refs ----
    if media_m.any():
        ref_np = np.asarray(media_ref.to_pandas(), dtype=object)
        slug_struct = pc.extract_regex(media_ref, pattern=S.RE_MEDIA_REF.replace(
            "(\\d+)x(\\d+)/([A-Za-z0-9_\\-.]+)",
            "(?P<w>\\d+)x(?P<h>\\d+)/(?P<slug>[A-Za-z0-9_\\-.]+)"))
        slug_np = np.asarray(slug_struct.field("slug").to_pandas(), dtype=object)
        ocr = _ocr_lookup(slug_np[media_m], kind_np[media_m], ref_np[media_m], cfg)
        out_text[media_m] = ocr
        # media spans always kept (they carry media_ref)

    # ---- header/footer route (E21 prefixes; document_parser.py:571-593) ----
    if hf_m.any():
        trimmed = pc.utf8_trim_whitespace(text)
        nonblank = np.asarray(
            pc.fill_null(pc.not_equal(trimmed, ""), False).to_numpy(zero_copy_only=False))
        pref = np.where(kind_np == "header", "[HEADER] ", "[FOOTER] ")
        joined = np.char.add(pref[hf_m].astype(str),
                             np.where(valid_text[hf_m], out_text[hf_m], "").astype(str))
        out_text[hf_m] = np.where(nonblank[hf_m], joined.astype(object), None)
        keep[hf_m] = nonblank[hf_m]

    # ---- slide/sheet structural markers (E28/E38 prefixes) ----
    if blk_m.any():
        trimmed = pc.utf8_trim_whitespace(text)
        nonblank = np.asarray(
            pc.fill_null(pc.not_equal(trimmed, ""), False).to_numpy(zero_copy_only=False))
        pre = np.where(kind_np == "slide", "=== Slide ", "=== Sheet: ")
        joined = np.char.add(np.char.add(
            pre[blk_m].astype(str),
            np.where(valid_text[blk_m], out_text[blk_m], "").astype(str)), " ===")
        out_text[blk_m] = np.where(nonblank[blk_m], joined.astype(object), None)
        keep[blk_m] = nonblank[blk_m]

    # unknown kinds: passthrough (keep=True, text untouched) — unless the
    # doc was marked an error result above, which drops ALL its spans
    if err_doc.any():
        keep &= ~err_doc[parent]

    # ---- reading-order sort (L1) + reassembly ----
    off_np = offset.to_numpy(zero_copy_only=False).astype("float64")  # NaN = null
    off_null = np.isnan(off_np)
    off_fill = np.where(off_null, 0.0, off_np)

    kept_idx = np.flatnonzero(keep)
    par_k = parent[kept_idx]
    order = np.lexsort((kept_idx, off_fill[kept_idx], off_null[kept_idx], par_k))
    take_idx = kept_idx[order]

    # doc title = first non-null span title in reading order (E1 metadata),
    # plus its (nl, off, pos-in-doc) key so chunk reassembly can merge
    # per-chunk titles EXACTLY (plans.job._reassemble_big)
    doc_title = np.empty(n, dtype=object)
    doc_title[:] = None
    tk_nl = np.zeros(n, dtype=np.int32)
    tk_off = np.zeros(n, dtype=np.int32)
    tk_pos = np.zeros(n, dtype=np.int32)
    tk_has = np.zeros(n, dtype=bool)
    st = span_title[take_idx]
    t_valid = st != None  # noqa: E711  (elementwise on object array)
    if t_valid.any():
        u, fi = np.unique(parent[take_idx][t_valid], return_index=True)
        doc_title[u] = st[t_valid][fi]
        win_flat = take_idx[np.flatnonzero(t_valid)[fi]]
        lens = pc.fill_null(pc.list_value_length(spans), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        doc_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_start[1:])
        tk_has[u] = True
        tk_nl[u] = off_null[win_flat].astype(np.int32)
        tk_off[u] = off_fill[win_flat].astype(np.int32)
        tk_pos[u] = (win_flat - doc_start[parent[win_flat]]).astype(np.int32)

    counts = np.bincount(par_k, minlength=n)
    new_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=new_offsets[1:])

    take = pa.array(take_idx, type=pa.int64())
    clean_struct = pa.StructArray.from_arrays(
        [
            kind.take(take),
            pa.array(out_text[take_idx], type=pa.string()),
            media_ref.take(take),
            offset.take(take),
        ],
        fields=list(ARROW_SPAN_STRUCT),
    )
    spans_clean = pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()),
                                           clean_struct)

    # ---- route bitmask per doc (vectorized scatter-or) ----
    class_bits = np.zeros(m, dtype=np.int64)
    class_bits[html_m] = _KIND_CLASS_BIT["html"]
    class_bits[pdf_m | table_m] = _KIND_CLASS_BIT["pdf"]
    class_bits[textlike_m | xml_m | md_m | rtf_m | json_m] = _KIND_CLASS_BIT["text"]
    class_bits[media_m] = _KIND_CLASS_BIT["media"]
    class_bits[hf_m | blk_m | tslide_m] = _KIND_CLASS_BIT["doc"]
    class_bits[~known_m] = _KIND_CLASS_BIT["other"]
    routes = np.zeros(n, dtype=np.int64)
    np.bitwise_or.at(routes, par_k, class_bits[kept_idx])
    route_np = _ROUTE_LOOKUP[routes]
    if err_doc.any():
        route_np = np.where(err_doc, "error", route_np)
    route_arr = pa.array(route_np, type=pa.string())

    elapsed_us = (time.perf_counter_ns() - t0) // 1000
    wall = np.zeros(n, dtype=np.int64)
    if n:
        wall[0] = elapsed_us

    title_key = pa.StructArray.from_arrays(
        [pa.array(tk_nl), pa.array(tk_off), pa.array(tk_pos)],
        names=["nl", "off", "pos"],
        mask=pa.array(~tk_has),
    )
    return pa.RecordBatch.from_arrays(
        [
            doc_id,
            spans_clean,
            route_arr,
            pa.array(doc_title, type=pa.string()),
            title_key,
            pa.array(~err_doc),
            pa.array(err_msg, type=pa.string()),
            pa.array(wall),
        ],
        schema=ARROW_KERNEL_OUTPUT,
    )


def _error_batch(batch: pa.RecordBatch, err: str) -> pa.RecordBatch:
    n = batch.num_rows
    empty = pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)),
        pa.array([], type=ARROW_SPAN_STRUCT),
    )
    from rag_document_parser_spark.schema import ARROW_TITLE_KEY

    return pa.RecordBatch.from_arrays(
        [
            batch.column("doc_id"),
            empty,
            pa.array(["error"] * n, type=pa.string()),
            pa.array([None] * n, type=pa.string()),
            pa.array([None] * n, type=ARROW_TITLE_KEY),
            pa.array(np.zeros(n, dtype=bool)),
            pa.array([err] * n, type=pa.string()),
            pa.array(np.zeros(n, dtype=np.int64)),
        ],
        schema=ARROW_KERNEL_OUTPUT,
    )


def make_kernel(cfg: ExtractConfig = DEFAULT_CONFIG):
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            try:
                yield _clean_batch(batch, cfg)
            except Exception as e:  # catastrophic only; rules never raise
                yield _error_batch(batch, f"{type(e).__name__}: {e}")

    return kernel


def extract_arrow(df, cfg: ExtractConfig = DEFAULT_CONFIG):
    """documents(doc_id, spans) -> (doc_id, spans_clean, route, success, error, wall_us)."""
    from rag_document_parser_spark.schema import KERNEL_OUTPUT_SCHEMA

    return df.mapInArrow(make_kernel(cfg), KERNEL_OUTPUT_SCHEMA)
