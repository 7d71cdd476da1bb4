"""Property tests (SURVEY.md §5.2): contract invariants + cross-engine
regex agreement. No Spark needed — these pin the PYTHON oracle against
DuckDB's RE2 on adversarial inputs, which is the load-bearing assumption
behind every oracle_sql() entry.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from rag_document_parser_spark import semantics as S
from rag_document_parser_spark.config import ExtractConfig

CON = duckdb.connect()


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duck_regex_chain(text: str, *steps: tuple[str, str]) -> str:
    # build inner-out: regexp_replace(...(regexp_replace(?, p1, r1), p2, r2)...)
    expr = "?"
    for p, r in steps:
        expr = f"regexp_replace({expr}, {_sq(p)}, {_sq(r)}, 'g')"
    return CON.execute(f"SELECT {expr}", [text]).fetchone()[0]


# text strategy: heavy on regex-relevant characters (incl. pipes and
# fence openers for the markdown table/fence rules)
CHARS = st.sampled_from(list(
    "ab<>/& \t\n\r-*_#`[]()!\"'=:;.{}|xyz؀ۿé")
    + ["script", "style", "&amp;", "```", "```py\n", "\n```\n", "|---|"])
TEXTS = st.lists(CHARS, min_size=0, max_size=60).map("".join)


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_html_strip_matches_duckdb(s):
    expected = S.html_strip(s)
    got = duck_regex_chain(
        s, (S.RE_SCRIPT_STYLE, ""), (S.RE_TAG, ""),
        (S.RE_WS_RUN, " "), (S.RE_STRIP, ""))
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_post_process_matches_duckdb(s):
    cfg = ExtractConfig(normalize_unicode=False)
    expected = S.post_process_text(s, cfg)
    got = duck_regex_chain(
        s, (S.RE_EMPTY_LINES_LEAD, ""), (S.RE_EMPTY_LINES_MID, "\n"),
        (S.RE_SPACE_RUN, " "), (S.RE_STRIP, ""))
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_markdown_rules_match_duckdb(s):
    cfg = ExtractConfig(normalize_unicode=False)
    expected = S.markdown_strip(s, cfg)
    import __spark_entry__ as E

    expr = E._md_chain("?")  # the fence-aware oracle twin, verbatim
    for pat, repl in [(S.RE_EMPTY_LINES_LEAD, ""), (S.RE_EMPTY_LINES_MID, "\n"),
                      (S.RE_SPACE_RUN, " "), (S.RE_STRIP, "")]:
        expr = f"regexp_replace({expr}, {_sq(pat)}, {_sq(repl)}, 'g')"
    got = CON.execute(f"SELECT {expr}", [s]).fetchone()[0]
    assert got == expected


# \'hh-dense strategy: escapes for every interesting decode class
# (latin-1, window remap, undefined window points, NUL, ASCII,
# brace/backslash bytes), interleaved with near-miss fragments
RTFHEX_TOKENS = st.sampled_from([
    "\\'e9", "\\'93", "\\'94", "\\'80", "\\'9f", "\\'8d", "\\'90",
    "\\'00", "\\'41", "\\'7b", "\\'7d", "\\'5c", "\\'", "\\'g1", "\\'9",
    "a", " ", "\\", "'", "9", "f", "\n",
])
RTFHEX = st.lists(RTFHEX_TOKENS, min_size=0, max_size=30).map("".join)


@settings(max_examples=150, deadline=None)
@given(RTFHEX)
def test_rtf_hex_decode_matches_simulation(s):
    """The RTF \\'hh decode (cp1252 byte map) agrees with a from-scratch
    codecs-based simulation on arbitrary text."""
    import codecs
    import re

    def sim(m):
        b = bytes([int(m.group(1), 16)])
        try:
            return codecs.decode(b, "cp1252")
        except UnicodeDecodeError:
            return chr(b[0])  # the five undefined window points

    expected = re.sub(S.RE_RTF_HEX, sim, s)
    got = re.sub(S.RE_RTF_HEX,
                 lambda m: S.rtf_hex_char(int(m.group(1), 16)), s)
    assert got == expected


# markup-token strategy: mostly-malformed HTML — the DOM contract is a
# total function over regex passes, so every implementation must agree
# even on garbage input
MARKUP_TOKENS = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<p ", ">", "<", "<a href='x'>",
    "<a>", "</a>", "<a/ x>", "<abbr>", "</abbr>", "<script>", "</script>",
    "<style>", "</style>", "<!--", "-->", "<head>", "</head>",
    "<header>", "</header>", "<title>", "</title>", "<br>", "<hr>",
    "&amp;", "&nbsp;", "&copy;", "&lt;", "&unknown;", " ", "\t", "\n",
    "home", "x", "longer run of body text that passes density", "ن",
    # numeric charrefs: valid decimal/hex, cp1252 window, surrogate,
    # supplementary, truncated/invalid openers
    "&#65;", "&#160;", "&#146;", "&#x2019;", "&#x1D11E;", "&#xD800;",
    "&#0;", "&#", "&#;", "&#x;", "&#65", "&amp;#65;",
])
MARKUPS = st.lists(MARKUP_TOKENS, min_size=0, max_size=25).map("".join)


def _dom_sql_exprs():
    import __spark_entry__ as E

    # templates keep the 'wrapped' placeholder; each example inlines its
    # input as a SQL literal (the charref decode references its input
    # expression more than once, so a single `?` parameter can't bind it)
    body = "SELECT " + E._post_process_sql(E._DOM_JOINED)
    title = ("SELECT nullif("
             + E._disp_sql(f"regexp_extract(wrapped, {E.P_TITLE}, 1)")
             + ", '')")
    return body, title


_DOM_BODY_SQL, _DOM_TITLE_SQL = _dom_sql_exprs()


@settings(max_examples=150, deadline=None)
@given(MARKUPS)
def test_html_dom_matches_duckdb(s):
    cfg = ExtractConfig(normalize_unicode=False)
    assert CON.execute(_DOM_BODY_SQL.replace("wrapped", _sq(s))) \
        .fetchone()[0] == S.html_dom_strip(s, cfg)


@settings(max_examples=150, deadline=None)
@given(MARKUPS)
def test_html_title_matches_duckdb(s):
    assert CON.execute(_DOM_TITLE_SQL.replace("wrapped", _sq(s))) \
        .fetchone()[0] == S.html_title(s)


@settings(max_examples=100, deadline=None)
@given(TEXTS)
def test_post_process_idempotent(s):
    cfg = ExtractConfig(normalize_unicode=False)
    once = S.post_process_text(s, cfg)
    assert S.post_process_text(once, cfg) == once


SPAN = st.fixed_dictionaries({
    "kind": st.sampled_from(["text", "pdf_block", "html", "media", "header"]),
    "text": st.one_of(st.none(), TEXTS),
    "media_ref": st.one_of(st.none(), st.just("img://200x100/logo-chart")),
    "offset": st.integers(min_value=0, max_value=50),
})


@settings(max_examples=80, deadline=None)
@given(st.lists(SPAN, min_size=0, max_size=8), st.randoms())
def test_clean_doc_order_invariant_under_permutation(spans, rnd):
    """Docs with UNIQUE offsets produce identical spans_clean regardless of
    input span order (the position tie-break only matters for ties)."""
    seen, uniq = set(), []
    for sp in spans:
        if sp["offset"] not in seen:
            seen.add(sp["offset"])
            uniq.append(sp)
    base, _, _, _, _ = S.clean_doc(uniq)
    shuffled = list(uniq)
    rnd.shuffle(shuffled)
    got, _, _, _, _ = S.clean_doc(shuffled)
    assert got == base


@settings(max_examples=80, deadline=None)
@given(st.lists(SPAN, min_size=0, max_size=8))
def test_clean_doc_offsets_sorted(spans):
    out, route, _title, success, error = S.clean_doc(spans)
    offs = [s["offset"] for s in out if s["offset"] is not None]
    assert offs == sorted(offs)
    assert success is True and error is None


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 500), st.integers(0, 300),
       st.sampled_from(["media", "media_slide"]))
def test_ocr_gates(w, h, kind):
    ref = f"img://{w}x{h}/logo-chart"
    out = S.ocr_standin(ref, kind)
    min_w, min_h = S.OCR_GATES[kind]
    if not (w > min_w and h > min_h):
        assert out is None
    # deterministic: same input → same output
    assert S.ocr_standin(ref, kind) == out


# --- URL canonicalization: the rule chain must behave identically under
# Java regex (Spark), RE2 (DuckDB), and Python re — random messy URLs ---

from rag_document_parser_spark.operators.urls import (  # noqa: E402
    URL_CANON_RULES,
    _SCHEME_HOST,
)
import re as _re  # noqa: E402

URL_BITS = st.sampled_from([
    "https://", "http://", "EX.org", "a.b-c.COM", ":443", ":80", ":8080",
    "/path", "/P/", "/", "?", "&", "#frag", "#", "utm_source=x",
    "utm_a=", "fbclid=1", "gclid=", "id=42", "a=b", "=", "q",
])


def _py_canon(url: str) -> str:
    m = _re.match(_SCHEME_HOST, url)
    sh = m.group(1).lower() if m else ""
    rest = _re.sub(_SCHEME_HOST, "", url, count=1)
    rest = _re.sub(r"^:(80|443)/", "/", rest)
    rest = _re.sub(r"^:(80|443)$", "", rest)
    for pat, repl in URL_CANON_RULES:
        rest = _re.sub(pat, repl.replace("G1", "\\1"), rest)
    return sh + rest


@settings(max_examples=150, deadline=None)
@given(st.lists(URL_BITS, min_size=1, max_size=8).map("".join))
def test_url_canon_chain_matches_duckdb(u):
    url = "https://" + u if not u.startswith("http") else u
    sh = f"lower(regexp_extract(?, {_sq(_SCHEME_HOST)}, 1))"
    rest = f"regexp_replace(?, {_sq(_SCHEME_HOST)}, '', 'g')"
    rest = f"regexp_replace({rest}, '^:(80|443)/', '/', 'g')"
    rest = f"regexp_replace({rest}, '^:(80|443)$', '', 'g')"
    for pat, repl in URL_CANON_RULES:
        rest = (f"regexp_replace({rest}, {_sq(pat)}, "
                f"{_sq(repl.replace('G1', chr(92) + '1'))}, 'g')")
    got = CON.execute(f"SELECT {sh} || {rest}", [url, url]).fetchone()[0]
    assert got == _py_canon(url)
