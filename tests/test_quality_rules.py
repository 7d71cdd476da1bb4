"""Gopher quality-rule battery (Rae et al. 2021 §A1.1.2) — hand cases.

Each rule gets a document engineered to fail exactly that rule while a
control document passes all seven; parity with the DuckDB twin is
covered corpus-wide by tests/test_entry_oracle.py (`gopher_rules`).
"""

import pytest

from rag_document_parser_spark.operators.textstats import gopher_rules

# 60 words, mean word length ~3.4, two+ required stopwords, no symbols.
GOOD = " ".join(["the cat sat with the dog and that was fine"] * 6)


def _rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = gopher_rules(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


@pytest.fixture(scope="module")
def flags(spark):
    docs = [
        ("good", GOOD),
        ("short", "the cat sat with the dog"),
        ("long_words", " ".join(["incomprehensibilities"] * 60) + " the of"),
        ("symbols", GOOD + " " + "#" * 20),
        ("bullets", "\n".join("- item " + GOOD for _ in range(10))),
        ("ellipses", "\n".join([GOOD + " ..."] * 4 + [GOOD] * 6)),
        ("numeric", " ".join(["1234"] * 60) + " the of"),
        ("no_stop", " ".join(["lorem ipsum dolor sit amet"] * 12)),
        ("empty", ""),
    ]
    return _rows(spark, docs)


def test_good_doc_keeps(flags):
    g = flags["good"]
    assert g["keep"] == 1
    assert all(g[k] == 1 for k in (
        "word_count_ok", "mean_wlen_ok", "symbol_ok", "bullet_ok",
        "ellipsis_ok", "alpha_ok", "stopword_ok"))
    assert g["n_words"] == 60


def test_word_count_rule(flags):
    assert flags["short"]["word_count_ok"] == 0
    assert flags["short"]["keep"] == 0


def test_mean_word_length_rule(flags):
    lw = flags["long_words"]
    assert lw["mean_wlen_ok"] == 0          # 21-char words >> 10 cap
    assert lw["stopword_ok"] == 1           # 'the' + 'of' present


def test_symbol_ratio_rule(flags):
    s = flags["symbols"]
    # 20 hashes over 60 words = 0.33 > 0.1
    assert s["symbol_ok"] == 0
    assert flags["good"]["symbol_ok"] == 1


def test_bullet_rule(flags):
    b = flags["bullets"]
    assert b["bullet_ok"] == 0              # 100% of lines bulleted
    assert b["word_count_ok"] == 1


def test_ellipsis_rule(flags):
    e = flags["ellipses"]
    assert e["ellipsis_ok"] == 0            # 40% of lines > 30% cap
    assert flags["good"]["ellipsis_ok"] == 1


def test_alpha_words_rule(flags):
    n = flags["numeric"]
    assert n["alpha_ok"] == 0               # 60/62 words purely digits


def test_stopword_rule(flags):
    ns = flags["no_stop"]
    assert ns["stopword_ok"] == 0
    assert ns["alpha_ok"] == 1


def test_empty_doc_fails_closed(flags):
    e = flags["empty"]
    assert e["keep"] == 0
    assert e["n_words"] == 0
    # zero-word rules fail closed; line rules see one empty line
    assert e["word_count_ok"] == 0 and e["alpha_ok"] == 0
    assert e["bullet_ok"] == 1 and e["ellipsis_ok"] == 1


# ---- C4 line filter (Raffel et al. 2020 §2.2) --------------------------

from rag_document_parser_spark.operators.textstats import c4_line_filter

C4_DOCS = [
    # 4 good sentences (>=5 words, terminal punct) + 1 bad line
    ("keep", "the quick brown fox jumps.\n"
             "a lazy dog sleeps right here!\n"
             "did the fox jump over him?\n"
             'he said "yes it really did."\n'
             "short line."),
    # every line lacks terminal punctuation -> 0 survivors
    ("no_punct", "the quick brown fox jumps\na lazy dog sleeps here"),
    # javascript line dropped, remaining 3 sentences keep the doc
    ("js", "please enable javascript to view this.\n"
           "the quick brown fox jumps high.\n"
           "a lazy dog sleeps right here.\n"
           "did the fox jump over him?"),
    # curly brace nukes the whole doc even with good lines
    ("brace", "the quick brown fox jumps high.\n"
              "a lazy dog sleeps right here.\n"
              "did the fox jump over {him}?"),
    # lorem ipsum marker nukes the doc
    ("lorem", "Lorem Ipsum dolor sit amet text.\n"
              "the quick brown fox jumps high.\n"
              "a lazy dog sleeps right here."),
    # only two sentences survive -> below the 3-sentence floor
    ("two", "the quick brown fox jumps high.\n"
            "a lazy dog sleeps right here."),
    ("empty", ""),
]


@pytest.fixture(scope="module")
def c4(spark):
    df = spark.createDataFrame(C4_DOCS, "doc_id string, text string")
    return {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}


def test_c4_keeps_and_rejoins(c4):
    k = c4["keep"]
    assert k["keep"] == 1
    assert k["n_lines"] == 5 and k["kept_lines"] == 4
    assert k["clean_text"].count("\n") == 3        # 4 lines rejoined
    assert "short line." not in k["clean_text"]    # <5 words dropped


def test_c4_no_terminal_punct(c4):
    assert c4["no_punct"]["kept_lines"] == 0
    assert c4["no_punct"]["keep"] == 0
    assert c4["no_punct"]["clean_text"] is None


def test_c4_javascript_line_dropped(c4):
    j = c4["js"]
    assert j["kept_lines"] == 3 and j["keep"] == 1
    assert "javascript" not in j["clean_text"]


def test_c4_brace_and_lorem_gate(c4):
    assert c4["brace"]["keep"] == 0 and c4["brace"]["clean_text"] is None
    assert c4["lorem"]["keep"] == 0


def test_c4_sentence_floor(c4):
    t = c4["two"]
    assert t["kept_lines"] == 2 and t["sentences"] == 2
    assert t["keep"] == 0


def test_c4_empty(c4):
    e = c4["empty"]
    assert e["n_lines"] == 1 and e["kept_lines"] == 0
    assert e["sentences"] == 0 and e["keep"] == 0


# ---------------------------------------------------------------------------
# license / usage-rights signals
# ---------------------------------------------------------------------------

from rag_document_parser_spark.operators.textstats import license_signals

_LIC_DOCS = [
    ("cc", "Shared under a Creative Commons Attribution license."),
    ("pd", "This text is in the public domain and free to use."),
    ("mit", "Code licensed under the MIT License. See LICENSE file."),
    ("apache", "Licensed under the Apache License, Version 2.0."),
    ("gpl", "Terms: GNU General Public License v3 or later."),
    ("arr", "Copyright 2020 Acme. All rights reserved."),
    # copyright word only -> no license label but restricted
    ("conly", "copyright (c) 2019 somebody"),
    # precedence: CC footer quoting a rights line still labels cc
    ("both", "Creative Commons BY 4.0. All rights reserved."),
    ("none", "plain prose with no rights language at all"),
]


@pytest.fixture(scope="module")
def lic(spark):
    df = spark.createDataFrame(_LIC_DOCS, "doc_id string, text string")
    return {r["doc_id"]: r for r in license_signals(df).collect()}


def test_license_labels_and_precedence(lic):
    assert lic["cc"]["license"] == "cc"
    assert lic["pd"]["license"] == "public-domain"
    assert lic["mit"]["license"] == "mit"
    assert lic["apache"]["license"] == "apache"
    assert lic["gpl"]["license"] == "gpl"
    assert lic["arr"]["license"] == "all-rights-reserved"
    assert lic["both"]["license"] == "cc"  # first marker wins
    assert lic["none"]["license"] == "none"


def test_license_restricted_routing_bit(lic):
    # permissive labels never restricted, rights-only text is
    assert lic["cc"]["restricted"] == 0
    assert lic["pd"]["restricted"] == 0
    assert lic["mit"]["restricted"] == 0
    assert lic["apache"]["restricted"] == 0
    assert lic["gpl"]["restricted"] == 1
    assert lic["arr"]["restricted"] == 1
    assert lic["conly"]["license"] == "none"
    assert lic["conly"]["has_copyright"] == 1
    assert lic["conly"]["restricted"] == 1
    assert lic["none"]["restricted"] == 0
    assert lic["both"]["restricted"] == 0  # cc wins the route


def test_license_copyright_flag_case_insensitive(lic):
    assert lic["arr"]["has_copyright"] == 1
    assert lic["conly"]["has_copyright"] == 1
    assert lic["none"]["has_copyright"] == 0


# ---------------------------------------------------------------------------
# per-source quality prior
# ---------------------------------------------------------------------------

from rag_document_parser_spark.operators.textstats import source_quality_prior

_PRIOR_DOCS = [
    # source A: 2 pass, 1 fail (too short)
    ("a", "good", "the quick brown fox jumps over the lazy sleeping dog"),
    ("a", "good2", "open source engines improved their optimisers a lot"),
    ("a", "short", "hi there"),
    # source B: 1 pass, 1 fail (alpha share below 10% — the alpha class
    # counts letters AND spaces, so the fail doc must be space-free too)
    ("b", "good", "a perfectly ordinary sentence with plenty of words here"),
    ("b", "nums", "1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20"),
]


def test_source_prior_counts_and_fixed_point_rate(spark):
    df = spark.createDataFrame(
        [(s, f"{s}/{d}", t) for s, d, t in _PRIOR_DOCS],
        "source string, doc_id string, text string")
    got = {r["source"]: r for r in source_quality_prior(df).collect()}
    assert got["a"]["n_docs"] == 3 and got["a"]["n_pass"] == 2
    assert got["a"]["pass_rate_e6"] == 2 * 1_000_000 // 3
    assert got["b"]["n_docs"] == 2 and got["b"]["n_pass"] == 1
    assert got["b"]["pass_rate_e6"] == 500_000
    # total_words sums the shared tokenizer's counts (alnum runs)
    assert got["b"]["total_words"] == 9 + 20


def test_source_prior_partition_invariant(spark):
    df = spark.createDataFrame(
        [(s, f"{s}/{d}", t) for s, d, t in _PRIOR_DOCS],
        "source string, doc_id string, text string")
    a = sorted(map(tuple, source_quality_prior(df).collect()))
    b = sorted(map(tuple, source_quality_prior(df.repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# fixed-point readability
# ---------------------------------------------------------------------------


def test_readability_fixed_point_formula(spark):
    from rag_document_parser_spark.operators.textstats import readability

    # "the cat sat. a dog ran away." -> 2 sentences, 7 words,
    # syllables: the=1 cat=1 sat=1 a=1 dog=1 ran=1 away=2 -> 8
    df = spark.createDataFrame(
        [(1, "the cat sat. a dog ran away."),
         (2, ""), (3, "!!! ...")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = got[1]
    assert (r1["n_sents"], r1["n_words"], r1["n_syllables"]) == (2, 7, 8)
    assert r1["flesch_e3"] == 206835 - 7 * 1015 // 2 - 8 * 84600 // 7
    assert got[2]["flesch_e3"] is None      # no words
    assert got[3]["flesch_e3"] is None


def test_readability_syllable_proxy_floors_at_one(spark):
    from rag_document_parser_spark.operators.textstats import readability

    # vowel-less and non-latin words count 1 syllable each
    df = spark.createDataFrame([(1, "xyz qrst нет 123")],
                               "doc_id long, text string")
    r = readability(df).collect()[0]
    assert r["n_syllables"] == r["n_words"]


# ---------------------------------------------------------------------------
# corpus datasheet
# ---------------------------------------------------------------------------


def test_corpus_datasheet_metrics(spark):
    from rag_document_parser_spark.reporting import corpus_datasheet

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "a", "en"),
         (2, "the quick brown fox jumps over the lazy dog", "a", "en"),
         (3, "entirely different prose with several proper words", "b",
          "en"),
         (4, "kurze worte hier stehen fuenf", "b", "de"),
         (5, "x", "c", "en")],
        "doc_id long, text string, source string, lang string")
    got = {r["metric"]: r["value"] for r in corpus_datasheet(df).collect()}
    assert got["n_docs"] == 5
    assert got["n_sources"] == 3 and got["n_langs"] == 2
    assert got["distinct_texts"] == 4 and got["exact_dup_docs"] == 1
    assert got["quality_pass"] == 4          # doc 5 fails min_words
    assert got["quality_pass_e6"] == 4 * 1_000_000 // 5
    assert got["total_tokens"] == 9 + 9 + 7 + 5 + 1
    assert got["mean_tokens_e3"] == got["total_tokens"] * 1000 // 5


# ---------------------------------------------------------------------------
# tokenizer fertility + snapshot drift
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_planted(spark):
    """Two langs; a fake segmentation doubles lang-b's subword count:
    fertility_e3 = 1000 for a, 2000 for b, chars counted per lang."""
    from rag_document_parser_spark.operators.textstats import (
        tokenizer_fertility)

    docs = spark.createDataFrame(
        [(1, "one two three", "a"), (2, "four five", "a"),
         (3, "six seven eight nine", "b")],
        "doc_id long, text string, lang string")
    seg = spark.createDataFrame(
        [(1, 3, 3), (2, 2, 2), (3, 4, 8)],
        "doc_id long, n_tokens long, n_subwords long")
    got = {r["lang"]: r for r in tokenizer_fertility(docs, seg).collect()}
    assert got["a"]["fertility_e3"] == 1000
    assert got["b"]["fertility_e3"] == 2000
    assert got["a"]["total_chars"] == len("one two three") + len("four five")
    assert got["a"]["n_docs"] == 2 and got["b"]["n_docs"] == 1
    # chars per subword: lang a has 22 chars over 5 subwords
    assert got["a"]["chars_per_subword_e3"] == 22 * 1000 // 5


def test_snapshot_drift_planted(spark):
    """Old: 2 docs in src1, 1 in src2. New: src2 gone, src3 appears,
    src1 loses a doc — deltas report the move, absent sides are 0."""
    from rag_document_parser_spark.reporting import snapshot_drift

    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "src1"),
         (2, "one two three four five six", "src1"),
         (3, "zeta eta theta iota kappa", "src2")],
        "doc_id long, text string, source string")
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "src1"),
         (9, "mu nu xi omicron pi rho", "src3")],
        "doc_id long, text string, source string")
    rows = snapshot_drift(old, new).collect()
    by = {(r["source"], r["metric"]): r for r in rows}
    assert by[("src1", "n_docs")]["delta"] == -1
    assert by[("src2", "n_docs")]["old_value"] == 1
    assert by[("src2", "n_docs")]["new_value"] == 0
    assert by[("src3", "n_docs")]["old_value"] == 0
    assert by[("src3", "n_docs")]["new_value"] == 1
    # all four metrics present for every source seen on either side
    assert len(rows) == 3 * 4
    # quality bar: every planted doc has >=5 words and all-alpha text
    assert by[("src1", "quality_pass")]["old_value"] == 2
    assert by[("src1", "quality_pass_e6")]["new_value"] == 1_000_000


def test_term_blocklist_gate(spark):
    """C4 any-hit gate: exact-token matching (no Scunthorpe substring
    hits), repeated terms counted per occurrence, distinct counted
    once, empty docs pass with zeros."""
    from rag_document_parser_spark.operators.textstats import (
        term_blocklist)

    docs = [("a", "clean words only here"),
            ("b", "some badx stuff badx again bady"),   # 2+1 hits
            ("c", "embedded badxsuffix is not a hit"),  # substring: no
            ("d", "BADX uppercase still hits"),         # tokenizer lowers
            ("e", "")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           term_blocklist(df, ["badx", "bady"]).collect()}
    assert not got["a"]["blocked"]
    assert (got["b"]["n_hits"], got["b"]["n_distinct_hits"]) == (3, 2)
    assert got["b"]["hit_frac_e6"] == 3 * 1_000_000 // 6
    assert not got["c"]["blocked"]
    assert got["d"]["blocked"] and got["d"]["n_hits"] == 1
    assert (got["e"]["n_tokens"], got["e"]["n_hits"],
            got["e"]["blocked"]) == (0, 0, False)


def test_term_blocklist_zero_exchange(spark):
    """The gate is one projection chain — no Exchange in the plan."""
    from rag_document_parser_spark.operators.textstats import (
        term_blocklist)

    df = spark.createDataFrame([("a", "x y z")],
                               "doc_id string, text string")
    plan = (term_blocklist(df, ["badx"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


# ---- temporal metadata (cutoff-aware curation signal) -------------------

def test_temporal_metadata_extraction(spark):
    from rag_document_parser_spark.operators.textstats import (
        temporal_metadata)
    rows = [
        (1, "released 2023-05-17, updated 2024-01-01, see also 1999"),
        (2, "no dates at all here"),
        (3, "year 2150 and 1850 are out of window; 2000 is in"),
        (4, "2023-13-01 is not a date but 2023 is a year"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: (r["n_iso_dates"], r["n_years"],
                     r["min_year"], r["max_year"])
           for r in temporal_metadata(df).collect()}
    assert got[1] == (2, 3, 1999, 2024)
    assert got[2] == (0, 0, None, None)
    assert got[3] == (0, 1, 2000, 2000)     # 2150/1850 out of window
    # invalid month: no ISO date, but BOTH '2023' tokens count as
    # years (the \b boundary sits before the hyphen)
    assert got[4] == (0, 2, 2023, 2023)


def test_msttr_diverse_vs_repetitive(spark):
    from rag_document_parser_spark.operators.textstats import msttr
    diverse = " ".join(f"w{i}" for i in range(20))       # all distinct
    flat = " ".join("same word here over" for _ in range(5))
    short = "too short"
    df = spark.createDataFrame(
        [(1, diverse), (2, flat), (3, short)], ["doc_id", "text"])
    got = {r["id"]: (r["n_windows"], r["msttr_e6"])
           for r in msttr(df, w=10).collect()}
    assert got[1] == (2, 1_000_000)          # every window all-types
    # flat doc: 20 tokens over 4 distinct words -> 4/10 per window
    assert got[2] == (2, 400_000)
    assert got[3] == (0, None)
