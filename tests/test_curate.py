"""End-to-end curation plan (`plans.curate`): the full RefinedWeb-style
chain (extract -> quality -> PII -> boilerplate -> exact dedup -> near
dedup) over a hand-built corpus where every drop reason occurs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.config import ExtractConfig
from rag_document_parser_spark.plans.curate import curate, curation_report
from rag_document_parser_spark.schema import INPUT_SCHEMA

BANNER = ("subscribe to our newsletter for weekly updates and exclusive "
          "member offers today")
BODY = ("the migratory patterns of arctic terns span both hemispheres "
        "covering roughly seventy thousand kilometres every single year "
        "which makes them the longest ranging birds known to science")
NEAR_A = ("open source database systems have steadily improved their "
          "query optimisers over the last two decades adding cost based "
          "planning adaptive execution and vectorised runtimes to close "
          "the gap with commercial engines in analytical workloads")
# one trailing word changed vs NEAR_A -> shingle Jaccard ~0.97, well
# inside the k=32/bands=8 LSH collision regime
NEAR_B = NEAR_A.replace("analytical workloads", "analytical settings")


def _text_doc(doc_id: str, *paras: str, kind: str = "text") -> dict:
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": kind, "text": p, "media_ref": None, "offset": i}
            for i, p in enumerate(paras)
        ],
    }


@pytest.fixture(scope="module")
def corpus(spark):
    docs = [
        # exact duplicates (identical content hash); their duplicate
        # body must NOT count as cross-doc boilerplate (df is over
        # distinct content hashes), but the shared banner — also on
        # d03/d08 — must be stripped
        _text_doc("d01", BODY, BANNER),
        _text_doc("d02", BODY, BANNER),
        # near-duplicates (one word differs)
        _text_doc("d03", NEAR_A, BANNER),
        _text_doc("d04", NEAR_B),
        # unique keeper with PII
        _text_doc("d05",
                  "contact our research desk at data@example.org or call "
                  "+1 (415) 555-0175 for the full longitudinal dataset "
                  "documentation and historical archives"),
        # quality drop: too few words
        _text_doc("d06", "hi"),
        # extract drop: unknown kind under unknown_kinds="error"
        _text_doc("d07", "whatever text this held", kind="martian"),
        # empty after boilerplate strip: banner-only document
        _text_doc("d08", BANNER),
    ]
    return spark.createDataFrame(docs, schema=INPUT_SCHEMA)


@pytest.fixture(scope="module")
def curated(corpus):
    cfg = ExtractConfig(unknown_kinds="error")
    out = curate(corpus, cfg).collect()
    return {r["doc_id"]: r for r in out}


def test_one_row_per_input_doc(curated):
    assert set(curated) == {f"d{i:02d}" for i in range(1, 9)}


def test_drop_reasons(curated):
    reasons = {d: r["reason"] for d, r in curated.items()}
    assert reasons["d01"] is None           # keeper of the exact pair
    assert reasons["d02"] == "exact_dup"
    assert reasons["d03"] is None           # keeper (min id) of near pair
    assert reasons["d04"] == "near_dup"
    assert reasons["d05"] is None
    assert reasons["d06"] == "quality"
    assert reasons["d07"] == "extract"
    assert reasons["d08"] == "empty"


def test_kept_flag_and_content(curated):
    for d, row in curated.items():
        assert row["kept"] == (row["reason"] is None)
        if row["kept"]:
            assert row["content"]
        else:
            assert row["content"] is None
    # boilerplate stripped from survivors, body intact
    assert BANNER not in curated["d01"]["content"]
    assert BODY in curated["d01"]["content"]


def test_pii_scrubbed_before_hashing(curated):
    row = curated["d05"]
    assert row["n_pii"] == 2
    assert "<EMAIL>" in row["content"]
    assert "<PHONE>" in row["content"]
    assert "data@example.org" not in row["content"]


def test_near_dup_toggle(corpus):
    cfg = ExtractConfig(unknown_kinds="error")
    out = curate(corpus, cfg, near_dup=False).collect()
    reasons = {r["doc_id"]: r["reason"] for r in out}
    assert reasons["d04"] is None          # near-dup pass disabled
    assert reasons["d02"] == "exact_dup"   # exact pass still on


def test_curation_report(spark, corpus):
    cfg = ExtractConfig(unknown_kinds="error")
    rep = {r["outcome"]: (r["n_docs"], r["n_pii"])
           for r in curation_report(curate(corpus, cfg)).collect()}
    assert rep["kept"] == (3, 2)
    assert rep["exact_dup"][0] == 1
    assert rep["near_dup"][0] == 1
    assert rep["quality"][0] == 1
    assert rep["extract"][0] == 1
    assert rep["empty"][0] == 1


def test_idempotent_on_survivors(spark, corpus):
    """Curating the survivors again drops nothing new."""
    cfg = ExtractConfig(unknown_kinds="error")
    first = curate(corpus, cfg)
    survivors = first.where("kept").select("doc_id", "content")
    again = curate(
        survivors.select(
            "doc_id",
            F.transform(
                F.split("content", "\n\n"),
                lambda p, i: F.struct(
                    F.lit("text").alias("kind"), p.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    i.cast("int").alias("offset"))
            ).alias("spans")),
        cfg)
    assert again.where("NOT kept").count() == 0


def test_curate_remove_repeated_stage(spark):
    """Opt-in substring removal (Lee et al. 2022 §4) inside the chain:
    a passage shared verbatim by two otherwise-distinct docs is excised
    from BOTH, both docs survive, and the unique flanks are intact (in
    token-space rendering). With the stage off, the passage stays."""
    shared = ("identical licensing disclaimer reproduced verbatim across "
              "every partner site in the syndication network")
    docs = [
        _text_doc("r1", f"alpha beta gamma delta epsilon {shared} "
                        "zeta eta theta"),
        _text_doc("r2", f"one two three four five {shared} six seven"),
        _text_doc("r3", BODY),
    ]
    cfg = ExtractConfig(unknown_kinds="error")
    corpus = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    on = {r["doc_id"]: r for r in
          curate(corpus, cfg, remove_repeated=True, repeated_window=6,
                 boilerplate_min_docs=3).collect()}
    assert all(on[d]["kept"] for d in ("r1", "r2", "r3"))
    assert "disclaimer" not in on["r1"]["content"]
    assert "disclaimer" not in on["r2"]["content"]
    assert "alpha" in on["r1"]["content"] and "theta" in on["r1"]["content"]
    assert "one" in on["r2"]["content"] and "seven" in on["r2"]["content"]
    assert "terns" in on["r3"]["content"]       # untouched unique doc
    off = {r["doc_id"]: r for r in
           curate(corpus, cfg, boilerplate_min_docs=3).collect()}
    assert "disclaimer" in off["r1"]["content"]


GOOD_LINE = "the cat sat with the dog and that was fine."


def test_curate_quality_rule_stages(spark):
    """Opt-in C4 + Gopher stages (RefinedWeb order): C4 rewrites text
    line-wise BEFORE anything hashes (two docs identical after the C4
    clean become an exact-dup pair), the Gopher battery gates the
    post-C4 text, and drop reasons name the first failing stage."""
    docs = [
        # 6 ten-word sentence spans -> passes C4 (6 sentences) and
        # Gopher (60 words, stopwords, mean wlen ~3.3)
        _text_doc("g1", *[GOOD_LINE] * 6),
        # same doc + a junk line C4 drops -> cleaned text == g1's
        _text_doc("g2", *([GOOD_LINE] * 6 + ["click here now"])),
        # lines pass C4's line rules but only 2 sentences remain -> c4
        _text_doc("g3", *[GOOD_LINE] * 2),
        # passes C4 (4 sentences) but 40 words < Gopher's 50 -> gopher
        _text_doc("g4", *[GOOD_LINE] * 4),
        # fails the cheap base gate first -> quality, not c4/gopher
        _text_doc("g5", "hi"),
    ]
    cfg = ExtractConfig(unknown_kinds="error")
    corpus = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    out = {r["doc_id"]: r
           for r in curate(corpus, cfg, c4_lines=True, gopher=True,
                           near_dup=False).collect()}
    assert out["g1"]["kept"] and out["g1"]["reason"] is None
    assert out["g2"]["reason"] == "exact_dup"   # hashed AFTER the C4 cut
    assert out["g3"]["reason"] == "c4"
    assert out["g4"]["reason"] == "gopher"
    assert out["g5"]["reason"] == "quality"
    assert "click here" not in (out["g1"]["content"] or "")
    # stages off by default: same corpus, no c4/gopher verdicts
    # (boilerplate off too — GOOD_LINE repeats across docs, and without
    # the C4 rejoin each repeat is its own strippable paragraph)
    off = {r["doc_id"]: r["reason"]
           for r in curate(corpus, cfg, near_dup=False,
                           boilerplate_min_docs=99).collect()}
    assert "c4" not in off.values() and "gopher" not in off.values()
    assert off["g3"] is None and off["g4"] is None


def test_curate_empty_corpus(spark):
    empty = spark.createDataFrame([], schema=INPUT_SCHEMA)
    out = curate(empty).collect()
    assert out == []


def test_curate_everything_drops(spark):
    """A corpus where no doc survives any gate still yields one verdict
    row per doc (no join/union leg loses the dropped docs)."""
    docs = [_text_doc("t1", "hi"), _text_doc("t2", "no"),
            _text_doc("t3", "x", kind="martian")]
    cfg = ExtractConfig(unknown_kinds="error")
    out = {r["doc_id"]: r["reason"]
           for r in curate(spark.createDataFrame(docs, INPUT_SCHEMA),
                           cfg).collect()}
    assert out == {"t1": "quality", "t2": "quality", "t3": "extract"}


def test_curate_fix_encoding_stage(spark):
    """Opt-in mojibake repair runs before hashing: a doc whose content
    differs from another's only by cp1252 damage becomes an exact dup
    once fix_encoding=True (and stays distinct when off)."""
    clean = "the café results résumé " * 8
    damaged = clean.encode("utf-8").decode("cp1252")
    docs = [_text_doc("m1", clean), _text_doc("m2", damaged)]
    cfg = ExtractConfig(unknown_kinds="error")
    corpus = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    on = {r["doc_id"]: r for r in curate(
        corpus, cfg, fix_encoding=True, near_dup=False).collect()}
    assert on["m1"]["kept"] and on["m2"]["reason"] == "exact_dup"
    assert "é" in on["m1"]["content"]
    off = {r["doc_id"]: r for r in curate(
        corpus, cfg, near_dup=False).collect()}
    assert off["m1"]["kept"] and off["m2"]["kept"]


def test_curate_all_stages_enabled(spark):
    """Integration: every optional stage on at once (mojibake repair,
    C4 line clean, Gopher battery, corpus-level repeated-window
    removal, exact + near dedup). Pins the COMPOSED semantics:

    - the exact pair keeps one full-content survivor (identical docs
      collapse to one distinct content hash, so the window surgery —
      which counts occurrences over distinct content — never fires on
      them) and drops the other as exact_dup;
    - the near pair's 50-token shared prefix IS a repeated window, so
      the Lee-et-al surgery excises the redundancy from BOTH docs and
      near-dedup then correctly finds nothing left to drop — removal
      subsumes doc-dropping when window <= overlap (the documented
      stage interaction, tune repeated_window upward to prefer drops);
    - PII is scrubbed before anything hashes; base gates still name
      their reasons first.
    """
    nouns = ["river", "garden", "market", "harbour", "forest", "valley"]
    verbs = ["crossed", "watched", "reached", "followed", "measured",
             "charted"]

    def lines(tag, n=6):
        return [f"the {tag} {verbs[i]} the {nouns[i]} and that was "
                f"quite fine." for i in range(n)]

    near_a = lines("heron")
    near_b = near_a[:-1] + [near_a[-1].replace("quite fine", "very good")]
    docs = [
        _text_doc("d01", *lines("cat")),
        _text_doc("d02", *lines("cat")),     # exact duplicate of d01
        _text_doc("d03", *near_a),
        _text_doc("d04", *near_b),           # near-duplicate of d03
        _text_doc("d05", *(lines("owl", 5)
                           + ["write to the archive desk and reach "
                              "data@example.org for the records today."])),
        _text_doc("d06", "hi"),              # quality: too few words
        _text_doc("d07", "whatever.", kind="martian"),   # extract error
    ]
    corpus = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    cfg = ExtractConfig(unknown_kinds="error")
    rows = curate(corpus, cfg, fix_encoding=True, c4_lines=True,
                  gopher=True, remove_repeated=True,
                  near_dup=True).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == len(docs) == len(by_id)
    assert by_id["d07"]["reason"] == "extract"
    assert by_id["d06"]["reason"] == "quality"
    # exact pair: one full survivor, one exact_dup
    assert {by_id["d01"]["reason"], by_id["d02"]["reason"]} \
        == {None, "exact_dup"}
    survivor = by_id["d01"] if by_id["d01"]["kept"] else by_id["d02"]
    assert "crossed the river" in survivor["content"]
    # near pair: surgery removed the shared prefix from BOTH; the tiny
    # distinct tails remain and are no longer near-dups
    assert by_id["d03"]["kept"] and by_id["d04"]["kept"]
    assert by_id["d03"]["content"] == "quite fine"
    assert by_id["d04"]["content"] == "very good"
    # PII scrubbed before hashing; doc survives the full chain
    assert by_id["d05"]["kept"]
    assert "data@example.org" not in by_id["d05"]["content"]


# ---------------------------------------------------------------------------
# opt-in usage-rights gate (drop_restricted=True)
# ---------------------------------------------------------------------------


def test_drop_restricted_gates_rights_marked_docs(spark):
    docs = [
        _text_doc("lic1", BODY, "Copyright 2020 Acme. All rights reserved."),
        _text_doc("lic2", NEAR_A,
                  "Shared under a Creative Commons Attribution license."),
        _text_doc("lic3", BODY.replace("arctic terns", "barn swallows")),
    ]
    corpus = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    out = {r["doc_id"]: r
           for r in curate(corpus, drop_restricted=True,
                           near_dup=False).collect()}
    assert out["lic1"]["kept"] is False
    assert out["lic1"]["reason"] == "license"
    assert out["lic1"]["content"] is None
    # permissive license is NOT restricted; clean doc untouched
    assert out["lic2"]["kept"] is True and out["lic2"]["reason"] is None
    assert out["lic3"]["kept"] is True
    # default off: the same corpus keeps everything
    dflt = {r["doc_id"]: r["kept"]
            for r in curate(corpus, near_dup=False).collect()}
    assert all(dflt.values())


def test_curate_skeleton_harden_stage(spark):
    """skeleton_harden=True folds a homoglyph-disguised copy into the
    exact-dup stage; default curate misses it (byte-distinct) and the
    near-dup leg is OFF here to isolate the stage."""
    disguised = BODY.replace("a", "а").replace("e", "е")  # Cyrillic
    docs = [
        _text_doc("d01", BODY),
        _text_doc("d02", "​" + disguised),
        _text_doc("d03", NEAR_A),
    ]
    df = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    soft = {r["doc_id"]: r for r in
            curate(df, near_dup=False).collect()}
    hard = {r["doc_id"]: r for r in
            curate(df, near_dup=False, skeleton_harden=True).collect()}
    assert soft["d02"]["kept"]                      # evasion worked
    assert hard["d02"]["reason"] == "exact_dup"     # hardened catch
    assert hard["d01"]["kept"] and hard["d03"]["kept"]
    # survivor content is the ORIGINAL text, not the skeleton
    assert hard["d02"]["content"] is None
    assert BODY in hard["d01"]["content"]
