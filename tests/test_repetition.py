"""Repetition quality signals + decontamination (operators/repetition.py)."""

import pyspark.sql.functions as F

from rag_document_parser_spark.operators import repetition as REP


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_line_repetition_exact_values(spark):
    df = _df(spark, [
        (1, "aa\nbb\naa\ncc"),          # 4 lines, 3 distinct
        (2, "xx\nyy"),                   # no dups
        (3, ""),                         # empty -> 0 lines, fracs 0
        (4, "zz\n\nzz"),                 # empty line dropped: 2 lines 1 distinct
    ])
    out = {r["doc_id"]: r.asDict()
           for r in REP.line_repetition_features(df).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["n_distinct_lines"] == 3
    assert abs(out[1]["dup_line_frac"] - 0.25) < 1e-12
    assert out[1]["n_line_chars"] == 8 and out[1]["n_distinct_line_chars"] == 6
    assert abs(out[1]["dup_line_char_frac"] - 0.25) < 1e-12
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_char_frac"] == 0.0
    assert out[4]["n_lines"] == 2 and out[4]["n_distinct_lines"] == 1
    assert abs(out[4]["dup_line_frac"] - 0.5) < 1e-12


def test_line_repetition_lines_col_passthrough(spark):
    df = spark.createDataFrame([(1, ["a", "a", "b"])],
                               "doc_id long, lines array<string>")
    r = REP.line_repetition_features(df, lines_col="lines").collect()[0]
    assert r["n_lines"] == 3 and r["n_distinct_lines"] == 2


def test_top_ngram_mode_counts(spark):
    df = _df(spark, [
        (1, "a b a b a b"),   # bigrams: [a b, b a, a b, b a, a b] -> top 3/5
        (2, "one two three"),  # 2 distinct bigrams, top 1/2
        (3, "solo"),           # < n tokens: dropped
    ])
    out = {r["id"]: r.asDict() for r in REP.top_ngram_stats(df, n=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 5 and out[1]["top_count"] == 3
    assert abs(out[1]["top_frac"] - 0.6) < 1e-12
    assert out[2]["n_grams"] == 2 and out[2]["top_count"] == 1


def test_top_ngram_partition_invariant(spark):
    df = _df(spark, [(i, f"w{i % 3} x w{i % 3} x w{i % 3}")
                     for i in range(40)])
    a = sorted(map(tuple, REP.top_ngram_stats(df, n=2).collect()))
    b = sorted(map(tuple,
                   REP.top_ngram_stats(df.repartition(7), n=2).collect()))
    assert a == b and len(a) == 40


def test_decontaminate_overlap_semantics(spark):
    corpus = _df(spark, [
        (1, "alpha beta gamma delta"),       # in eval: frac 1.0
        (2, "alpha beta gamma other words"),  # partial overlap
        (3, "zz yy xx ww vv"),                # disjoint: 0 matched
        (4, "ab cd"),                         # < 3 tokens: dropped
    ])
    ev = corpus.where(F.col("doc_id") == 1)
    out = {r["id"]: r.asDict()
           for r in REP.decontaminate(corpus, ev, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["contam_frac"] == 1.0 and out[1]["contaminated"]
    # doc 2 shares exactly "alpha beta gamma" of its 3 shingles
    assert out[2]["n_sh"] == 3 and out[2]["n_matched"] == 1
    assert not out[2]["contaminated"]
    assert out[3]["n_matched"] == 0 and out[3]["contam_frac"] == 0.0


def test_decontaminate_threshold_boundary(spark):
    corpus = _df(spark, [(1, "a b c d")])   # shingles: "a b c", "b c d"
    ev = _df(spark, [(9, "a b c")])
    r = REP.decontaminate(corpus, ev, n=3, threshold=0.5).collect()[0]
    assert r["n_sh"] == 2 and r["n_matched"] == 1
    assert r["contaminated"]   # 0.5 >= 0.5
    r2 = REP.decontaminate(corpus, ev, n=3, threshold=0.51).collect()[0]
    assert not r2["contaminated"]


# --- remove_repeated_windows (Lee et al. span removal) -----------------

def _sim_remove(texts, window):
    """Pure-Python twin: identical window hashing + coverage semantics."""
    import hashlib
    import re
    tok = re.compile(r"[a-z0-9؀-ۿ]+")
    toks = {i: tok.findall(t.lower()) for i, t in texts.items()}
    occurs = {}
    for i, ts in toks.items():
        for s in range(len(ts) - window + 1):
            h = hashlib.md5(" ".join(ts[s:s + window]).encode()).hexdigest()
            occurs.setdefault(h, set()).add(i)
    rep = {h for h, ds in occurs.items() if len(ds) >= 2}
    out = {}
    for i, ts in toks.items():
        cov = set()
        for s in range(len(ts) - window + 1):
            h = hashlib.md5(" ".join(ts[s:s + window]).encode()).hexdigest()
            if h in rep:
                cov.update(range(s, s + window))
        kept = [t for p, t in enumerate(ts) if p not in cov]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_remove_repeated_planted_passage(spark):
    boiler = " ".join(f"b{i}" for i in range(6))   # 6-token boilerplate
    texts = {
        1: f"u1 u2 {boiler} t1 t2 t3",
        2: f"v1 {boiler} w1 w2",
        3: "all unique tokens here nothing shared",
        4: boiler,                                  # doc IS the passage
        5: "tiny",                                  # shorter than window
        6: "",                                      # empty
    }
    df = _df(spark, list(texts.items()))
    rep = REP.repeated_windows(df, window=4)
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned"])
           for r in REP.remove_repeated_windows(df, rep, window=4)
           .collect()}
    assert got == _sim_remove(texts, 4)
    # the planted passage is excised, the unique flanks survive
    assert got[1][2] == "u1 u2 t1 t2 t3"
    assert got[2][2] == "v1 w1 w2"
    assert got[3] == (6, 0, texts[3])
    assert got[4] == (6, 6, "")       # fully-boilerplate doc -> empty
    assert got[5] == (1, 0, "tiny")
    assert got[6] == (0, 0, "")


def test_remove_repeated_interval_merge(spark):
    # two repeated windows overlapping mid-doc must merge into ONE
    # covered interval (no double-count, no lost gap tokens)
    shared = "s1 s2 s3 s4 s5"                      # 5 tokens, window=4
    texts = {1: f"x1 {shared} x2", 2: f"y1 y2 {shared}"}
    df = _df(spark, list(texts.items()))
    rep = REP.repeated_windows(df, window=4)
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned"])
           for r in REP.remove_repeated_windows(df, rep, window=4)
           .collect()}
    assert got == _sim_remove(texts, 4)
    assert got[1] == (7, 5, "x1 x2")


def test_remove_repeated_partition_invariant(spark):
    rows = [(i, f"p{i} q{i} common1 common2 common3 common4 r{i}")
            for i in range(30)]
    df = _df(spark, rows)
    rep = REP.repeated_windows(df, window=4)
    a = sorted(map(tuple,
                   REP.remove_repeated_windows(df, rep, window=4)
                   .collect()))
    b = sorted(map(tuple,
                   REP.remove_repeated_windows(
                       df.repartition(11), rep, window=4,
                       broadcast_repeats=False).collect()))
    assert a == b and len(a) == 30
    # every doc lost exactly the 4-token shared run
    assert all(r[2] == 4 for r in a)


def test_decontaminate_surgery_excises_eval_windows(spark):
    from rag_document_parser_spark.operators.repetition import (
        decontaminate_surgery)

    bench_passage = ("the capital of france is paris and the capital of "
                     "italy is rome exactly")
    corpus = spark.createDataFrame(
        [(1, "some original prose here " + bench_passage
             + " followed by more original analysis text"),
         (2, "entirely clean document with no benchmark overlap at all "
             "in any of its words"),
         (3, bench_passage)],
        "doc_id long, text string")
    eval_df = spark.createDataFrame([(100, bench_passage)],
                                    "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in decontaminate_surgery(corpus, eval_df,
                                          window=8).collect()}
    # doc 1: the quoted passage (14 tokens -> all covered by its 8-token
    # windows) is cut; surrounding prose survives
    assert "capital" not in out[1]["cleaned"]
    assert out[1]["cleaned"].startswith("some original prose here")
    assert out[1]["cleaned"].endswith("followed by more original analysis"
                                      " text")
    assert out[1]["n_removed"] == 14
    # doc 2 untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["n_tokens"] == len(out[2]["cleaned"].split())
    # doc 3 IS the benchmark passage: cleans to empty
    assert out[3]["cleaned"] == "" and out[3]["n_removed"] == 14


def test_decontaminate_surgery_partial_window_tail_survives(spark):
    from rag_document_parser_spark.operators.repetition import (
        decontaminate_surgery)

    # corpus doc shares only a PREFIX of the eval text shorter than one
    # window -> no window matches, nothing removed
    eval_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma completely different continuation of "
             "words that keeps going")],
        "doc_id long, text string")
    out = decontaminate_surgery(corpus, eval_df, window=8).collect()[0]
    assert out["n_removed"] == 0
