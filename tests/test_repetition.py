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
