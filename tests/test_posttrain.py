"""Post-training tier: SFT chat offsets + preference-pair mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_document_parser_spark.operators import posttrain as PT


def _turns(spark):
    rows = []
    for c in range(8):
        n = 2 + (c % 3)
        for i in range(n):
            role = ("system", "user", "assistant", "user")[i % 4]
            rows.append((c, i, role, "w " * (1 + (c + i) % 4)))
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, text string")


def test_chat_offsets_contiguous_and_masked(spark):
    turns = _turns(spark)
    out = sorted(PT.chat_offsets(turns).collect(),
                 key=lambda r: (r["conv_id"], r["turn_idx"]))
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], []).append(r)
    src = {(r["conv_id"], r["turn_idx"]): r for r in turns.collect()}
    for conv, rows in by_conv.items():
        assert rows[0]["start_char"] == 0
        for prev, cur in zip(rows, rows[1:]):
            # intervals tile the record: no gaps, no overlaps
            assert cur["start_char"] == prev["end_char"]
        for r in rows:
            t = src[(conv, r["turn_idx"])]
            expected = len(t["role"]) + 4 + len(t["text"])
            assert r["end_char"] - r["start_char"] == expected
            assert r["trainable"] == (t["role"] == "assistant")
    # partition invariance
    a = sorted(map(tuple, PT.chat_offsets(turns).collect()))
    b = sorted(map(tuple, PT.chat_offsets(
        turns.repartition(13)).collect()))
    assert a == b and a


def test_preference_pairs_semantics_and_no_window(spark):
    rows = [
        # group a: clear best (id 3, score 9) and worst; ties on worst
        # score 1 break to the smallest id (10 over 11)
        ("a", 3, 9), ("a", 10, 1), ("a", 11, 1), ("a", 5, 4),
        # group b: chosen tie at score 7 -> smallest id 2
        ("b", 2, 7), ("b", 4, 7), ("b", 9, 3),
        # group c: all tied -> emits nothing
        ("c", 1, 5), ("c", 2, 5),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, sc long")
    got = {r["source"]: r for r in
           PT.preference_pairs(df, score_col="sc").collect()}
    assert set(got) == {"a", "b"}
    assert (got["a"]["chosen_id"], got["a"]["rejected_id"],
            got["a"]["margin"]) == (3, 10, 8)
    assert (got["b"]["chosen_id"], got["b"]["rejected_id"],
            got["b"]["margin"]) == (2, 9, 4)
    # skew contract: the plan has no per-group Window (aggregate argmax)
    plan = (PT.preference_pairs(df, score_col="sc")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan, plan
    a = sorted(map(tuple, PT.preference_pairs(df, score_col="sc").collect()))
    b = sorted(map(tuple, PT.preference_pairs(
        df.repartition(7), score_col="sc").collect()))
    assert a == b


def test_paragraph_language_and_mixedness(spark):
    from rag_document_parser_spark.operators.textstats import (
        language_mixedness, paragraph_language)

    df = spark.createDataFrame([
        (1, "the cat is in the hat\n\nder hund ist nicht da\n\n \t "),
        (2, "le chat est dans la maison"),
        (3, "\n\n\n\n"),  # only empty paragraphs -> no rows
    ], "doc_id long, text string")
    out = paragraph_language(df)
    rows = {(r["doc_id"], r["para_idx"]): r["lang_id"]
            for r in out.collect()}
    # whitespace-only trailing paragraph of doc 1 dropped
    assert rows == {(1, 0): "en", (1, 1): "de", (2, 0): "fr"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    mix = {r["doc_id"]: r for r in language_mixedness(out).collect()}
    assert mix[1]["n_paras"] == 2
    # 1-1 tie between de and en breaks to the lexically smallest lang
    assert mix[1]["dominant_lang"] == "de"
    assert mix[1]["dominant_frac_e6"] == 500_000
    assert mix[2]["dominant_lang"] == "fr"
    assert mix[2]["dominant_frac_e6"] == 1_000_000
    assert 3 not in mix


# ---- Cohen's kappa (inter-annotator agreement) --------------------------

from rag_document_parser_spark.operators.posttrain import cohen_kappa


def _py_kappa(pairs):
    from collections import Counter
    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) * 10**6 // n
    ca, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    pe = sum(ca[k] * cb.get(k, 0) for k in ca) * 10**6 // (n * n)
    if pe >= 10**6:
        return (n, po, pe, None)
    return (n, po, pe, (po - pe) * 10**6 // (10**6 - pe))


def test_kappa_hand_and_random(spark):
    import random
    rng = random.Random(5)
    cases = {
        "perfect": [("x", "x")] * 10 + [("y", "y")] * 10,
        "chance": [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")],
        "degenerate": [("x", "x")] * 5,       # pe = 1 -> NULL
        "random": [(rng.choice("abc"), rng.choice("abc"))
                   for _ in range(60)],
    }
    for name, pairs in cases.items():
        df = spark.createDataFrame(pairs, "label_a string, label_b string")
        r = cohen_kappa(df).collect()[0]
        assert (r["n_items"], r["po_e6"], r["pe_e6"], r["kappa_e6"]) == \
            _py_kappa(pairs), name
    assert _py_kappa(cases["perfect"])[3] == 1_000_000
    assert _py_kappa(cases["chance"])[3] == 0


# ---- Bradley-Terry preference strengths (Hunter 2004 MM) ----------------

from rag_document_parser_spark.operators.posttrain import bradley_terry


def _py_bt(outcomes, n_iter):
    """Pure-Python twin of the fixed-point MM rounds."""
    from collections import Counter, defaultdict
    und, wins, comps = Counter(), Counter(), Counter()
    for w, l in outcomes:
        und[(min(w, l), max(w, l))] += 1
        wins[w] += 1
        comps[w] += 1
        comps[l] += 1
    items = sorted(comps)
    n = len(items)
    p = {it: 10**6 for it in items}
    for _ in range(n_iter):
        d = defaultdict(int)
        for (i, j), nij in und.items():
            term = nij * 10**12 // (p[i] + p[j])
            d[i] += term
            d[j] += term
        raw = {}
        for it in items:
            di = d.get(it, 0)
            raw[it] = (10**6 if di <= 0
                       else max(wins.get(it, 0) * 10**12 // di, 1))
        tot = sum(raw.values())
        p = {it: raw[it] * (n * 10**6) // tot for it in items}
    return {it: (wins.get(it, 0), comps[it], p[it]) for it in items}


def test_bt_recovers_ordering_and_matches_twin(spark):
    rows = ([("b", "a")] * 6 + [("a", "b")] * 2
            + [("c", "b")] * 6 + [("b", "c")] * 2
            + [("c", "a")] * 7 + [("a", "c")] * 1)
    df = spark.createDataFrame(rows, "winner string, loser string")
    got = {r["item"]: (r["wins"], r["n_comparisons"], r["strength_e6"])
           for r in bradley_terry(df, n_iter=3).collect()}
    assert got == _py_bt(rows, 3)
    s = {k: v[2] for k, v in got.items()}
    assert s["a"] < s["b"] < s["c"]


def test_bt_never_winner_floors_positive(spark):
    rows = [("x", "z")] * 4 + [("y", "z")] * 4   # z never wins
    df = spark.createDataFrame(rows, "winner string, loser string")
    got = {r["item"]: r["strength_e6"]
           for r in bradley_terry(df, n_iter=4).collect()}
    assert got == {k: v[2] for k, v in _py_bt(rows, 4).items()}
    assert got["z"] >= 1 and got["z"] < got["x"]


def test_bt_partition_invariance(spark):
    import random
    rng = random.Random(9)
    rows = [(f"i{rng.randint(0, 9)}", f"i{rng.randint(0, 9)}")
            for _ in range(200)]
    rows = [(w, l) for w, l in rows if w != l]
    df = spark.createDataFrame(rows, "winner string, loser string")
    a = sorted(map(tuple, bradley_terry(df, n_iter=2).collect()))
    b = sorted(map(tuple, bradley_terry(
        df.repartition(7), n_iter=2).collect()))
    assert a == b


# ---- verbosity-bias probe -----------------------------------------------

from rag_document_parser_spark.operators.posttrain import verbosity_bias


def test_verbosity_bias_counts_and_sign_split(spark):
    pairs = [("aaaa", "aa"),      # longer chosen (+2)
             ("bb", "bbbb"),      # shorter chosen (-2)
             ("cc", "cc"),        # equal
             ("dddd", "d"),       # longer chosen (+3)
             ("e", "eeeeee")]     # shorter chosen (-5)
    df = spark.createDataFrame(pairs, "chosen string, rejected string")
    r = verbosity_bias(df).collect()[0]
    assert (r["n_pairs"], r["n_longer_chosen"],
            r["n_shorter_chosen"], r["n_equal"]) == (5, 2, 2, 1)
    assert r["longer_win_e6"] == 2 * 1_000_000 // 4
    # gap sum = 2-2+0+3-5 = -2 -> sign-split: -((2*1000)//5) = -400
    assert r["mean_gap_chars_e3"] == -400


def test_verbosity_bias_degenerate_all_equal(spark):
    df = spark.createDataFrame([("x", "x")] * 3,
                               "chosen string, rejected string")
    r = verbosity_bias(df).collect()[0]
    assert r["longer_win_e6"] is None      # no unequal pair to score
    assert r["mean_gap_chars_e3"] == 0
