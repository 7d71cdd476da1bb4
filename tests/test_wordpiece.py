"""WordPiece trainer + greedy segmenter (operators/wordpiece.py) vs an
independent pure-Python simulation: the likelihood argmax (fixed-point
cnt*1e9 div (lc*rc), lexical tiebreak), the one-replace-per-round merge
subset, exact driver-sized vocabulary (alphabet + one symbol per
merge), greedy longest-match semantics incl. whole-word UNK, and
partition invariance."""

import re
from collections import Counter

import pytest

from rag_document_parser_spark.operators import wordpiece as W


def _words(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _twin_train(docs, n_merges, min_count=2):
    wc = Counter(w for _, t in docs for w in _words(t))
    wc = {w: c for w, c in wc.items() if c >= min_count}
    syms = {w: " " + " ".join(w) + " " for w in wc}
    out = []
    for rank in range(1, n_merges + 1):
        pc, sc = Counter(), Counter()
        for w, c in wc.items():
            y = syms[w].strip().split(" ")
            for s in y:
                sc[s] += c
            for i in range(len(y) - 1):
                pc[(y[i], y[i + 1])] += c
        if not pc:
            break
        scored = {p: (c * 10 ** 9) // (sc[p[0]] * sc[p[1]])
                  for p, c in pc.items()}
        (l, r), s = min(scored.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        out.append((rank, l, r, pc[(l, r)], s))
        for w in syms:
            syms[w] = syms[w].replace(f" {l} {r} ", f" {l}{r} ")
    return out


def _twin_segment(docs, vocab, max_len=8):
    vs = set(vocab)

    def seg(w):
        cur, n = 0, 0
        while cur < len(w):
            for ln in range(min(max_len, len(w) - cur), 0, -1):
                if w[cur:cur + ln] in vs:
                    cur += ln
                    n += 1
                    break
            else:
                return 1, True
        return n, False

    rows = {}
    for d, t in docs:
        ws = _words(t)
        pieces = unk = 0
        for w in ws:
            p, u = seg(w)
            pieces += p
            unk += u
        rows[d] = (len(ws), pieces, unk)
    return rows


DOCS = [("d1", "the cat sat on the mat matter"),
        ("d2", "the bat hat mat the"),
        ("d3", "cat cat mat bat"),
        ("d4", "zzz qqq"),
        ("d5", ""),
        ("d6", "matter batter the hat")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_train_matches_python_twin(corpus):
    got = [tuple(m) for m in W.train_wordpiece(corpus, n_merges=6)]
    assert got == _twin_train(DOCS, 6)


def test_likelihood_beats_raw_frequency(spark):
    """'x y' occurs most often but x/y are ubiquitous; 'q z' is rarer
    as a pair yet exclusive — WordPiece must pick (q, z) where BPE
    would pick the frequency argmax."""
    docs = [("a", "xy " * 6 + "xa ya " * 8 + "qz qz qz")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    m = W.train_wordpiece(df, n_merges=1, min_count=1)
    assert (m[0][1], m[0][2]) == ("q", "z")
    twin = _twin_train(docs, 1, min_count=1)
    assert [tuple(x) for x in m] == twin


def test_vocab_is_alphabet_plus_one_per_merge(corpus):
    m = W.train_wordpiece(corpus, n_merges=4)
    vocab = W.wordpiece_vocab(corpus, m)
    wc = Counter(w for _, t in DOCS for w in _words(t))
    alphabet = {ch for w, c in wc.items() if c >= 2 for ch in w}
    assert set(vocab) == alphabet | {l + r for _, l, r, _, _ in m}


def test_segment_matches_python_twin(corpus):
    m = W.train_wordpiece(corpus, n_merges=4)
    vocab = W.wordpiece_vocab(corpus, m)
    got = {r["doc_id"]: (r["n_tokens"], r["n_pieces"], r["n_unk"])
           for r in W.greedy_segment(corpus, vocab).collect()}
    assert got == _twin_segment(DOCS, vocab)


def test_greedy_prefers_longest_match(spark):
    """With both 'mat' and 'ma'/'t' in vocab, 'mat' segments as ONE
    piece; 'matt' must take 'mat' then 't' (greedy, not optimal)."""
    df = spark.createDataFrame([("a", "mat matt")],
                               "doc_id string, text string")
    vocab = ["m", "a", "t", "ma", "mat"]
    row = W.greedy_segment(df, vocab).collect()[0]
    assert (row["n_tokens"], row["n_pieces"], row["n_unk"]) == (2, 3, 0)


def test_unknown_char_is_whole_word_unk(spark):
    """A word with any unmatched position costs exactly 1 UNK piece,
    regardless of how much of it the vocab covers."""
    df = spark.createDataFrame([("a", "mate m")],
                               "doc_id string, text string")
    vocab = ["m", "a", "t"]  # no 'e'
    row = W.greedy_segment(df, vocab).collect()[0]
    assert (row["n_tokens"], row["n_pieces"], row["n_unk"]) == (2, 2, 1)


def test_empty_doc_zero_rows(corpus):
    got = {r["doc_id"]: (r["n_tokens"], r["n_pieces"], r["n_unk"])
           for r in W.greedy_segment(
               corpus, ["t", "h", "e"]).collect()}
    assert got["d5"] == (0, 0, 0)


def test_partition_invariance(corpus):
    m1 = W.train_wordpiece(corpus.repartition(1), n_merges=4)
    m7 = W.train_wordpiece(corpus.repartition(7), n_merges=4)
    assert m1 == m7
    vocab = W.wordpiece_vocab(corpus, m1)
    s1 = sorted(map(tuple, W.greedy_segment(
        corpus.repartition(1), vocab).collect()))
    s7 = sorted(map(tuple, W.greedy_segment(
        corpus.repartition(7), vocab).collect()))
    assert s1 == s7


def test_segment_corpus_side_joins_broadcast(corpus):
    """The corpus token stream (the Generate/explode branch) joins the
    per-word-TYPE cost table BROADCAST — the corpus never shuffles on
    the word key. The word-TYPE branch may SortMergeJoin on the
    uniform word key (vocabulary tables outgrow broadcast at scale);
    only the corpus-sized side must stay exchange-free."""
    plan = (W.greedy_segment(corpus, ["t", "h", "e", "a"])
            ._jdf.queryExecution().executedPlan().toString())
    m = re.search(r"BroadcastHashJoin \[word#\d+\].*?Generate explode",
                  plan, re.DOTALL)
    assert m, plan
