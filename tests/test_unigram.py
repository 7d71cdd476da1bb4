"""Unigram-LM tokenizer (operators/unigram.py) vs an independent
pure-Python simulation: the piecewise-linear fixed-point base-2 log,
seed-vocabulary selection (char closure + top-N substrings, lexical
tiebreak), exact Viterbi minimum-cost segmentation with the
longer-piece tiebreak, OOV single-char fallback, empty-doc zeros,
partition invariance, and the broadcast-only plan shape."""

import re
from collections import Counter

import pytest

from rag_document_parser_spark.operators import unigram as U


def _words(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _log2_e6(n):
    il = n.bit_length() - 1
    return il * 1_000_000 + (n * 1_000_000) // (1 << il) - 1_000_000


def _twin_vocab(docs, vocab_size, max_piece_len, min_count):
    wc = Counter(w for _, t in docs for w in _words(t))
    wc = {w: c for w, c in wc.items() if c >= min_count}
    pf = Counter()
    for w, c in wc.items():
        for pos in range(len(w)):
            for plen in range(1, min(max_piece_len, len(w) - pos) + 1):
                pf[w[pos:pos + plen]] += c
    chars = {p: f for p, f in pf.items() if len(p) == 1}
    multi = sorted(((p, f) for p, f in pf.items() if len(p) >= 2),
                   key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    sel = dict(chars)
    sel.update(multi)
    tot = sum(sel.values())
    return {p: _log2_e6(tot) - _log2_e6(f) for p, f in sel.items()}, tot


def _twin_viterbi(word, costs, ucost, max_piece_len):
    inf = 10 ** 15
    dp = [(0, 0)]  # (cost, backpointer)
    for j in range(1, len(word) + 1):
        best = None
        # longest piece first; strict < keeps the first minimum
        for i in range(max(1, j - max_piece_len + 1), j + 1):
            piece = word[i - 1:j]
            c = costs.get(piece, ucost if len(piece) == 1 else inf)
            cand = (dp[i - 1][0] + c, i - 1)
            if best is None or cand[0] < best[0]:
                best = cand
        dp.append(best)
    n, pos, pieces = 0, len(word), []
    while pos > 0:
        b = dp[pos][1]
        pieces.append(word[b:pos])
        pos = b
        n += 1
    return dp[len(word)][0], n, list(reversed(pieces))


DOCS = [
    ("d1", "the cat sat on the mat the cat"),
    ("d2", "concatenate the matting cats"),
    ("d3", "unseen QZX unseen the"),
    ("d4", ""),
    ("d5", "internationalization station nation"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_log2_e6_fixture_values(spark):
    got = spark.sql("SELECT " + ",".join(
        U.LOG2_E6.format(n=f"{n}L")
        for n in [1, 2, 3, 5, 7, 8, 1000, 12345])).collect()[0]
    want = [_log2_e6(n) for n in [1, 2, 3, 5, 7, 8, 1000, 12345]]
    assert list(got) == want


def test_vocab_matches_twin(spark, corpus):
    costs, _ = _twin_vocab(DOCS, vocab_size=8, max_piece_len=3,
                           min_count=1)
    got = {r.piece: (r.freq, r.cost_e6)
           for r in U.unigram_vocab(corpus, vocab_size=8,
                                    max_piece_len=3, min_count=1,
                                    ascii_only=True).collect()}
    assert set(got) == set(costs)
    for p, (_, ce) in got.items():
        assert ce == costs[p], p


def test_segment_words_matches_twin(spark, corpus):
    costs, tot = _twin_vocab(DOCS, vocab_size=8, max_piece_len=3,
                             min_count=1)
    ucost = 2 * _log2_e6(tot)
    vocab = U.unigram_vocab(corpus, vocab_size=8, max_piece_len=3,
                            min_count=1, ascii_only=True)
    words = ["concatenate", "the", "cats", "zzz", "qzx", "a",
             "internationalization"]
    wt = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {r.word: r for r in
           U.segment_words(wt, vocab, max_piece_len=3).collect()}
    for w in words:
        cost, n, pieces = _twin_viterbi(w, costs, ucost, 3)
        assert got[w].cost_e6 == cost, w
        assert got[w].n_pieces == n, w
        assert list(got[w].pieces) == pieces, w
        assert "".join(got[w].pieces) == w  # closure: lossless split


def test_viterbi_segment_doc_totals(spark, corpus):
    costs, tot = _twin_vocab(DOCS, vocab_size=8, max_piece_len=3,
                             min_count=1)
    ucost = 2 * _log2_e6(tot)
    vocab = U.unigram_vocab(corpus, vocab_size=8, max_piece_len=3,
                            min_count=1, ascii_only=True)
    got = {r.doc_id: r for r in
           U.viterbi_segment(corpus, vocab, max_piece_len=3,
                             ascii_only=True).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        ws = _words(text)
        want = [_twin_viterbi(w, costs, ucost, 3) for w in ws]
        assert got[doc_id].n_tokens == len(ws), doc_id
        assert got[doc_id].n_pieces == sum(n for _, n, _ in want), doc_id
        assert got[doc_id].cost_e6 == sum(c for c, _, _ in want), doc_id
    assert (got["d4"].n_tokens, got["d4"].n_pieces,
            got["d4"].cost_e6) == (0, 0, 0)


def test_partition_invariance(spark, corpus):
    v1 = U.unigram_vocab(corpus.repartition(1), vocab_size=8,
                         max_piece_len=3, min_count=1, ascii_only=True)
    v7 = U.unigram_vocab(corpus.repartition(7), vocab_size=8,
                         max_piece_len=3, min_count=1, ascii_only=True)
    assert sorted(map(tuple, v1.collect())) == \
        sorted(map(tuple, v7.collect()))


def test_plan_broadcasts_vocab_never_shuffles_on_word(spark, corpus):
    """The corpus side must never shuffle on the word key: the
    segmentation joins reach the token table as broadcasts (TYPE
    tables are vocabulary-sized), so the only Exchange keys are the
    doc-id aggregate and the TYPE-table builds."""
    vocab = U.unigram_vocab(corpus, vocab_size=8, max_piece_len=3,
                            min_count=1, ascii_only=True)
    plan = U.viterbi_segment(corpus, vocab, max_piece_len=3,
                             ascii_only=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
