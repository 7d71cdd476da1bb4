"""VERDICT r4 task #8: pin greedy_segment against HuggingFace
`tokenizers` WordPiece on hand words, when the lib is present.

BERT's greedy longest-match semantics has known edge cases (whole-word
UNK on a stranded cursor, longest-not-first matching). Our
``greedy_segment`` uses a positionless vocabulary (no ``##``
continuation marking), so the HF model is built with BOTH the
word-initial and ``##``-continuation form of every piece — under that
construction the two greedy walks must agree on piece COUNT and UNK
status for every word. Skips (not passes) when `tokenizers` is absent,
as in this container.
"""
from __future__ import annotations

import pytest

from rag_document_parser_spark.operators import wordpiece as W

PIECES = ["a", "b", "c", "d", "e", "un", "ab", "abc", "de", "cde",
          "able", "run", "ning", "ing", "er", "walk", "s", "t", "est"]

HAND_WORDS = [
    "abc", "abcde", "ababc", "runs", "running", "walker", "walked",
    "unable", "able", "ttt", "estest", "a", "e", "dede", "cdecde",
    "runner", "walking", "best", "abcabc", "q",
]


def _hf_counts(word: str):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.pre_tokenizers import WhitespaceSplit

    vocab = {"[UNK]": 0}
    for p in PIECES:
        vocab.setdefault(p, len(vocab))
        vocab.setdefault("##" + p, len(vocab))
    tok = Tokenizer(WordPiece(vocab=vocab, unk_token="[UNK]",
                              max_input_chars_per_word=100))
    tok.pre_tokenizer = WhitespaceSplit()
    out = tok.encode(word).tokens
    if out == ["[UNK]"]:
        return 1, True
    return len(out), False


def test_greedy_segment_matches_hf_wordpiece(spark):
    pytest.importorskip("tokenizers")
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(HAND_WORDS)], ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_pieces"], r["n_unk"] == 1)
           for r in W.greedy_segment(docs, PIECES,
                                     max_piece_len=16).collect()}
    for i, w in enumerate(HAND_WORDS):
        exp = _hf_counts(w)
        assert got[i] == exp, (
            f"word {w!r}: engine {got[i]} vs tokenizers {exp}")
