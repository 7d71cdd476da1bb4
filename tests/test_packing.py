"""Sequence packing (`operators.packing`): deterministic token-budget
shard assignment without a global sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.packing import (
    pack_shards,
    shard_manifest,
)

BUDGET = 50
N_BUCKETS = 4


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(f"d{i:03d}", " ".join(f"w{i}x{j}" for j in range(3 + (i * 7) % 25)))
            for i in range(120)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def packed(corpus):
    return pack_shards(corpus, BUDGET, n_buckets=N_BUCKETS).collect()


def test_every_doc_assigned_once(packed, corpus):
    ids = [r["doc_id"] for r in packed]
    assert len(ids) == len(set(ids)) == corpus.count()
    assert all(r["shard"] == f"{r['bucket']}:{r['tok_offset'] // BUDGET}"
               for r in packed)


def test_first_fit_contiguous(packed):
    """Within a bucket, shard index follows the running token offset:
    docs of one shard are contiguous in key order, and every shard
    except a bucket's last spans at least the budget."""
    by_bucket: dict = {}
    for r in packed:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r["tok_offset"])
        # offsets are a proper running sum
        cum = 0
        for r in rows:
            assert r["tok_offset"] == cum
            cum += r["n_tokens"]
        # shard index non-decreasing, step <= spans of one doc
        idx = [int(r["shard"].split(":")[1]) for r in rows]
        assert idx == sorted(idx)
        # every non-final shard reaches the budget boundary
        last = idx[-1]
        for i in set(idx):
            if i == last:
                continue
            tot = sum(r["n_tokens"] for r in rows
                      if int(r["shard"].split(":")[1]) == i)
            start = min(r["tok_offset"] for r in rows
                        if int(r["shard"].split(":")[1]) == i)
            # the shard's last doc crosses the (i+1)*budget boundary —
            # first-fit never closes a shard early
            assert start + tot >= (i + 1) * BUDGET


def test_partition_invariance(corpus):
    a = {(r["doc_id"], r["shard"])
         for r in pack_shards(corpus, BUDGET, n_buckets=N_BUCKETS).collect()}
    b = {(r["doc_id"], r["shard"])
         for r in pack_shards(corpus.repartition(7), BUDGET,
                              n_buckets=N_BUCKETS).collect()}
    assert a == b


def test_manifest_conserves_tokens(corpus):
    packed = pack_shards(corpus, BUDGET, n_buckets=N_BUCKETS)
    man = shard_manifest(packed)
    total = man.agg(F.sum("n_tokens"), F.sum("n_docs")).collect()[0]
    from rag_document_parser_spark.operators.dedup import words
    expect = corpus.agg(
        F.sum(F.size(words(F.col("text")))).alias("t")).collect()[0]["t"]
    assert total[0] == expect
    assert total[1] == corpus.count()


def test_budget_validation(corpus):
    with pytest.raises(ValueError):
        pack_shards(corpus, 0)


def test_matches_python_simulation(spark):
    """Independent pure-Python oracle: md5 bucket + key sort + running
    sum reproduces every Spark-side shard assignment bit-for-bit."""
    import hashlib
    import re

    docs = [(f"doc{i:03d}",
             " ".join(f"w{(i * 7 + j) % 50}" for j in range((i * 13) % 40)))
            for i in range(80)]
    out = {r["doc_id"]: (r["bucket"], r["shard"], r["n_tokens"],
                         r["tok_offset"])
           for r in pack_shards(
               spark.createDataFrame(docs, ["doc_id", "text"]),
               BUDGET, n_buckets=N_BUCKETS).collect()}

    def toks(text):
        return [t for t in re.split(r"[^a-z0-9؀-ۿ]+", text.lower()) if t]

    staged = []
    for doc_id, text in docs:
        key = hashlib.md5(doc_id.encode()).hexdigest()
        bucket = int(key[:15], 16) % N_BUCKETS
        staged.append((bucket, key, doc_id, len(toks(text))))
    expect = {}
    for bucket in range(N_BUCKETS):
        cum = 0
        for b, key, doc_id, n in sorted(s for s in staged if s[0] == bucket):
            expect[doc_id] = (bucket, f"{bucket}:{cum // BUDGET}", n, cum)
            cum += n
    assert out == expect


# ---------------------------------------------------------------------------
# token-stream packing (GPT-style fixed-length sequences)
# ---------------------------------------------------------------------------

SEQ_LEN = 16


@pytest.fixture(scope="module")
def streamed(corpus):
    from rag_document_parser_spark.operators.packing import (
        pack_token_stream)

    return pack_token_stream(corpus, SEQ_LEN, n_buckets=N_BUCKETS).collect()


def test_stream_conserves_every_token(streamed, corpus):
    """Per doc: fragments cover the doc exactly — contiguous
    tok_start_in_doc ranges summing to the doc's token count."""
    from collections import defaultdict

    toks = {r["doc_id"]: len(r["text"].split())
            for r in corpus.collect()}
    by_doc = defaultdict(list)
    for r in streamed:
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(toks)   # every doc has >=1 token here
    for did, frags in by_doc.items():
        frags.sort(key=lambda r: r["seq_idx"])
        pos = 0
        for f in frags:
            assert f["tok_start_in_doc"] == pos
            assert f["n_tok"] >= 1
            pos += f["n_tok"]
        assert pos == toks[did]


def test_stream_sequences_exactly_full(streamed):
    """Per bucket: every sequence except the last carries exactly
    SEQ_LEN tokens, fragments tile [0, SEQ_LEN) without gaps."""
    from collections import defaultdict

    by_seq = defaultdict(list)
    last_seq = {}
    for r in streamed:
        by_seq[r["seq"]].append(r)
        last_seq[r["bucket"]] = max(last_seq.get(r["bucket"], -1),
                                    r["seq_idx"])
    for seq, frags in by_seq.items():
        bucket = frags[0]["bucket"]
        frags.sort(key=lambda r: r["tok_start_in_seq"])
        pos = 0
        for f in frags:
            assert f["tok_start_in_seq"] == pos
            pos += f["n_tok"]
        if frags[0]["seq_idx"] < last_seq[bucket]:
            assert pos == SEQ_LEN
        else:
            assert 1 <= pos <= SEQ_LEN


def test_stream_straddles_are_split_rows(streamed):
    """With 3..27-token docs and SEQ_LEN=16, some docs must straddle a
    boundary and appear as >=2 rows."""
    from collections import Counter

    c = Counter(r["doc_id"] for r in streamed)
    assert any(n >= 2 for n in c.values())


def test_stream_zero_token_docs_emit_nothing(spark):
    from rag_document_parser_spark.operators.packing import (
        pack_token_stream)

    df = spark.createDataFrame(
        [("a", "one two three"), ("b", "???"), ("c", "")],
        ["doc_id", "text"])
    rows = pack_token_stream(df, 4, n_buckets=2).collect()
    assert {r["doc_id"] for r in rows} == {"a"}


def test_stream_seq_len_validation(corpus):
    from rag_document_parser_spark.operators.packing import (
        pack_token_stream)

    with pytest.raises(ValueError):
        pack_token_stream(corpus, 0)


def test_write_training_shards_roundtrip(spark, corpus, tmp_path):
    """The sink writes every doc exactly once, per-bucket directories,
    rows readable in shard/offset order, and a manifest whose totals
    match both the written data and the in-memory assignments."""
    import os

    from rag_document_parser_spark.operators.packing import (
        write_training_shards)

    out = str(tmp_path / "shards")
    summary = write_training_shards(corpus, out, BUDGET,
                                    n_buckets=N_BUCKETS)
    assert summary["n_docs"] == 120

    data = spark.read.parquet(os.path.join(out, "data"))
    # one row per doc, text preserved
    assert data.count() == 120
    src = {r.doc_id: r.text for r in corpus.collect()}
    for r in data.collect():
        assert src[r.doc_id] == r.text
    # bucket partition dirs exist
    assert any(d.startswith("bucket=")
               for d in os.listdir(os.path.join(out, "data")))
    # matches the pure-transform assignments bit for bit
    mem = {(r.doc_id, r.shard, r.n_tokens, r.tok_offset)
           for r in pack_shards(corpus, BUDGET, n_buckets=N_BUCKETS)
           .collect()}
    disk = {(r.doc_id, r.shard, r.n_tokens, r.tok_offset)
            for r in data.collect()}
    assert mem == disk
    # manifest totals = data totals; shard count matches summary
    man = spark.read.parquet(os.path.join(out, "manifest"))
    t = man.agg(F.sum("n_tokens"), F.count("*"), F.sum("n_docs")).collect()[0]
    assert t[0] == summary["total_tokens"]
    assert t[1] == summary["n_shards"]
    assert t[2] == 120
    # within one shard, offsets strictly increase in read order per file
    one = data.where(F.col("shard") == data.select("shard").first()[0]) \
              .select("tok_offset").collect()
    offs = [r.tok_offset for r in one]
    assert offs == sorted(offs)
