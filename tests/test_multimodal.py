

def test_caption_candidates_alignment(spark):
    from rag_document_parser_spark.operators.multimodal import (
        caption_candidates)

    schema = ("doc_id string, spans array<struct<kind string, text string, "
              "media_ref string, offset int>>")
    df = spark.createDataFrame([
        ("a", [("text", "intro", None, 0),
               ("media", "", "img1", 10),
               ("text", "between", None, 20),
               ("media", "", "img2", 30)]),
        ("b", [("media", "", "img3", 5),          # nothing precedes
               ("text", "late", None, 9)]),
        ("c", [("text", "", None, 0),             # empty text never captions
               ("media", "", "img4", 4)]),
        ("d", [("text", "x", None, 0)]),          # no media: no rows
    ], schema)
    got = {r["media_ref"]: r for r in caption_candidates(df).collect()}
    assert set(got) == {"img1", "img2", "img3", "img4"}
    assert got["img1"]["caption"] == "intro"
    assert got["img1"]["caption_offset"] == 0
    # nearest preceding, not first: img2 takes 'between' over 'intro'
    assert got["img2"]["caption"] == "between"
    assert got["img2"]["caption_offset"] == 20
    assert got["img3"]["caption"] is None
    assert got["img3"]["caption_offset"] is None
    assert got["img4"]["caption"] is None


def test_caption_candidates_zero_shuffle_plan(spark):
    from rag_document_parser_spark.operators.multimodal import (
        caption_candidates)

    schema = ("doc_id string, spans array<struct<kind string, text string, "
              "media_ref string, offset int>>")
    df = spark.createDataFrame(
        [("a", [("text", "t", None, 0), ("media", "", "m", 1)])], schema)
    plan = (caption_candidates(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def _il_df(spark, rows):
    schema = ("doc_id string, spans array<struct<kind string, text string, "
              "media_ref string, offset int>>")
    return spark.createDataFrame(rows, schema)


def test_interleave_sequences_greedy_semantics(spark):
    from rag_document_parser_spark.operators.multimodal import (
        interleave_sequences)

    # out-of-offset-order input; costs: a=2, img=3, b=2, tail=3
    df = _il_df(spark, [("d", [
        ("text", "body text", None, 20),
        ("media", "", "img-1", 10),
        ("text", "intro one", None, 0),
        ("text", "tail sect three", None, 40),
    ])])
    out = {r["seq_idx"]: r for r in
           interleave_sequences(df, max_tokens=5, media_cost=3).collect()}
    # greedy: [intro(2)+img(3)]=5, [body(2)+tail(3)]=5
    assert out[0]["n_tok"] == 5 and out[0]["n_media"] == 1
    assert out[0]["text_joined"] == "intro one"
    assert out[0]["media_refs"] == "img-1"
    assert out[1]["text_joined"] == "body text tail sect three"
    assert out[1]["n_media"] == 0 and out[1]["media_refs"] == ""
    # an oversized span gets its own oversized sequence, never split
    big = _il_df(spark, [("d", [
        ("text", "a b c d e f g h", None, 0),
        ("text", "x y", None, 10),
    ])])
    rows = {r["seq_idx"]: r for r in
            interleave_sequences(big, max_tokens=4, media_cost=3).collect()}
    assert rows[0]["n_tok"] == 8 and rows[0]["n_spans"] == 1
    assert rows[1]["n_tok"] == 2
    # zero-cost (empty text) spans join the current sequence for free
    z = _il_df(spark, [("d", [
        ("text", "", None, 0), ("media", "", "m0", 1),
        ("text", "w1 w2", None, 2),
    ])])
    one = interleave_sequences(z, max_tokens=5, media_cost=3).collect()
    assert len(one) == 1 and one[0]["n_tok"] == 5
    assert one[0]["n_text"] == 2 and one[0]["text_joined"] == "w1 w2"
    import pytest as _pt
    with _pt.raises(ValueError):
        interleave_sequences(z, max_tokens=0)
    with _pt.raises(ValueError):
        interleave_sequences(z, media_cost=-1)


def test_interleave_sequences_zero_shuffle_and_invariance(spark):
    from rag_document_parser_spark.operators.multimodal import (
        interleave_sequences)

    rows = [(f"d{i}", [("text", f"w{j} " * (j % 4), None, j * 10)
                       if j % 2 == 0 else ("media", "", f"m{j}", j * 10)
                       for j in range(6)]) for i in range(40)]
    df = _il_df(spark, rows)
    plan = (interleave_sequences(df, max_tokens=6, media_cost=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    key = lambda r: (r["doc_id"], r["seq_idx"], r["n_tok"],  # noqa: E731
                     r["text_joined"], r["media_refs"])
    a = sorted(map(key, interleave_sequences(
        df, max_tokens=6, media_cost=2).collect()))
    b = sorted(map(key, interleave_sequences(
        df.repartition(13), max_tokens=6, media_cost=2).collect()))
    assert a == b and a


def _py_ahash(pixels):
    import math
    pe = [math.floor(x * 1_000_000) for x in pixels]
    s, n = sum(pe), len(pe)
    h = 0
    for i, p in enumerate(pe[:64]):
        if p * n > s:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def _py_dhash(pixels, width=9):
    import math
    pe = [math.floor(x * 1_000_000) for x in pixels]
    cols = width - 1
    h = 0
    for i in range(64):
        r, c = i // cols, i % cols
        if pe[r * width + c + 1] > pe[r * width + c]:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def _grid_df(spark, grids):
    return spark.createDataFrame(
        [(f"img://{i}", [float(v) for v in g]) for i, g in enumerate(grids)],
        "media_ref string, pixels array<double>")


def test_ahash_dhash_match_python_twin(spark):
    from rag_document_parser_spark.operators.multimodal import (
        ahash64, dhash64)

    grids = [[((i * 73 + j * 37) % 101) / 128.0 for j in range(72)]
             for i in range(12)]
    df = _grid_df(spark, grids)
    a = {r.id: r.phash for r in ahash64(df).collect()}
    d = {r.id: r.phash for r in dhash64(df).collect()}
    for i, g in enumerate(grids):
        assert a[f"img://{i}"] == _py_ahash(g), i
        assert d[f"img://{i}"] == _py_dhash(g), i


def test_dhash_brightness_invariant_ahash_not(spark):
    """dHash compares neighbors, so a global brightness shift leaves it
    unchanged; aHash thresholds on the mean, so it also survives a
    uniform shift (both sides move together) — but a single hot pixel
    flips aHash bits while dHash only changes at that pixel's edges."""
    from rag_document_parser_spark.operators.multimodal import (
        ahash64, dhash64)

    g = [((j * 37) % 101) / 128.0 for j in range(72)]
    shifted = [v + 0.125 for v in g]
    df = _grid_df(spark, [g, shifted])
    for fn in (ahash64, dhash64):
        hs = {r.id: r.phash for r in fn(df).collect()}
        assert hs["img://0"] == hs["img://1"], fn.__name__


def test_ahash_short_and_empty_grids(spark):
    from rag_document_parser_spark.operators.multimodal import (
        ahash64, dhash64)

    df = _grid_df(spark, [[], [0.5] * 10, [0.1] * 72])
    a = {r.id for r in ahash64(df).collect()}
    assert a == {"img://1", "img://2"}  # empty grid dropped
    d = {r.id for r in dhash64(df).collect()}
    assert d == {"img://2"}  # < 72 cells not dhash-able


def test_phash_near_pairs_planted_clones(spark):
    from rag_document_parser_spark.operators.multimodal import (
        ahash64, phash_near_pairs)

    base = [[((i * 73 + j * 37) % 101) / 128.0 for j in range(72)]
            for i in range(8)]
    clones = [list(g) for g in base[:3]]  # exact re-encodes of 0..2
    df = _grid_df(spark, base + clones)
    sig = ahash64(df)
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in phash_near_pairs(sig, max_hamming=3).collect()}
    for i in range(3):
        key = tuple(sorted((f"img://{i}", f"img://{8 + i}")))
        assert pairs[key] == 0, key


# ---- media_ref canonicalization over interleaved spans -------------------

def test_remap_media_refs_rewrites_dups_preserves_order(spark):
    from rag_document_parser_spark.operators.multimodal import (
        media_dedup, remap_media_refs)
    from rag_document_parser_spark.schema import INPUT_SCHEMA

    items = spark.createDataFrame(
        [("img-a", "image", bytearray(b"same")),
         ("img-b", "image", bytearray(b"same")),
         ("img-c", "image", bytearray(b"other"))],
        "media_ref string, modality string, payload binary")
    ded = media_dedup(items)
    spans = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0),
                 ("image", None, "img-b", 1),
                 ("image", None, "img-c", 2)]),
         ("d2", [("image", None, "img-a", 0)]),
         ("d3", [])],
        INPUT_SCHEMA)
    out = {r["doc_id"]: r for r in remap_media_refs(spans, ded).collect()}
    d1 = [(s["kind"], s["media_ref"], s["offset"])
          for s in out["d1"]["spans"]]
    # img-b -> keeper img-a; img-c unique, untouched; order unchanged
    assert d1 == [("text", None, 0), ("image", "img-a", 1),
                  ("image", "img-c", 2)]
    assert out["d1"]["n_remapped"] == 1 and out["d1"]["n_spans"] == 3
    assert out["d2"]["n_remapped"] == 0      # the keeper itself
    assert out["d3"]["n_spans"] == 0 and out["d3"]["spans"] == []


def test_remap_media_refs_duplicate_offsets_keep_array_position(spark):
    """Re-assembly sorts on the original array POSITION, so spans with
    identical offsets (the chunk-boundary edge case) cannot swap."""
    from rag_document_parser_spark.operators.multimodal import (
        remap_media_refs)
    from rag_document_parser_spark.schema import INPUT_SCHEMA

    spans = spark.createDataFrame(
        [("d1", [("image", None, "x", 5), ("image", None, "y", 5),
                 ("text", "t", None, 5)])],
        INPUT_SCHEMA)
    empty = spark.createDataFrame(
        [], "media_ref string, keeper_ref string, is_dup boolean")
    out = remap_media_refs(spans, empty).collect()[0]
    assert [(s["kind"], s["media_ref"]) for s in out["spans"]] == \
        [("image", "x"), ("image", "y"), ("text", None)]


def test_remap_media_refs_partition_invariance(spark):
    from rag_document_parser_spark.operators.multimodal import (
        media_dedup, remap_media_refs)
    from rag_document_parser_spark.schema import INPUT_SCHEMA

    items = spark.createDataFrame(
        [(f"r{i}", "image", bytearray(b"p%d" % (i % 3)))
         for i in range(9)],
        "media_ref string, modality string, payload binary")
    ded = media_dedup(items)
    spans = spark.createDataFrame(
        [(f"d{j}", [("image", None, f"r{(j * 5 + k) % 9}", k)
                    for k in range(4)]) for j in range(12)],
        INPUT_SCHEMA)
    a = sorted((r["doc_id"], r["n_remapped"],
                tuple(s["media_ref"] for s in r["spans"]))
               for r in remap_media_refs(spans, ded).collect())
    b = sorted((r["doc_id"], r["n_remapped"],
                tuple(s["media_ref"] for s in r["spans"]))
               for r in remap_media_refs(
                   spans.repartition(7), ded,
                   broadcast_map=False).collect())
    assert a == b
