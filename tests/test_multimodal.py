

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
