

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
