"""Class-profile classification (operators/classify.py)."""

import pyspark.sql.functions as F

from rag_document_parser_spark.operators.classify import (
    classify,
    train_class_profiles,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _toy(spark):
    rows = [
        ("t1", "en", "the cat and the dog"),
        ("t2", "en", "the bird and the fish"),
        ("t3", "de", "der hund und der vogel"),
        ("t4", "de", "der fisch und der baum"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_profiles_hand_computed(spark):
    m = {(r["label"], r["term"]): r["freq_e"]
         for r in train_class_profiles(_toy(spark), min_count=2).collect()}
    # en mass = 10 tokens; 'the' appears 4x -> 4*1e6 div 10 = 400000
    assert m[("en", "the")] == 400_000
    assert m[("en", "and")] == 200_000
    assert m[("de", "der")] == 400_000
    assert ("en", "cat") not in m  # min_count=2 prunes hapax terms


def test_classify_separates_languages(spark):
    model = train_class_profiles(_toy(spark), min_count=2)
    probe = spark.createDataFrame(
        [("p1", "the fox and the hen"), ("p2", "der baum und der ast"),
         ("p3", ""), ("p4", "qqq www")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in classify(probe, model).collect()}
    assert out["p1"]["label_pred"] == "en"
    assert out["p2"]["label_pred"] == "de"
    # empty doc and out-of-vocabulary doc: NULL label, zero score
    assert out["p3"]["label_pred"] is None and out["p3"]["score_e6"] == 0
    assert out["p4"]["label_pred"] is None and out["p4"]["score_e6"] == 0
    assert out["p1"]["score_e6"] > 0


def test_classify_accuracy_with_planted_markers(spark):
    # the raw synthetic corpus's lang column is (near-)independent of
    # its text, so accuracy there only measures label priors; plant two
    # label-specific marker tokens per doc to verify the decision rule
    import pyspark.sql.functions as F
    docs = _docs(spark).select(
        "doc_id", "lang",
        F.concat("text", F.lit(" mk"), "lang", F.lit(" mk"), "lang")
        .alias("text"))
    from rag_document_parser_spark.operators.sampling import hash_sample
    model = train_class_profiles(hash_sample(docs, 0.4, salt="acc"),
                                 label_col="lang", min_count=2)
    out = classify(docs, model).join(docs.select("doc_id", "lang"),
                                     "doc_id")
    n = out.count()
    right = out.where(F.col("label_pred") == F.col("lang")).count()
    assert right / n > 0.95, (right, n)


def test_profiles_underflow_pruned(spark):
    # fixed-point underflow leg: with a small scale, tc*scale div lc hits
    # 0 for terms rarer than 1/scale of a label's mass. Previously a term
    # underflowing in EVERY label reached the share division with tot=0
    # (NULL share_e); such rows must now be pruned instead.
    rows = [
        ("u1", "a", "x x " + "filler " * 40),
        ("u2", "b", "x x " + "stuff " * 40),
    ]
    labeled = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    # label mass = 42 tokens, tc('x') = 2, scale=10 -> 2*10 div 42 = 0
    model = train_class_profiles(labeled, scale=10, min_count=2)
    got = model.collect()
    assert all(r["share_e"] is not None for r in got)
    assert not any(r["term"] == "x" for r in got)
    # survivors keep the invariant freq_e >= 1
    assert all(r["freq_e"] >= 1 for r in got)
    # classify still labels docs off the surviving (filler/stuff) terms
    probe = spark.createDataFrame(
        [("p1", "filler filler x"), ("p2", "stuff stuff x")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["label_pred"]
           for r in classify(probe, model).collect()}
    assert out == {"p1": "a", "p2": "b"}


def test_classify_partition_invariant(spark):
    docs = _docs(spark).limit(80)
    model = train_class_profiles(docs, label_col="lang", min_count=2)
    a = sorted(map(tuple, classify(docs, model).collect()))
    b = sorted(map(tuple,
                   classify(docs.repartition(13),
                            model, broadcast_model=False).collect()))
    assert a == b and len(a) == 80
