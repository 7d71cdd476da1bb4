"""Mojibake repair (operators/mojibake.py): round-trip property over
the whole repairable alphabet, both damage flavors, double-encoding
unwind, the clean-row gate, and rule-table hygiene."""

import pytest
from pyspark.sql import functions as F

from rag_document_parser_spark.operators.mojibake import (
    MOJIBAKE_RULES,
    fix_mojibake,
    fix_mojibake_expr,
)


def _cp1252(s):
    return s.encode("utf-8").decode("cp1252")


def _latin1(s):
    return s.encode("utf-8").decode("latin-1")


def test_rule_table_hygiene():
    # patterns unique, targets single chars, every pattern starts with
    # a multi-byte UTF-8 lead byte's decoded form
    pats = [m for m, _ in MOJIBAKE_RULES]
    assert len(pats) == len(set(pats))
    assert all(len(ch) == 1 for _, ch in MOJIBAKE_RULES)
    assert all(2 <= len(m) <= 3 for m in pats)
    # the generated table IS the codec round-trip (no hand-typed drift)
    for moji, ch in MOJIBAKE_RULES:
        assert moji.encode("cp1252", errors="ignore") == ch.encode("utf-8") \
            or moji.encode("latin-1") == ch.encode("utf-8")


def _fix(spark, texts):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = fix_mojibake(df).orderBy(F.col("doc_id").cast("int")).collect()
    return [(r["fixed"], r["changed"]) for r in rows]


def test_roundtrip_whole_alphabet(spark):
    """Damaging the full repairable alphabet with either codec and
    repairing restores it exactly."""
    alphabet = "".join(ch for _, ch in MOJIBAKE_RULES)
    seen = set()
    targets = "".join(
        ch for ch in alphabet if not (ch in seen or seen.add(ch)))
    cp_damageable = "".join(
        ch for ch in targets
        if ch.encode("utf-8").decode("cp1252", errors="ignore")
        and all(b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
                for b in ch.encode("utf-8")))
    out = _fix(spark, [_cp1252(cp_damageable), _latin1(targets)])
    assert out[0] == (cp_damageable, 1)
    assert out[1] == (targets, 1)


def test_flavor_and_double_encode_cases(spark):
    cases = [
        (_cp1252("Café – naïve «résumé»…"), "Café – naïve «résumé»…"),
        (_latin1("“Curly” — Áéíñ"), "“Curly” — Áéíñ"),
        ("double " + _cp1252(_cp1252("déjà €9")) + "!", "double déjà €9!"),
        ("plain ascii stays put", "plain ascii stays put"),
        ("unicode already fine: é—“ ”", "unicode already fine: é—“ ”"),
    ]
    got = _fix(spark, [c[0] for c in cases])
    for (damaged, want), (fixed, changed) in zip(cases, got):
        assert fixed == want
        assert changed == (1 if damaged != want else 0)


def test_null_and_empty(spark):
    df = spark.createDataFrame([("a", None), ("b", "")],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: (r["fixed"], r["changed"])
            for r in fix_mojibake(df).collect()}
    assert rows == {"a": (None, 0), "b": ("", 0)}


def test_passthrough_columns(spark):
    df = spark.createDataFrame([("a", "en", _cp1252("é"))],
                               ["doc_id", "lang", "text"])
    r = fix_mojibake(df).collect()[0]
    assert (r["lang"], r["fixed"], r["changed"]) == ("en", "é", 1)


def test_clean_rows_skip_chain_branch(spark):
    """Rows without a damage lead-in take the `otherwise` branch —
    asserted behaviorally: a string containing rule TARGETS but no
    lead-ins is untouched even though naive re-replacement would hit
    it (targets are single chars, never matched as patterns)."""
    clean = "é « – … already-correct"  # no Â Ã Å Æ Ë â anywhere
    out = _fix(spark, [clean])
    assert out[0] == (clean, 0)


def test_idempotent_on_repaired_output(spark):
    """Applying the fix to already-repaired text changes nothing
    (repair output contains no damage patterns). One re-application
    only — stacking the ~190-replace chain deeper than twice builds an
    expression tree the analyzer rejects, and idempotence needs one."""
    damaged = _cp1252("Café «déjà» – naïve…") + " " + _latin1("“q” Áé")
    df = spark.createDataFrame([("a", damaged)], ["doc_id", "text"])
    once = fix_mojibake(df).collect()[0]["fixed"]
    again = df.select(
        fix_mojibake_expr(F.lit(once)).alias("x")).collect()[0]["x"]
    assert again == once
