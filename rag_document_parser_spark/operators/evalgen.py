"""Long-context evaluation data generation: needle-in-a-haystack
probes (the retrieval-accuracy-vs-depth protocol popularized by the
Gemini 1.5 / Claude long-context reports, after Kamradt's original
needle test). A pipeline that ships long-context training data also
ships the probes that measure whether models trained on it can USE the
context — haystacks cut from the corpus itself, a uniquely
identifiable needle fact inserted at controlled token depths, and the
ground-truth answer carried alongside.

All construction is deterministic and token-accurate: the haystack is
the document's first ``context_tokens`` tokens, the needle is a fixed
sentence parameterized by probe id and an md5-derived answer token,
and the insertion point is ``depth_pct`` percent of the context in
TOKENS (floor), so a probe at depth 50 sits at token
``context_tokens div 2`` exactly — the property the depth sweep
measures. One row per (document, depth).

Scale shape: a pure row-local projection (tokenize once, slice /
concat / join inside codegen) exploded by the depth list — no
shuffle, no Python. Documents shorter than ``context_tokens`` are
skipped (a truncated haystack would silently change the depth
geometry); the doc filter is scan-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words

__all__ = ["needle_probes"]


def needle_probes(df: DataFrame, context_tokens: int = 256,
                  depths=(10, 50, 90), text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Generate needle probes: ``(probe_id, id, depth_pct, insert_pos,
    n_tokens, context, answer)``. ``probe_id`` is ``"<id>-<depth>"``;
    ``answer`` is a 12-hex-char token derived from md5(id, depth) —
    unique, incompressible, and absent from the corpus by construction;
    the needle sentence is ``"the secret token for probe <probe_id> is
    <answer>"`` inserted BETWEEN haystack tokens at ``insert_pos =
    context_tokens · depth_pct div 100``; ``n_tokens`` counts the
    final context (haystack + needle length).
    """
    ds = [int(d) for d in depths]
    staged = (df.select(F.col(id_col).alias("id"),
                        words(F.col(text_col)).alias("_t"))
              .where(F.size("_t") >= context_tokens)
              .select("id", F.slice("_t", 1, context_tokens).alias("_t")))
    ex = staged.select(
        "id", F.explode(F.array(*[F.lit(d) for d in ds])).alias("depth_pct"))
    probe_id = F.concat(F.col("id").cast("string"), F.lit("-"),
                        F.col("depth_pct").cast("string"))
    answer = F.substring(
        F.md5(F.concat(F.lit("needle:"), probe_id)), 1, 12)
    pos = F.expr(f"{int(context_tokens)} * depth_pct div 100")
    needle = F.concat(F.lit("the secret token for probe "), probe_id,
                      F.lit(" is "), answer)
    out = (ex.join(staged, "id")
           .select(
               probe_id.alias("probe_id"), "id",
               F.col("depth_pct").cast("long").alias("depth_pct"),
               pos.cast("long").alias("insert_pos"),
               needle.alias("_needle"), "_t"))
    context = F.concat_ws(
        " ",
        F.array_join(F.expr("slice(_t, 1, cast(insert_pos as int))"), " "),
        F.col("_needle"),
        F.array_join(F.expr(
            f"slice(_t, cast(insert_pos as int) + 1, "
            f"{int(context_tokens)})"), " "))
    # the probe id itself tokenizes (digits around the dash), so the
    # needle's token count is measured, not assumed
    return out.select(
        "probe_id", "id", "depth_pct", "insert_pos",
        (F.lit(context_tokens)
         + F.size(words(F.col("_needle")))).cast("long")
        .alias("n_tokens"),
        F.trim(context).alias("context"),
        F.substring(F.md5(F.concat(F.lit("needle:"), F.col("probe_id"))),
                    1, 12).alias("answer"))
