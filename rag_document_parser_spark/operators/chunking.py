"""Context-window chunking: split documents into overlapping
fixed-token windows for training / embedding pipelines.

Row-local by construction — the token staging, window starts, and
slice-joins are all per-row Catalyst expressions feeding one
``posexplode``; the physical plan has ZERO exchanges (chunking 10^12
docs is exactly as parallel as the scan that reads them). Integer
arithmetic only, so the DuckDB oracle reproduces every boundary.

Boundary semantics (the standard sliding-window rule):
- windows start at 0, stride, 2*stride, ... with
  ``stride = max_tokens - overlap``;
- a start is emitted while it is 0 or there are MORE than ``overlap``
  tokens left (a final window that would only repeat the previous
  window's tail is not emitted);
- docs with zero tokens produce zero rows (filter upstream to keep
  them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words


def chunk_documents(df: DataFrame, max_tokens: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per window: ``(id_col, chunk_idx, start_tok, n_tok,
    chunk_text)`` where ``chunk_text`` re-joins the window's tokens
    with single spaces (whitespace-normalized by design — token
    windows, not byte ranges)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens: {overlap=} {max_tokens=}")
    stride = max_tokens - overlap
    # two-stage: tokens first, then size over the BOUND attribute —
    # sizing the raw words() expression in the same projection would
    # duplicate the tokenizer (one eval per reference)
    staged = (df.select(F.col(id_col), words(F.col(text_col)).alias("_t"))
              .select(id_col, "_t", F.size("_t").alias("_n")))
    # last emitted start: the largest multiple of stride with more than
    # `overlap` tokens remaining — ((n - overlap - 1) div stride) * stride,
    # floored at 0; sequence() is inclusive of both ends
    last = (F.greatest(F.lit(0),
                       F.expr(f"((_n - {overlap} - 1) div {stride})"))
            * stride)
    # posexplode_outer + a post-generator filter on n_tok (which reads
    # the GENERATED start_tok, so PushDownPredicates cannot re-inline
    # the staged tokenizer into a scan filter — a `.where(_n > 0)` here
    # was plan-confirmed to evaluate the tokenizer 3x per row); empty
    # docs emit one (0, 0) window and drop at n_tok > 0
    ex = staged.select(
        id_col, "_t", "_n",
        F.posexplode_outer(F.sequence(F.lit(0), last, F.lit(stride)))
        .alias("chunk_idx", "start_tok"))
    n_tok = F.least(F.lit(max_tokens), F.col("_n") - F.col("start_tok"))
    return ex.where(n_tok > 0).select(
        id_col, "chunk_idx", "start_tok", n_tok.alias("n_tok"),
        F.array_join(F.slice("_t", F.col("start_tok") + 1, n_tok), " ")
        .alias("chunk_text"))
