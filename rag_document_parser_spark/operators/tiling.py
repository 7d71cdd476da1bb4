"""TextTiling topical segmentation (Hearst 1997, "TextTiling:
Segmenting Text into Multi-paragraph Subtopic Passages", CL 23(1)):
find the token positions where a document changes subject, by scoring
the lexical cohesion across every candidate gap and placing boundaries
at deep similarity valleys. The pipeline uses it to split long
documents into topically coherent chunks — the RAG-chunking complement
to ``chunking.chunk_documents`` (fixed windows) and
``sentences.sentence_chunks`` (sentence packing), which both cut at
arbitrary topic-blind positions.

Documented deltas from the paper, each chosen so both engines replay
the arithmetic bit-exactly (the repo's oracle-gate discipline):

- **Fixed-width pseudo-sentences** of ``w`` tokens (the paper's own
  normalization — §3.1 notes real sentences make scores incomparable).
- **Block size one pseudo-sentence per side.** The paper's block
  comparison averages k=10-token-sentence blocks; one w-token block a
  side is the same window mass with w sized accordingly.
- **Set Jaccard instead of tf cosine** for the gap score: cosine needs
  sqrt (not bit-portable); Jaccard of the block token SETS is the
  integer-exact member of the same lexical-overlap family,
  ``sim_e6 = |A∩B|·1e6 div |A∪B|``.
- **Bounded ±p peak windows for depth.** The paper walks left/right to
  the nearest peak; an unbounded walk is inherently sequential. Depth
  here is ``(max sim over [g−p, g] − sim) + (max sim over [g, g+p] −
  sim)`` — two frame-bounded window maxes, which is also how the
  smoothed LC variant localizes peaks.
- **Fixed integer cutoff** instead of the μ−σ/2 adaptive threshold
  (σ needs sqrt). Callers wanting the adaptive rule can derive it from
  the returned depth distribution.

Scale shape: gap scores are computed entirely INSIDE the scan
projection — the staged token array is sliced per gap by a
``transform`` over the gap sequence, so no shuffle and no Python
touches the text. The only exchange is the per-doc window for depth,
partitioned by doc_id (uniform) and bounded by n_tokens/w rows per
doc; a giant doc contributes many GAP rows, not a giant buffered
window frame.

No reference analog: the reference stops at cleaned text
(`/root/reference/main.py:72-147`); segmentation is scale-path
training-data tooling like the chunking/sentences tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rag_document_parser_spark.operators.dedup import words

__all__ = ["segmentation_agreement", "texttiling",
           "texttiling_segments", "tiling_chunks"]


def texttiling(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", w: int = 20, p: int = 5,
               cutoff_e6: int = 400_000) -> DataFrame:
    """Per-gap TextTiling scores: one row per candidate boundary
    between w-token pseudo-sentences — ``(id, gap_idx, gap_token,
    sim_e6, depth_e6, boundary)``. ``gap_token`` is the token offset
    the gap sits at (gap_idx · w); ``boundary`` is ``depth_e6 >=
    cutoff_e6``. Docs with fewer than ``w + 1`` tokens have no gaps
    and emit no rows (a one-block doc has nothing to segment).
    """
    staged = df.select(F.col(id_col).alias("id"),
                       words(F.col(text_col)).alias("_t"))
    # nb = ceil(len / w) in pure integer form; the per-gap struct is one
    # SQL expression so the block slices, distincts, and the integer
    # `div` all stay inside the scan's codegen span
    left = f"array_distinct(slice(_t, (g - 1) * {w} + 1, {w}))"
    right = f"array_distinct(slice(_t, g * {w} + 1, {w}))"
    inter = f"size(array_intersect({left}, {right}))"
    gap_sim = F.expr(f"""
        transform(
          CASE WHEN (size(_t) + {w} - 1) div {w} >= 2
               THEN sequence(1, cast((size(_t) + {w} - 1) div {w} as int)
                                - 1)
               ELSE cast(array() as array<int>) END,
          g -> named_struct(
            'gidx', cast(g as bigint),
            'sim_e6', cast({inter} * 1000000
                           div (size({left}) + size({right}) - {inter})
                           as bigint)))
    """)
    gaps = (staged.select("id", F.explode_outer(gap_sim).alias("_g"))
            .where(F.col("_g").isNotNull())
            .select("id", F.col("_g.gidx").alias("gap_idx"),
                    F.col("_g.sim_e6").alias("sim_e6")))
    wl = (Window.partitionBy("id").orderBy("gap_idx")
          .rowsBetween(-p, Window.currentRow))
    wr = (Window.partitionBy("id").orderBy("gap_idx")
          .rowsBetween(Window.currentRow, p))
    depth = (F.max("sim_e6").over(wl) - F.col("sim_e6")
             + F.max("sim_e6").over(wr) - F.col("sim_e6"))
    return (gaps.select(
        "id", "gap_idx",
        (F.col("gap_idx") * w).cast("long").alias("gap_token"),
        "sim_e6", depth.cast("long").alias("depth_e6"))
        .withColumn("boundary", F.col("depth_e6") >= int(cutoff_e6)))


def texttiling_segments(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", w: int = 20, p: int = 5,
                        cutoff_e6: int = 400_000) -> DataFrame:
    """Segment summary per document: ``(id, n_gaps, n_boundaries,
    n_segments)`` where ``n_segments = n_boundaries + 1`` for any doc
    that produced gaps (single-block docs report one segment over zero
    gaps). One map-side-combinable aggregate over ``texttiling``."""
    t = texttiling(df, text_col, id_col, w, p, cutoff_e6)
    agg = (t.groupBy("id")
           .agg(F.count("*").cast("long").alias("n_gaps"),
                F.sum(F.col("boundary").cast("long")).cast("long")
                .alias("n_boundaries")))
    base = df.select(F.col(id_col).alias("id")).distinct()
    return (base.join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_gaps", F.lit(0)).cast("long")
                    .alias("n_gaps"),
                    F.coalesce("n_boundaries", F.lit(0)).cast("long")
                    .alias("n_boundaries"))
            .withColumn("n_segments",
                        (F.col("n_boundaries") + 1).cast("long")))


def tiling_chunks(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", w: int = 20, p: int = 5,
                  cutoff_e6: int = 400_000) -> DataFrame:
    """Materialized topical chunks: cut each document's token stream at
    its TextTiling boundaries and emit one row per segment —
    ``(id, seg_idx, start_token, n_tokens, text)`` with ``text`` the
    space-joined token span. Docs without gaps (or without boundaries)
    emit one whole-doc segment; empty docs emit one empty segment —
    every input doc appears, the ``chunk_documents`` convention.

    Scale shape: one groupBy on the uniform doc key collapses the
    boundary gaps to a sorted cut-point array (bounded by
    n_tokens/w per doc); the join back to the staged token array is
    keyed by the same uniform id; segment slicing is a per-row
    ``transform`` inside codegen. A giant doc costs one wide row, the
    same unit the extraction job already banks on.
    """
    t = texttiling(df, text_col, id_col, w, p, cutoff_e6)
    cuts = (t.where(F.col("boundary"))
            .groupBy("id")
            .agg(F.array_sort(F.collect_list("gap_token")).alias("_cuts")))
    staged = df.select(F.col(id_col).alias("id"),
                       words(F.col(text_col)).alias("_t"))
    j = staged.join(cuts, "id", "left").select(
        "id", "_t",
        F.coalesce("_cuts", F.expr("cast(array() as array<bigint>)"))
        .alias("_cuts"))
    # starts = [0] ++ cuts; ends = cuts ++ [len]; one segment per pair.
    # element_at is 1-based (matching the cut indices); the CASE guards
    # keep every access in [1, size(_cuts)]
    segs = F.expr("""
        transform(
          sequence(0, size(_cuts)),
          i -> named_struct(
            'seg_idx', cast(i as bigint),
            'start_token',
              cast(CASE WHEN i = 0 THEN 0
                        ELSE element_at(_cuts, i) END as bigint),
            'n_tokens', cast(
              (CASE WHEN i = size(_cuts) THEN size(_t)
                    ELSE element_at(_cuts, i + 1) END)
              - (CASE WHEN i = 0 THEN 0
                      ELSE element_at(_cuts, i) END) as bigint),
            'text', array_join(slice(
              _t,
              cast(CASE WHEN i = 0 THEN 1
                        ELSE element_at(_cuts, i) + 1 END as int),
              cast((CASE WHEN i = size(_cuts) THEN size(_t)
                         ELSE element_at(_cuts, i + 1) END)
                   - (CASE WHEN i = 0 THEN 0
                          ELSE element_at(_cuts, i) END)
                   as int)), ' ')))
    """)
    return (j.select("id", F.explode(segs).alias("_s"))
            .select("id", F.col("_s.seg_idx").alias("seg_idx"),
                    F.col("_s.start_token").alias("start_token"),
                    F.col("_s.n_tokens").alias("n_tokens"),
                    F.col("_s.text").alias("text")))


def segmentation_agreement(df: DataFrame, id_col: str = "id",
                           n_col: str = "n_units",
                           ref_col: str = "ref_bounds",
                           hyp_col: str = "hyp_bounds") -> DataFrame:
    """Pk (Beeferman, Berger & Lafferty 1999) and WindowDiff (Pevzner
    & Hearst 2002): the standard near-miss-tolerant agreement metrics
    between a reference and a hypothesis segmentation. Input: one row
    per document — ``n_units`` positions with boundary sets given as
    0-based gap indices in ``[1, n_units)``. Output per doc:
    ``(id, k, n_windows, pk_e6, windowdiff_e6)``.

    The probe window ``k = max(1, n div (2·(|ref|+1)))`` is the
    conventional half-mean-reference-segment length (integer floor).
    For each window start ``i`` in ``[0, n−k)``: Pk counts windows
    where exactly one of the two segmentations has ANY boundary in
    ``(i, i+k]``; WindowDiff counts windows where the boundary COUNTS
    differ. Both report in e6 fixed point over ``n_windows = n − k``;
    degenerate docs (``n <= k``) report zero windows and NULL scores,
    documented over hidden.

    Row-local like the rest of the tiling tier: the window sweep is a
    ``transform`` + ``filter`` chain inside codegen — O(n·|bounds|)
    per doc, bounded by segment granularity, no shuffle. Boundary
    counts per window use ``filter`` over the (small) boundary arrays
    rather than prefix sums: |bounds| ≪ n in any real segmentation.
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(n_col).cast("int").alias("_n"),
        F.col(ref_col).cast("array<int>").alias("_r"),
        F.col(hyp_col).cast("array<int>").alias("_h"))
    staged = staged.withColumn(
        "_k", F.expr("greatest(1, _n div (2 * (size(_r) + 1)))"))
    cnt = ("size(filter({b}, x -> x > i AND x <= i + _k))")
    sweep = F.expr(f"""
      aggregate(
        CASE WHEN _n - _k >= 1 THEN sequence(0, _n - _k - 1)
             ELSE cast(array() as array<int>) END,
        named_struct('pk', 0L, 'wd', 0L),
        (acc, i) -> named_struct(
          'pk', acc.pk + IF(({cnt.format(b='_r')} > 0)
                            != ({cnt.format(b='_h')} > 0), 1L, 0L),
          'wd', acc.wd + IF({cnt.format(b='_r')}
                            != {cnt.format(b='_h')}, 1L, 0L)))
    """)
    out = staged.select("id", "_k", F.col("_n"), sweep.alias("_s"))
    nw = F.greatest(F.col("_n") - F.col("_k"), F.lit(0)).cast("long")
    return out.select(
        "id", F.col("_k").cast("long").alias("k"),
        nw.alias("n_windows"),
        F.when(nw > 0, F.expr("_s.pk * 1000000 div (_n - _k)"))
        .cast("long").alias("pk_e6"),
        F.when(nw > 0, F.expr("_s.wd * 1000000 div (_n - _k)"))
        .cast("long").alias("windowdiff_e6"))
