"""Sentence segmentation + sentence-level dedup.

The reference's span model stops at paragraph granularity (its HTML/
PDF parsers emit block-level spans; `/root/reference/parsers/`); the
repo's ``paragraph_dedup`` strips block-level boilerplate. Web
boilerplate also recurs at SENTENCE granularity inside otherwise
unique paragraphs ("All rights reserved." mid-footer), which the
paragraph pass cannot see — this module is that finer pass, the same
RefinedWeb remove-every-occurrence semantics one level down.

Segmentation is a documented closed subset (the C4/Gopher tier's
discipline): a sentence boundary is ``[.!?]`` followed by whitespace;
the punctuation stays with its sentence, the whitespace run is
consumed. No abbreviation list, no quote-aware lookahead (RE2 has no
lookaround, and the DuckDB oracle runs RE2) — "Dr. Smith" splits. The
subset is shared verbatim with the oracle via ``SENT_BOUNDARY``.

Scale shape: segmentation is a row-local projection; the dedup is
``paragraph_dedup`` applied to a sentinel-delimited rendering — one
map-side-combinable groupBy on the sentence hash, a broadcast
blacklist, one doc-keyed shuffle to reassemble. Nothing new to audit:
the skew discipline is inherited, not copied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import paragraph_dedup

__all__ = ["SENT_BOUNDARY", "sentence_chunks", "sentence_dedup",
           "sentences_expr", "split_sentences", "sentence_burstiness"]

# RE2-safe boundary pattern, shared with the oracle. Replacement
# syntax is engine-specific ($1 Java / \1 RE2) — callers building SQL
# write the RE2 form.
SENT_BOUNDARY = r"([.!?])\s+"

_SENTINEL = "\x01"


def sentences_expr(c: Column) -> Column:
    """``array<string>`` of sentences under the subset boundary rule.

    Empty input yields an empty array; text with no boundary is one
    sentence. The sentinel is U+0001 — input text containing it would
    split spuriously (it cannot occur in extractor output: the Arrow
    kernel's control-char strip removes it upstream).
    """
    marked = F.regexp_replace(c, SENT_BOUNDARY, "$1" + _SENTINEL)
    return F.filter(F.split(marked, _SENTINEL, -1), lambda s: s != "")


def split_sentences(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per sentence: ``(id_col, sent_idx, sentence, n_sents)``
    with ``sent_idx`` 0-based in document order. Docs with no
    sentences (empty/NULL text) emit no rows."""
    staged = df.select(F.col(id_col),
                       sentences_expr(F.col(text_col)).alias("_s"))
    return (staged.select(
        id_col, F.size("_s").cast("long").alias("n_sents"),
        F.posexplode_outer("_s").alias("sent_idx", "sentence"))
        .where(F.col("sentence").isNotNull())
        .select(id_col, F.col("sent_idx").cast("long"), "sentence",
                "n_sents"))


def sentence_dedup(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_docs: int = 2,
                   min_len: int = 1,
                   broadcast_blacklist: bool = True) -> DataFrame:
    """Remove sentences recurring verbatim in >= ``min_docs`` docs
    (every occurrence — template noise has no keeper copy).

    Returns ``(id_col, n_sentences, n_removed, cleaned)`` with
    ``cleaned`` the surviving sentences re-joined by single spaces in
    document order. Sentences shorter than ``min_len`` chars are never
    counted or removed. Delegates the corpus pass to
    ``paragraph_dedup`` over a sentinel-delimited rendering, so the
    blacklist/broadcast/skew behavior is identical to the paragraph
    tier (see that docstring for the 100 TB audit).
    """
    staged = df.select(
        F.col(id_col),
        F.concat_ws(_SENTINEL, sentences_expr(F.col(text_col)))
        .alias("_s"))
    out = paragraph_dedup(staged, "_s", id_col, sep=_SENTINEL,
                          min_docs=min_docs, min_len=min_len,
                          broadcast_blacklist=broadcast_blacklist)
    return out.select(
        F.col(id_col),
        F.col("n_paragraphs").alias("n_sentences"), "n_removed",
        F.replace(F.col("cleaned"), F.lit(_SENTINEL), F.lit(" "))
        .alias("cleaned"))


def sentence_chunks(df: DataFrame, max_tokens: int = 128,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sentence-boundary RAG chunking: pack WHOLE sentences greedily
    into chunks of at most ``max_tokens`` tokens.

    ``chunking.chunk_documents`` slides a fixed token window and will
    cut mid-sentence; retrieval corpora prefer chunks that end where a
    sentence ends (the embedding of half a sentence retrieves poorly).
    Greedy rule, sequential by construction: a sentence joins the
    current chunk unless the chunk is non-empty and would exceed
    ``max_tokens`` with it, in which case it starts a new chunk. A
    single sentence longer than ``max_tokens`` gets its own oversized
    chunk — sentences are never split (documented; cap pathological
    inputs upstream with ``chunk_documents`` if needed).

    Output: one row per chunk — ``(id_col, chunk_idx, n_sents, n_tok,
    chunk_text)``, ``chunk_text`` the chunk's sentences joined by
    single spaces in document order; docs with no sentences emit no
    rows. Token counts use the shared ``words`` tokenizer; sentence
    boundaries are the module's RE2-safe subset rule.

    Scale shape: ZERO exchanges — segmentation, token counts, the
    greedy fold, and chunk assembly are all row-local Catalyst
    expressions feeding one ``posexplode``. Chunking 10^12 docs is
    exactly as parallel as the scan that reads them. The sequential
    fold carries ONLY ``(chunk-start indices, cur_sents, cur_tok)`` —
    small ints; chunk text/counts are assembled AFTER the fold from
    the boundary indices with ``slice`` + ``array_join``. Higher-order
    functions are interpreted (never codegen'd) and deep-copy their
    accumulator every step, so a fold accumulating the chunk structs
    and growing text costs O(doc²) copies — measured 8-10x slower than
    this index-only fold on the bench corpus.
    """
    from rag_document_parser_spark.operators.dedup import words

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    staged = (df.select(F.col(id_col),
                        sentences_expr(F.col(text_col)).alias("_s"))
              .select(id_col, "_s",
                      F.transform("_s",
                                  lambda s: F.size(words(s)).cast("long"))
                      .alias("_l"))
              .where(F.size("_s") > 0))

    a = lambda acc, f: acc.getField(f)  # noqa: E731

    def step(acc, i):
        tl = F.element_at(F.col("_l"), i)
        flush = (a(acc, "ns") > 0) & (a(acc, "tok") + tl > max_tokens)
        return F.struct(
            F.when(flush, F.concat(a(acc, "starts"), F.array(i)))
            .otherwise(a(acc, "starts")).alias("starts"),
            F.when(flush, F.lit(1).cast("long"))
            .otherwise(a(acc, "ns") + 1).alias("ns"),
            F.when(flush, tl).otherwise(a(acc, "tok") + tl).alias("tok"))

    init = F.struct(
        F.array(F.lit(1)).alias("starts"),
        F.lit(0).cast("long").alias("ns"),
        F.lit(0).cast("long").alias("tok"))
    # sequence(1, 0) would DESCEND in Spark, indexing past the array —
    # guard even though empty-_s rows are filtered above: local-relation
    # constant folding can evaluate this projection on pre-filter rows
    idx = F.when(F.size("_s") > 0,
                 F.sequence(F.lit(1), F.size("_s"))) \
        .otherwise(F.expr("cast(array() as array<int>)"))
    folded = staged.select(
        id_col, "_s", "_l",
        F.aggregate(idx, init, step,
                    lambda acc: a(acc, "starts")).alias("_b"))
    # chunk i spans sentences _b[i] .. (_b[i+1]-1 | size(_s))
    spans = folded.select(
        id_col, "_s", "_l",
        F.arrays_zip(
            F.col("_b").alias("b"),
            F.transform(
                F.sequence(F.lit(1), F.size("_b")),
                lambda j: F.when(j < F.size("_b"),
                                 F.element_at("_b", j + 1) - 1)
                .otherwise(F.size("_s"))).alias("e")).alias("_z"))
    # posexplode_OUTER on purpose (the extract_arrow discipline): plain
    # posexplode makes InferFiltersFromGenerate add size(_z)>0/notnull
    # filters on the generator INPUT, and predicate pushdown re-inlines
    # the whole staging+fold chain into them (measured ~30x). outer
    # infers nothing; the notnull below sits on the generated attribute
    # and cannot be pushed past its own Generate.
    ex = spans.select(
        id_col, "_s", "_l",
        F.posexplode_outer("_z").alias("chunk_idx", "z")) \
        .where(F.col("z").isNotNull())
    ln = F.col("z.e") - F.col("z.b") + 1
    return ex.select(
        F.col(id_col), F.col("chunk_idx").cast("long").alias("chunk_idx"),
        ln.cast("long").alias("n_sents"),
        F.aggregate(F.slice("_l", F.col("z.b"), ln),
                    F.lit(0).cast("long"), lambda acc, x: acc + x)
        .alias("n_tok"),
        F.array_join(F.slice("_s", F.col("z.b"), ln), " ")
        .alias("chunk_text"))


def sentence_burstiness(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Sentence-length burstiness: mean absolute deviation of a
    document's sentence char-lengths — the classic machine-text
    heuristic (human prose alternates long and short sentences;
    template and LLM-generated text runs flat). One row per doc:
    ``(id, n_sentences, mean_len_e3, mad_e3)`` in e3 fixed point;
    NULL stats for sentence-less docs.

    Exact integer without a float mean: ``mad = Σ|l_i·n − S| div n²``
    over the common denominator (l·n ≤ chars·sentences — decimal-safe
    far past any document). Row-local: split, length transform, and
    the fold all inside codegen, zero shuffles.
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        sentences_expr(F.col(text_col)).alias("_s"))
    staged = staged.select(
        "id", F.expr("transform(_s, s -> length(s))").alias("_l"))
    staged = staged.select(
        "id", "_l", F.size("_l").cast("long").alias("n_sentences"),
        F.expr("aggregate(_l, 0L, (a, x) -> a + x)").alias("_sum"))
    return staged.select(
        "id", "n_sentences",
        F.when(F.col("n_sentences") > 0,
               F.expr("_sum * 1000 div n_sentences")).cast("long")
        .alias("mean_len_e3"),
        F.when(F.col("n_sentences") > 0, F.expr(
            "aggregate(_l, 0L, (a, x) ->"
            " a + abs(x * n_sentences - _sum)) * 1000"
            " div (n_sentences * n_sentences)")).cast("long")
        .alias("mad_e3"))
