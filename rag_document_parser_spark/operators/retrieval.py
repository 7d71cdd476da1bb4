"""Lexical retrieval over the extracted corpus: inverted index + BM25
top-k.

The reference is a RAG *ingestion* engine (parse → clean text →
downstream retrieval); it stops at the cleaned text
(`/root/reference/main.py:72-147` writes JSON results and leaves
retrieval to the RAG stack). This module supplies the retrieval leg a
user of that stack needs at corpus scale: build the postings relation
once, score ad-hoc query strings against it with BM25, all in pure
Catalyst (no UDFs anywhere).

Scoring is the Robertson/Okapi BM25 shape with two exactness-driven
substitutions, both established repo conventions:

- **raw-ratio idf, not log-idf** (the ``keywords.tfidf_keywords``
  precedent): ``idf_e3 = 1000·(N - df + ½) / (df + ½)`` computed as the
  exact integer ``(1000·(2N - 2df + 1)) div (2df + 1)``. Per-term it is
  strictly monotone in df exactly like ``ln`` of the same ratio, so
  single-term rankings are identical; multi-term sums weight rare terms
  more heavily than the log form (documented divergence — ``ln`` is not
  bit-reproducible across Spark's JVM libm and DuckDB's, and this
  repo's oracle gate hashes every value).
- **fixed-point integer arithmetic throughout** (floor division at
  every step, never a float): with k1 = 1.2 and b = 0.75,

      sat = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

  becomes ``sat_e3 = (22_000_000·tf) div (10_000·tf + 3_000 +
  9·ndl_e3)`` where ``ndl_e3 = (1_000_000·dl) div avgdl_e3`` and
  ``avgdl_e3 = (1_000·Σdl) div N`` — every quantity an exact BIGINT
  (intermediates widened to decimal(38,0) for headroom, the
  ``keywords`` discipline). ``score_e6 = Σ_t idf_e3·sat_e3``.

Numeric bounds (documented, not silent): ``idf_e3 ≤ 2_000·N`` (df = 1),
``sat_e3 < 2_200``, so a q-term query's score stays under BIGINT's
9.2e18 while ``N·q_terms < 2.1e12`` — beyond that, widen the final sum
to decimal(38,0) (values below the bound are unchanged).

Scale shape:

- The corpus-sized postings relation is pruned by a **broadcast
  semi-style join against the query-term set first** — document
  frequency, length stats, and scoring all run on the matched subset
  only. df computed on the pruned postings equals corpus df exactly
  (pruning keeps *every* posting of a retained term).
- df/N/avgdl ride 1-row or vocabulary-of-the-query-sized broadcasts;
  the per-query top-k is ``similarity.topk_per_query``'s two-stage
  partial rank — no task ever sorts more than its partition's share,
  even for a stopword query matching the whole corpus.
- ``inverted_index`` is one map-side-combinable groupBy on
  (term, doc) — the build is a single shuffle keyed by the uniform
  (term, doc_id) pair, never by the Zipf-skewed term alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_document_parser_spark.operators.dedup import words
from rag_document_parser_spark.operators.similarity import topk_per_query

__all__ = ["bm25_topk", "inverted_index", "more_like_this",
           "phrase_match", "phrase_topk", "positional_index", "rrf_fuse"]


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Postings relation ``(term, doc_id, tf, dl)``: term frequency of
    every (term, document) pair plus the document's token length.

    One projection (tokenizer staged as a bound attribute once —
    SPARK-36718) and one groupBy keyed by the UNIFORM (term, doc) pair:
    a stopword's postings spread across as many tasks as documents
    containing it, so the build has no skewed key. Write this out
    bucketed by term to serve point lookups; feed it to ``bm25_topk``
    via ``postings=`` to amortize the build across query batches.
    """
    toks = df.select(F.col(id_col).alias("doc_id"),
                     words(F.col(text_col)).alias("_t"))
    flat = (toks.select("doc_id", F.size("_t").cast("long").alias("dl"),
                        F.explode_outer("_t").alias("term"))
            .where(F.col("term").isNotNull()))
    return (flat.groupBy("term", "doc_id")
            .agg(F.max("dl").alias("dl"), F.count("*").alias("tf"))
            .select("term", "doc_id", F.col("tf").cast("long").alias("tf"),
                    "dl"))


def bm25_topk(df: DataFrame, queries: DataFrame, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              qid_col: str = "query_id", qtext_col: str = "text",
              postings: DataFrame | None = None,
              exclude_self: bool = False) -> DataFrame:
    """Top-``k`` documents per query by fixed-point log-free BM25.

    ``exclude_self=True`` drops rows where ``doc_id == query_id`` before
    ranking (the more-like-this contract, where queries ARE documents).

    ``queries`` is ``(query_id, text)``; its DISTINCT tokens per query
    are the match terms (classic BM25's optional query-side saturation
    k3 is omitted — ad-hoc queries are short). Returns ``(query_id,
    doc_id, n_terms, score_e6, rank)`` with rank 1..k per query, ties
    broken by ascending doc_id; ``n_terms`` counts how many of the
    query's terms the document matched.

    Corpus statistics (N, Σdl) count ALL input documents, matched or
    not — BM25's priors are corpus-level. Degenerate inputs are
    structural no-ops: an empty corpus yields no matches (the
    ``greatest(N, 1)`` guard keeps avgdl's divisor nonzero in both
    engines rather than tripping DuckDB's ``// 0`` error on a row that
    Spark would never evaluate).
    """
    post = postings if postings is not None else inverted_index(
        df, text_col, id_col)
    qtoks = queries.select(F.col(qid_col).alias("query_id"),
                           words(F.col(qtext_col)).alias("_qt"))
    qterms = (qtoks.select("query_id", F.explode_outer("_qt").alias("term"))
              .where(F.col("term").isNotNull()).distinct())

    # prune the corpus-sized postings to query terms BEFORE any stats
    # join; df over the pruned set == corpus df (all postings of a
    # retained term survive the prune)
    matched = post.join(F.broadcast(qterms), "term")
    stats = df.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.size(words(F.col(text_col)))), F.lit(0))
        .cast("long").alias("total_toks"))
    dfreq = (matched.select("term", "doc_id").distinct()
             .groupBy("term").agg(F.count("*").alias("df_t")))

    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    scored = (matched
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("avgdl_e3", F.expr(
                  "cast(total_toks as decimal(38,0)) * 1000"
                  " div greatest(n_docs, 1)"))
              .withColumn("ndl_e3", F.expr(
                  "cast(dl as decimal(38,0)) * 1000000"
                  " div greatest(avgdl_e3, 1)"))
              .withColumn("idf_e3", F.expr(
                  "(cast(n_docs as decimal(38,0)) * 2 - df_t * 2 + 1)"
                  " * 1000 div (cast(df_t as decimal(38,0)) * 2 + 1)"))
              .withColumn("sat_e3", F.expr(
                  "cast(tf as decimal(38,0)) * 22000000"
                  " div (cast(tf as decimal(38,0)) * 10000 + 3000"
                  " + ndl_e3 * 9)"))
              .select("query_id", "doc_id",
                      (big("idf_e3") * big("sat_e3"))
                      .cast("long").alias("_ts")))
    agg = (scored.groupBy("query_id", "doc_id")
           .agg(F.count("*").cast("long").alias("n_terms"),
                F.sum("_ts").cast("long").alias("score_e6")))
    if exclude_self:
        # more-like-this mode: query ids live in the document id domain;
        # drop the seed's self-match BEFORE ranking so k real neighbors
        # survive
        agg = agg.where(F.col("doc_id") != F.col("query_id"))
    return topk_per_query(agg, k, "query_id", "doc_id", "score_e6").select(
        "query_id", "doc_id", "n_terms", "score_e6",
        F.col("rank").cast("long").alias("rank"))


def more_like_this(df: DataFrame, seed_ids: DataFrame, k: int = 10,
                   n_terms: int = 10, text_col: str = "text",
                   id_col: str = "doc_id",
                   postings: DataFrame | None = None) -> DataFrame:
    """Lucene-style more-like-this: for each seed document, extract its
    ``n_terms`` most characteristic terms (tf · linear idf, the
    ``bm25_topk`` idf form; ties broken by ascending term) and retrieve
    the ``k`` nearest documents by BM25 over exactly those terms, the
    seed itself excluded. ``seed_ids`` is a one-column relation of
    document ids (tiny — it broadcasts). Returns the ``bm25_topk``
    shape: ``(query_id, doc_id, n_terms, score_e6, rank)``.

    Term selection and retrieval share ONE postings build (pass
    ``postings=`` to amortize it further across calls). Scale shape:
    seed postings come from a broadcast semi-join on the seed-id set;
    document frequency is computed only for the seeds' candidate terms
    (pruned postings, corpus-exact df — the ``bm25_topk`` argument);
    the per-seed term top-k is the two-stage partial rank. The
    retrieval leg is ``bm25_topk`` verbatim with ``exclude_self``.
    """
    post = postings if postings is not None else inverted_index(
        df, text_col, id_col)
    seeds = seed_ids.select(F.col(seed_ids.columns[0]).alias("query_id"))
    sp = post.join(F.broadcast(seeds),
                   post["doc_id"] == seeds["query_id"]).select(
        "query_id", "term", "tf")
    dfreq = (post.join(F.broadcast(sp.select("term").distinct()), "term")
             .select("term", "doc_id").distinct()
             .groupBy("term").agg(F.count("*").alias("df_t")))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    tsc = (sp.join(F.broadcast(dfreq), "term")
           .crossJoin(F.broadcast(n_docs))
           .select("query_id", "term", F.expr(
               "cast(tf as decimal(38,0))"
               " * ((cast(n_docs as decimal(38,0)) * 2 - df_t * 2 + 1)"
               "    * 1000 div (cast(df_t as decimal(38,0)) * 2 + 1))")
               .cast("long").alias("_s")))
    top = topk_per_query(tsc, n_terms, "query_id", "term", "_s")
    queries = (top.groupBy("query_id")
               .agg(F.array_join(F.array_sort(F.collect_list("term")), " ")
                    .alias("text")))
    return bm25_topk(df, queries, k, text_col, id_col,
                     postings=post, exclude_self=True)


def rrf_fuse(ranked: list[DataFrame], k: int = 10, k0: int = 60,
             qid_col: str = "query_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of any number of per-query rank lists — the standard way a RAG
    stack combines this module's lexical BM25 leg with the similarity
    module's dense cosine/IVF leg into one hybrid top-k.

    Each list contributes ``1/(k0 + rank)`` per (query, doc); docs
    missing from a list simply contribute nothing (the paper's
    convention). Scored in fixed point — ``1_000_000 div (k0 + rank)``
    summed as BIGINT — so the DuckDB oracle replays every value
    exactly; with the classic k0 = 60 the contribution stays distinct
    per rank for all ranks a retrieval list realistically carries, and
    the sum cannot overflow before ~5.6e14 fused lists. Returns
    ``(query_id, doc_id, n_lists, rrf_e6, rank)``, rank 1..k per query,
    ties broken by ascending doc_id.

    Scale shape: one union (no shuffle — unions concatenate), one
    groupBy keyed by the uniform (query, doc) pair with map-side
    partial aggregation, then ``topk_per_query``'s two-stage partial
    rank. The fused relation is at most Σ|list| rows — top-k output
    sized, never corpus sized.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    legs = [r.select(F.col(qid_col).alias("query_id"),
                     F.col(id_col).alias("doc_id"),
                     F.col(rank_col).cast("long").alias("_r"))
            for r in ranked]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    scored = (u.groupBy("query_id", "doc_id")
              .agg(F.count("*").cast("long").alias("n_lists"),
                   F.sum(F.expr(f"1000000 div ({int(k0)} + _r)"))
                   .cast("long").alias("rrf_e6")))
    return topk_per_query(scored, k, "query_id", "doc_id", "rrf_e6").select(
        "query_id", "doc_id", "n_lists", "rrf_e6",
        F.col("rank").cast("long").alias("rank"))


def positional_index(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Positional postings ``(term, doc_id, pos)`` — one row per token
    OCCURRENCE with its 0-based position, the relation phrase and
    proximity queries need (``inverted_index`` keeps only frequencies).

    Scale shape: one staged-tokenizer scan, one ``posexplode`` inside
    the scan's codegen span — no shuffle at all until a consumer keys
    it. Roughly ``total_tokens`` rows, the same order of magnitude as
    the frequency index at web scale (most (term, doc) pairs have
    tf = 1).
    """
    staged = df.select(F.col(id_col).alias("doc_id"),
                       words(F.col(text_col)).alias("_t"))
    return (staged.select(
                "doc_id",
                F.posexplode_outer("_t").alias("pos", "term"))
            .where(F.col("term").isNotNull())
            .select("term", "doc_id", F.col("pos").cast("long").alias("pos")))


def phrase_match(df: DataFrame, queries: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 qid_col: str = "query_id",
                 phrase_col: str = "text") -> DataFrame:
    """Exact-phrase occurrence counts: ``(query_id, doc_id, n_matches)``
    with one row per (query, doc) whose token stream contains the
    query's tokens CONSECUTIVELY, ``n_matches`` = number of distinct
    start positions. Both sides run through the engine tokenizer, so
    a phrase matches across any punctuation/case variation the
    tokenizer normalizes — the semantics of a quoted query in a search
    box.

    The classic positional-index algorithm (Manning, Raghavan & Schütze,
    IIR §2.4.2) as relational algebra: explode the phrase to
    ``(idx, term)``, join the positional postings on term, and group by
    the implied start ``anchor = pos − idx`` — an anchor holding all
    ``m`` phrase positions is one occurrence. Repeated phrase terms are
    handled for free: for a fixed (doc, anchor, idx) at most one
    posting matches (pos = anchor + idx), so ``count(*) = m`` iff every
    slot matched.

    Scale shape: the query relation is tiny and rides two broadcasts
    (terms, lengths); the corpus-sized postings never shuffle on the
    Zipf-skewed term key — the term join is broadcast, and the only
    exchange keys on (query, doc, anchor), bounded by occurrences of
    query terms and uniform in doc_id. A stopword-only phrase degrades
    to corpus-sized hit lists (same caveat as any positional engine);
    AQE splits the straggling query if one dominates. Empty phrases
    (zero tokens after tokenization) match nothing and are absent from
    the output, documented over hidden.
    """
    qt = queries.select(F.col(qid_col).alias("query_id"),
                        words(F.col(phrase_col)).alias("_qw"))
    qterms = (qt.select("query_id",
                        F.posexplode_outer("_qw").alias("idx", "term"))
              .where(F.col("term").isNotNull()))
    qlen = qt.select("query_id", F.size("_qw").cast("long").alias("_m"))
    hits = (positional_index(df, text_col, id_col)
            .join(F.broadcast(qterms), "term")
            .select("query_id", "doc_id",
                    (F.col("pos") - F.col("idx")).alias("_anchor")))
    occ = (hits.groupBy("query_id", "doc_id", "_anchor")
           .agg(F.count("*").cast("long").alias("_c")))
    full = (occ.join(F.broadcast(qlen), "query_id")
            .where(F.col("_c") == F.col("_m")))
    return (full.groupBy("query_id", "doc_id")
            .agg(F.count("*").cast("long").alias("n_matches")))


def phrase_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                text_col: str = "text", id_col: str = "doc_id",
                qid_col: str = "query_id",
                phrase_col: str = "text") -> DataFrame:
    """Top-``k`` documents per phrase query by occurrence count
    (``phrase_match``), ties broken by ascending doc_id — the ranked
    face a hybrid stack fuses with BM25/dense legs via ``rrf_fuse``.
    Two-stage partial rank via ``topk_per_query``: no task sorts more
    than its partition's share of one query's matches.
    """
    m = phrase_match(df, queries, text_col, id_col, qid_col, phrase_col)
    return topk_per_query(m, k, "query_id", "doc_id", "n_matches").select(
        "query_id", "doc_id", "n_matches",
        F.col("rank").cast("long").alias("rank"))


def mine_contrastive_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           pos_lo_e6: int = 500_000,
                           neg_hi_e6: int = 200_000,
                           df_cap: int = 1000) -> DataFrame:
    """Mine (anchor, positive, hard-negative) training triples.

    Embedding/reranker training wants, per anchor document, a positive
    (same content, different surface — a near-dup) and a HARD negative
    (superficially overlapping yet different content — the pairs a
    lexical model confuses). Both come from the same shingle-sharing
    candidate table: pairs with fixed-point Jaccard ``>= pos_lo_e6``
    are positives; pairs sharing at least one (rare) shingle but with
    Jaccard ``< neg_hi_e6`` are hard negatives — they beat random
    negatives exactly because they DO overlap. Per anchor keep the
    best positive (max Jaccard, min-id tiebreak) and the hardest
    negative (max Jaccard below the ceiling, min-id tiebreak); emit
    only anchors having both: ``(anchor, pos_id, neg_id, pos_jac_e6,
    neg_jac_e6)``.

    Selection uses an ENCODED argmax — ``jac_e6 * 1e8 + (1e8 − 1 −
    other)`` maximized then decoded — a plain map-side-combinable MAX,
    no window, identical integer op order in any engine. Precondition:
    ids in ``[0, 1e8 − 1]`` (the tiebreak term must stay < 1e8, else
    it would carry into the Jaccard digits; the −1 keeps id 0 legal).

    At 100 TB: cost is bounded by the candidate table of
    ``ngram_jaccard_pairs`` (df_cap caps per-shingle fan-out, the
    stop-shingle blacklist is broadcast); everything after is two
    aggregates on the uniform anchor key and one join. Lowering
    ``df_cap`` trades negative-candidate recall for cost.
    """
    from rag_document_parser_spark.operators.dedup import (
        ngram_jaccard_pairs)

    pairs = ngram_jaccard_pairs(df, text_col, id_col, n,
                                threshold=0.0, df_cap=df_cap)
    scored = pairs.select(
        "id_a", "id_b",
        F.expr("inter * 1000000 div (n_a + n_b - inter)")
        .cast("long").alias("jac_e6"))
    both = scored.select(F.col("id_a").alias("anchor"),
                         F.col("id_b").alias("other"), "jac_e6") \
        .unionByName(scored.select(F.col("id_b").alias("anchor"),
                                   F.col("id_a").alias("other"), "jac_e6"))
    enc = (F.col("jac_e6") * F.lit(100_000_000)
           + (F.lit(99_999_999) - F.col("other")))

    def pick(sub: DataFrame, pfx: str) -> DataFrame:
        top = sub.groupBy("anchor").agg(F.max(enc).alias("_k"))
        return top.select(
            "anchor",
            (F.lit(99_999_999) - F.col("_k") % 100_000_000)
            .cast("long").alias(f"{pfx}_id"),
            F.expr("_k div 100000000").cast("long")
            .alias(f"{pfx}_jac_e6"))

    pos = pick(both.where(F.col("jac_e6") >= pos_lo_e6), "pos")
    neg = pick(both.where(F.col("jac_e6") < neg_hi_e6), "neg")
    return (pos.join(neg, "anchor")
            .select("anchor", "pos_id", "neg_id",
                    "pos_jac_e6", "neg_jac_e6"))
