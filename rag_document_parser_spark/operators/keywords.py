"""Corpus keyword operators: TF-IDF keyword extraction and vocabulary
coverage.

Standard corpus-analysis passes a training-data pipeline runs before
tokenizer/vocab decisions. The reference has no corpus tier at all (it
processes documents one file at a time, /root/reference/main.py:72-147);
these are scale-path additions in the spirit of SURVEY §6's LLM-data
operators, built entirely from pure Catalyst expressions (no UDFs).

Scale shape:

- ``tfidf_keywords``'s one dangerous shuffle is the per-(doc,term) TF
  frame joining document frequency on the (Zipf-skewed) term key: a
  stopword's TF rows — one per containing document — would all land in
  one task. The join is therefore SPLIT: terms with ``df >= n_docs /
  hot_denom`` are broadcast (provably bounded: each hot term owns
  > n_docs/hot_denom of the Σ|doc vocab| pairs, so there are at most
  ``hot_denom × avg-doc-vocab`` of them — a few thousand rows at any
  corpus size), and the cold tail shuffles with every key bounded
  below n_docs/hot_denom rows. No task ever sees a stopword's full
  posting list.
- The per-doc top-k rank is a window PARTITIONED BY doc_id: each
  window group is one document's distinct terms — bounded by document
  length, never by corpus size.
- ``vocab_coverage``'s global top-N uses ``orderBy().limit(n)``, which
  Spark plans as TakeOrderedAndProject — a per-partition top-N plus a
  driver merge of N×partitions rows, never a global sort of the
  vocabulary. The cumulative-coverage window then runs over N rows.

Integer-exact scoring: the idf leg is kept LINEAR (score ∝ tf·(N/df),
the classic tf-idf with raw idf rather than log-idf) so the score is a
pure BIGINT expression — ``tf * n_docs * 1e6 div (df * doc_len)`` —
reproducible bit-for-bit in the DuckDB oracle. Log-idf reranks only
across different df values, where linear idf is strictly monotone in
the same direction, so per-doc orderings agree except for exact ties,
which both variants must tie-break lexically anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from rag_document_parser_spark.operators.dedup import words

__all__ = ["pmi_bigrams", "tfidf_keywords", "vocab_coverage"]


def _tf_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, n_toks, tf): per-document term frequencies with the
    tokenizer staged as a bound attribute (the repo's SPARK-36718
    discipline — split once per row, not once per referencing expr)."""
    toks = df.select(F.col(id_col).alias("id"),
                     words(F.col(text_col)).alias("_t"))
    flat = (toks.select("id", F.size("_t").alias("n_toks"),
                        F.explode_outer("_t").alias("term"))
            .where(F.col("term").isNotNull()))
    return (flat.groupBy("id", "term")
            .agg(F.max("n_toks").alias("n_toks"),
                 F.count("*").alias("tf")))


def tfidf_keywords(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", top_k: int = 5,
                   min_df: int = 1, hot_denom: int = 100,
                   materialize: bool = False) -> DataFrame:
    """Top-``top_k`` TF-IDF keywords per document.

    Returns ``(doc_id, term, tf, df_t, score_e6, krank)`` where
    ``score_e6 = tf * n_docs * 10^6 div (df_t * doc_tokens)`` — raw-idf
    TF-IDF as an exact BIGINT — and ``krank`` ranks a doc's terms by
    ``(score_e6 DESC, term ASC)``. Terms with corpus document frequency
    below ``min_df`` are dropped before ranking.

    The df join is split hot/cold on ``df_t >= n_docs / hot_denom``:
    hot terms broadcast (≤ hot_denom × avg-doc-vocab rows by a counting
    argument, see module docstring), cold terms shuffle with per-key
    cardinality bounded by n_docs/hot_denom — a stopword never funnels
    its whole posting list through one task.

    The TF frame fans out to three consumers (document frequency plus
    the hot and cold join legs); ``materialize=True`` localCheckpoints
    it so the tokenize+aggregate pass runs once instead of three times
    (on a real cluster substitute ``persist(DISK_ONLY)``). Left off by
    default to keep the plan action-free for composition.
    """
    tf = _tf_df(df, text_col, id_col)
    if materialize:
        tf = tf.localCheckpoint()
    # n_docs counts ALL input docs (empty ones included) — the idf
    # denominator is corpus size, not "docs with at least one token"
    total = df.select(F.col(id_col)).agg(F.count("*").alias("n_docs"))
    docfreq = (tf.groupBy("term").agg(F.count("*").alias("df_t"))
               .where(F.col("df_t") >= min_df)
               .crossJoin(F.broadcast(total)))
    hot = F.col("df_t") * hot_denom >= F.col("n_docs")
    joined = tf.join(F.broadcast(docfreq.where(hot)), "term").unionByName(
        tf.join(docfreq.where(~hot), "term"))
    # numerator widened to decimal(38,0) so tf*n_docs*1e6 has headroom
    # to ~1e38 (BIGINT caps at ~9.2e18 — a stopword at 10^12 docs blows
    # that). Exact integer division is width-independent: every value
    # (and oracle hash) is unchanged at any scale that fit before. The
    # final score <= n_docs*1e6 still fits BIGINT up to 9.2e12 docs.
    score = F.expr(
        "cast(tf as decimal(38,0)) * n_docs * 1000000"
        " div (cast(df_t as decimal(38,0)) * n_toks)")
    scored = joined.select(
        F.col("id").alias(id_col), "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df_t").cast("long").alias("df_t"),
        score.cast("long").alias("score_e6"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_e6").desc(), F.col("term").asc())
    return (scored.withColumn("krank", F.row_number().over(w).cast("long"))
            .where(F.col("krank") <= top_k))


def vocab_coverage(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", top_n: int = 100) -> DataFrame:
    """Top-``top_n`` corpus unigrams with cumulative token coverage.

    Returns ``(vrank, term, cnt, cum_ppm)``: the n most frequent tokens
    (ties broken lexically), each with its count and the cumulative
    share of ALL corpus tokens covered by ranks 1..vrank, in parts per
    million (``cum_ppm = running_sum * 10^6 div total_tokens``) — the
    curve a tokenizer/vocab-size decision reads.

    One map-side-combinable groupBy on the term, a TakeOrdered top-N
    (never a global sort), then windows over the N-row result only.
    """
    toks = df.select(words(F.col(text_col)).alias("_t"))
    flat = (toks.select(F.explode_outer("_t").alias("term"))
            .where(F.col("term").isNotNull()))
    counts = flat.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = (counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
           .limit(top_n).crossJoin(F.broadcast(total)))
    order = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    running = order.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)
    return top.select(
        F.row_number().over(order).cast("long").alias("vrank"),
        "term", F.col("cnt").cast("long").alias("cnt"),
        # decimal(38,0) running sum: headroom past 9.2e12 total tokens
        # (same exact values below it); cum_ppm <= 1e6 fits BIGINT
        (F.sum("cnt").over(running).cast("decimal(38,0)") * 1000000)
        .alias("_cum"),
        "total",
    ).select("vrank", "term", "cnt",
             F.expr("_cum div total").cast("long").alias("cum_ppm"))


def pmi_bigrams(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_count: int = 5,
                top_n: int = 50) -> DataFrame:
    """Top-``top_n`` bigram collocations by PMI — the phrase-mining pass
    behind tokenizer merge rules and stop-phrase lists.

    Returns ``(w1, w2, c_ab, c_a, c_b, score_e6, prank)`` for the
    strongest ``top_n`` adjacent word pairs with corpus count
    ``c_ab >= min_count``, ranked by ``(score_e6 DESC, w1, w2)``.

    Scoring: PMI = log(p(ab) / (p(a)p(b))) ranks identically to the
    log-free ratio ``c_ab·N_u / (c_a·c_b)`` (N_u, N_b are corpus
    constants, log is monotone), so the score is that ratio —
    ``score_e6 = floor(c_ab · 10⁶ · n_uni / (c_a · c_b))`` — computed in
    DOUBLE with the identical multiply/divide order in Spark and the
    DuckDB oracle. Every intermediate is an integer exactly
    representable in a double up to 2^53 (beyond that, last-ulp
    reordering can only perturb exact near-ties, which the lexical
    tie-break already owns).

    Scale shape: unigram and bigram counts are map-side-combinable
    groupBys (bigrams via the staged 2-shingle tokenizer). The unigram
    join back to bigram TYPES is skew-mild by construction: the left
    side is already aggregated, so a stopword's join key carries one
    row per distinct bigram TYPE containing it (vocabulary-bounded),
    not one per corpus occurrence. The final rank is a TakeOrdered
    top-N, never a global sort.
    """
    from rag_document_parser_spark.operators.dedup import shingle_df

    toks = df.select(words(F.col(text_col)).alias("_t"))
    uni = (toks.select(F.explode_outer("_t").alias("term"))
           .where(F.col("term").isNotNull())
           .groupBy("term").agg(F.count("*").alias("c")))
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    big = (shingle_df(df, text_col, id_col, 2, distinct=False,
                      drop_empty=True)
           .select(F.explode_outer("shingles").alias("bg"))
           .where(F.col("bg").isNotNull())
           .groupBy("bg").agg(F.count("*").alias("c_ab"))
           .where(F.col("c_ab") >= min_count))
    parts = big.select(
        "c_ab", F.split("bg", " ").alias("_p")).select(
        "c_ab", F.element_at("_p", 1).alias("w1"),
        F.element_at("_p", 2).alias("w2"))
    j = (parts
         .join(uni.withColumnsRenamed({"term": "w1", "c": "c_a"}), "w1")
         .join(uni.withColumnsRenamed({"term": "w2", "c": "c_b"}), "w2")
         .crossJoin(F.broadcast(n_uni)))
    score = F.floor(
        (F.col("c_ab").cast("double") * 1000000 * F.col("n_uni"))
        / (F.col("c_a").cast("double") * F.col("c_b"))).cast("long")
    scored = j.select("w1", "w2", F.col("c_ab").cast("long").alias("c_ab"),
                      F.col("c_a").cast("long").alias("c_a"),
                      F.col("c_b").cast("long").alias("c_b"),
                      score.alias("score_e6"))
    top = scored.orderBy(F.col("score_e6").desc(), "w1", "w2").limit(top_n)
    order = Window.orderBy(F.col("score_e6").desc(), "w1", "w2")
    return top.withColumn("prank",
                          F.row_number().over(order).cast("long"))
