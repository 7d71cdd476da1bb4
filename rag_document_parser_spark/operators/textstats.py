"""Text-analysis operators for training-data pipelines.

All pure Catalyst (JVM, codegen) — no UDFs anywhere:

- ``language_id``      — n-gram/stopword-heuristic language ID extending
                         the reference's arabic/latin 2x classifier
                         (/root/reference/example_usage_reporting.py:427-435)
                         with stopword evidence for en/de/fr/es.
- ``quality_score``    — length / punctuation-ratio / stopword-ratio /
                         mean-word-length features plus a composite score;
                         the web-scale "keep or drop" gate.
- ``token_count``      — whitespace tokens and a BPE-ish subword estimate
                         (regex segmentation into letter-runs, digit-runs,
                         punctuation), both as counts.
- ``fingerprint``      — winnowing-style document fingerprint: the min-K
                         md5s over word 5-gram shingles; equal fingerprints
                         ⇒ near-identical prefix content. Deterministic,
                         SQL-replicable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from rag_document_parser_spark.functions.text import (
    arabic_char_count,
    latin_char_count,
)
from rag_document_parser_spark.operators.dedup import shingle_df, words

STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "para", "una", "con", "por"],
}


def _stopword_hits(c: Column, lang: str) -> Column:
    toks = words(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def _lang_project(df: DataFrame, text_col: str,
                  keep: list[str]) -> DataFrame:
    """Shared evidence projection behind doc- and paragraph-level
    language ID: appends ``(lang_id, arabic_chars, latin_chars)`` to the
    ``keep`` columns. Staged: tokens and per-language hit counts are
    materialized as bound attributes before the CASE chain references
    them repeatedly — the tie-break logic mentions each count ~3x,
    which would otherwise re-tokenize per mention."""
    c = F.col(text_col)
    keep_cols = [F.col(k) for k in keep]
    toks = df.select(
        *keep_cols, words(c).alias("w"),
        arabic_char_count(c).alias("a"), latin_char_count(c).alias("l"))
    hit_cols = {}
    for lang in STOPWORDS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hit_cols[lang] = F.size(
            F.filter("w", lambda t: F.array_contains(sw, t))).alias(f"h_{lang}")
    hits = toks.select(*keep_cols, "a", "l", *hit_cols.values())
    best_latin = F.greatest(*[F.col(f"h_{la}") for la in STOPWORDS])
    lang_pick = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        lang_pick = F.when(F.col(f"h_{lang}") == best_latin,
                           F.lit(lang)).otherwise(lang_pick)
    a, l = F.col("a"), F.col("l")
    return hits.select(
        *keep_cols,
        F.when(a > 2 * l, F.lit("ar"))
        .when((best_latin > 0) & (l > 0), lang_pick)
        .when(l > 0, F.lit("latin-und"))
        .otherwise(F.lit("und"))
        .alias("lang_id"),
        a.alias("arabic_chars"),
        l.alias("latin_chars"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: arabic script wins by char count; otherwise
    the latin language with the most stopword hits; 'und' (undetermined)
    when no evidence."""
    return _lang_project(df, text_col, [id_col])


def paragraph_language(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-PARAGRAPH language ID (the CCNet pipeline's granularity,
    Wenzek et al. 2020 §3 — web pages routinely mix languages, and a
    doc-level label either drops or mislabels the minority paragraphs).

    Paragraphs split on blank-line runs; empty/whitespace-only
    paragraphs emit nothing. One row per paragraph: ``(doc_id,
    para_idx, n_chars_para, lang_id, arabic_chars, latin_chars)`` with
    the same evidence rules as :func:`language_id`. Zero shuffles —
    split + posexplode + the evidence projection all run in the scan
    stage.
    """
    paras = (df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n{2,}"))
        .alias("para_idx", "_p"))
        .where(F.length(F.regexp_replace(F.col("_p"), "\\s", "")) > 0)
        .withColumn("n_chars_para", F.length("_p").cast("long"))
        .withColumn("para_idx", F.col("para_idx").cast("long")))
    return _lang_project(paras, "_p",
                         [id_col, "para_idx", "n_chars_para"])


def language_mixedness(paras: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Doc-level mixedness summary over :func:`paragraph_language`
    output: ``(doc_id, n_paras, dominant_lang, dominant_frac_e6)`` —
    the routing signal for keep-whole / split-by-language / drop
    decisions on mixed-language pages.

    Dominant = most paragraphs, ties to the lexically smallest lang.
    Scale: one map-side-combinable (doc, lang) aggregate, then a
    per-doc window over at most |languages| rows — bounded by the
    label set, never by corpus or doc size.
    """
    per = (paras.groupBy(F.col(id_col), F.col("lang_id"))
           .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("lang_id"))
    tot = Window.partitionBy(id_col)
    return (per.withColumn("n_paras", F.sum("cnt").over(tot))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col(id_col), F.col("n_paras").cast("long"),
                    F.col("lang_id").alias("dominant_lang"),
                    F.expr("cnt * 1000000 div n_paras")
                    .alias("dominant_frac_e6")))


def quality_exprs(c: Column) -> dict[str, Column]:
    """Raw (unrounded) quality feature columns — shared by the rounded
    report shape below and the scaled-integer oracle projection in
    ``__spark_entry__.py`` (floor(x*10⁴) of a raw double is reproducible
    bitwise in DuckDB; round() is not, as rounding modes differ)."""
    n_chars = F.length(c)
    toks = words(c)
    n_words = F.size(toks)
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(toks, F.lit(0).cast("long"),
                                   lambda acc, t: acc + F.length(t)) / n_words
                       ).otherwise(F.lit(0.0))
    alpha_space = F.length(F.regexp_replace(c, "[^A-Za-z؀-ۿ ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_space / n_chars).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n_words,
    ).otherwise(F.lit(0.0))

    # composite: reward readable alpha ratio and sane word lengths,
    # penalize punctuation soup; clamp to [0,1]
    score = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            alpha_ratio * 0.6
            + F.least(stop_ratio * 4, F.lit(0.2))
            + F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.2).otherwise(0.0)
            - F.when(punct_ratio > 0.1, punct_ratio).otherwise(0.0),
        ),
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score in [0,1].

    Heuristics follow the reference's "readable words" filter shape
    (/root/reference/parsers/document_parser.py:210-270: len>1, has alpha,
    alpha+space ratio > 0.5) generalized into graded features.
    """
    q = quality_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        q["n_chars"].alias("n_chars"),
        q["n_words"].alias("n_words"),
        F.round(q["mean_word_len"], 4).alias("mean_word_len"),
        F.round(q["alpha_ratio"], 4).alias("alpha_ratio"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        F.round(q["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(q["quality_score"], 4).alias("quality_score"),
    )


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate.

    Subword segmentation: split into maximal runs of letters, digits, or
    single punctuation (regex '[a-z]+|[0-9]+|[^a-z0-9\\s]' after lower),
    then assume ~1 token per 4 chars within long letter runs (the GPT-ish
    heuristic) — all in Catalyst arithmetic.
    """
    c = F.col(text_col)
    ws_tokens = F.size(words(c))
    lower = F.lower(c)
    letter_runs = F.filter(F.split(lower, "[^a-z؀-ۿ]+"), lambda t: t != "")
    digit_runs = F.filter(F.split(lower, "[^0-9]+"), lambda t: t != "")
    punct_chars = F.length(F.regexp_replace(lower, "[a-z0-9؀-ۿ \\t\\n\\r]", ""))
    subword = (
        F.aggregate(letter_runs, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.greatest(F.ceil(F.length(t) / 4), F.lit(1)))
        + F.size(digit_runs) + punct_chars
    )
    return df.select(
        F.col(id_col),
        ws_tokens.alias("ws_tokens"),
        subword.cast("long").alias("bpe_est_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                shingle_n: int = 5, keep_k: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the K smallest md5 hex digests over
    word n-gram shingles, concatenated. Deterministic and SQL-replicable
    (min over md5 strings is well-defined everywhere)."""
    sh = shingle_df(df, text_col, id_col, shingle_n)
    hashes = F.array_sort(F.transform("shingles", lambda s: F.md5(s)))
    fp = F.array_join(F.slice(hashes, 1, keep_k), "")
    return sh.select(
        F.col("id").alias(id_col),
        F.when(F.size("shingles") > 0, fp).alias("fingerprint"),
        F.size("shingles").alias("n_shingles"),
    )


def length_quantiles(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", group_col: str | None = "lang",
                     pcts: tuple[int, ...] = (25, 50, 75, 90)) -> DataFrame:
    """Exact per-group document-length quantiles via a COMPACTED
    distribution — the corpus-shape report a pipeline reads before
    setting length filters and packing budgets.

    Returns one row per group: ``(group, n_docs, min_len, max_len,
    p<P>...)`` where ``p<P>`` is the type-1 (lower) quantile — the
    smallest length whose cumulative count reaches ``ceil(P% · n)`` —
    so every output is an integer actually present in the data,
    reproducible exactly in the DuckDB oracle (no interpolation, no
    float arithmetic).

    Scale shape: lengths are first compacted to ``(group, len, cnt)``
    by a map-side-combinable groupBy — the frame downstream is bounded
    by #groups × #distinct lengths, not by corpus size. The cumulative
    window and the quantile picks then run over that compacted frame
    only; no corpus-wide sort or per-doc window anywhere. (The usual
    scale alternative, ``percentile_approx``, trades exactness for one
    pass; this operator keeps exactness AND boundedness by exploiting
    the small value domain of lengths.)

    ``group_col=None`` computes one corpus-wide row (group = 'all').
    """
    from pyspark.sql.window import Window

    g = (F.col(group_col) if group_col is not None
         else F.lit("all")).alias("grp")
    lens = df.select(g, F.length(F.col(text_col)).cast("long").alias("len"))
    compact = lens.groupBy("grp", "len").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("grp").orderBy("len") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = compact.select(
        "grp", "len", "cnt", F.sum("cnt").over(w).alias("cum"))
    tot = cum.groupBy("grp").agg(F.max("cum").alias("n_docs"),
                                 F.min("len").alias("min_len"),
                                 F.max("len").alias("max_len"))
    joined = cum.join(tot, "grp")
    # type-1 quantile: ceil(p*n/100) = (p*n + 99) div 100, all BIGINT
    picks = [
        F.min(F.when(
            F.col("cum") >= F.expr(f"({p} * n_docs + 99) div 100"),
            F.col("len"))).alias(f"p{p}")
        for p in pcts
    ]
    return (joined.groupBy("grp")
            .agg(F.max("n_docs").alias("n_docs"),
                 F.max("min_len").alias("min_len"),
                 F.max("max_len").alias("max_len"), *picks))


# Gopher quality-rule set (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A —
# the published document-level quality filters). Generalizes the
# reference's single readable-words gate
# (/root/reference/parsers/document_parser.py:210-270) into the
# standard web-corpus rule battery.
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that",
                             "have", "with"]
GOPHER_BULLET_CHARS = ("•", "‣", "▪", "-", "*")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc Gopher quality flags (Rae et al. 2021 §A1.1.2) + keep gate.

    The seven published rules, each as a 0/1 flag, all in INTEGER
    cross-multiplication form so the DuckDB oracle reproduces every flag
    bit-exactly (no float ratio is ever materialized):

    - ``word_count_ok``  50 <= n_words <= 100,000
    - ``mean_wlen_ok``   mean word length in [3, 10]   (3n <= Σlen <= 10n)
    - ``symbol_ok``      (hash + ellipsis) / words < 0.1  (10·sym < n)
    - ``bullet_ok``      <= 90% of lines start with a bullet char
    - ``ellipsis_ok``    <= 30% of lines end with ... or …
    - ``alpha_ok``       >= 80% of words contain an alphabetic char
    - ``stopword_ok``    >= 2 distinct required stopwords present

    ``keep`` is the conjunction. Documented deltas from the paper's
    prose: "words" are this package's shared tokenizer (lowercased
    alnum runs — so mean word length counts no punctuation), the bullet
    set is {•, ‣, ▪, -, *}, and alphabetic means latin or arabic script
    (the corpus languages).

    Scale shape: one narrow projection per doc — no shuffle, no UDF,
    whole-stage-codegen throughout; tokens and lines are staged as
    bound attributes once (SPARK-36718) and every rule reads the staged
    arrays.

    ``passthrough`` names extra input columns carried verbatim to the
    output (same projection, still zero-shuffle) — how ``plans.curate``
    threads route/title/verdict state through the gate without a join.
    """
    c = F.col(text_col)
    thru = [F.col(p) for p in passthrough]
    staged = df.select(
        F.col(id_col), *thru, c.alias("_t"), words(c).alias("_w"),
        F.split(c, "\n").alias("_ln"))
    t, w, ln = F.col("_t"), F.col("_w"), F.col("_ln")
    n_words = F.size(w).cast("long")
    sum_wlen = F.aggregate(w, F.lit(0).cast("long"),
                           lambda acc, x: acc + F.length(x))
    n_hash = (F.length(t) - F.length(F.translate(t, "#", ""))).cast("long")
    dots_gone = F.regexp_replace(t, r"\.\.\.", "")
    n_dots = ((F.length(t) - F.length(dots_gone)) / 3).cast("long")
    n_uell = (F.length(t) - F.length(F.translate(t, "…", ""))).cast("long")
    n_sym = n_hash + n_dots + n_uell
    n_lines = F.size(ln).cast("long")
    bullets = F.array(*[F.lit(b) for b in GOPHER_BULLET_CHARS])
    bullet_lines = F.size(F.filter(ln, lambda x: F.array_contains(
        bullets, F.substring(F.regexp_replace(x, r"^[ \t]+", ""), 1, 1)
    ))).cast("long")
    ell_lines = F.size(F.filter(ln, lambda x: F.regexp_replace(
        x, r"[ \t\r]+$", "").rlike(r"(\.\.\.|…)$"))).cast("long")
    alpha_words = F.size(F.filter(
        w, lambda x: x.rlike("[a-z؀-ۿ]"))).cast("long")
    sw = F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
    stop_hits = F.size(F.filter(
        sw, lambda s: F.array_contains(w, s))).cast("long")

    def flag(cond) -> Column:
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int")

    word_count_ok = flag((n_words >= 50) & (n_words <= 100000))
    mean_wlen_ok = flag((n_words > 0) & (sum_wlen >= 3 * n_words)
                        & (sum_wlen <= 10 * n_words))
    symbol_ok = flag((n_words > 0) & (10 * n_sym < n_words))
    bullet_ok = flag(10 * bullet_lines <= 9 * n_lines)
    ellipsis_ok = flag(10 * ell_lines <= 3 * n_lines)
    alpha_ok = flag((n_words > 0) & (5 * alpha_words >= 4 * n_words))
    stopword_ok = flag(stop_hits >= 2)
    out = staged.select(
        F.col(id_col), *thru, n_words.alias("n_words"),
        word_count_ok.alias("word_count_ok"),
        mean_wlen_ok.alias("mean_wlen_ok"),
        symbol_ok.alias("symbol_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"),
    )
    keep = (F.col("word_count_ok") * F.col("mean_wlen_ok")
            * F.col("symbol_ok") * F.col("bullet_ok")
            * F.col("ellipsis_ok") * F.col("alpha_ok")
            * F.col("stopword_ok")).cast("int")
    return out.withColumn("keep", keep)


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   passthrough: tuple[str, ...] = ()) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) — a text
    TRANSFORM, not just a gate: lines are dropped inside the document
    and the survivors are rejoined.

    Line rules (a line survives iff all hold):
    - ends with terminal punctuation after trailing-whitespace strip
      (the paper's set: period / ! / ? / closing double quote);
    - has >= 5 word tokens (shared tokenizer);
    - does not contain the word "javascript" (case-insensitive).

    Document rules (``keep``):
    - >= 3 sentences remain — sentence proxy: terminal-punct chars in
      the retained text (documented delta: the paper splits sentences
      with an NLP tokenizer; a mark count is the deterministic,
      engine-portable equivalent);
    - no ``{`` anywhere (code page signal);
    - no "lorem ipsum" (case-insensitive).

    ``clean_text`` is NULL for dropped docs. The naughty-word list
    (rule 3 of the paper) is deliberately out of subset. All pure
    Catalyst: one projection, zero shuffles, codegen end-to-end.

    ``passthrough`` names extra input columns carried verbatim to the
    output (see ``gopher_rules``).
    """
    c = F.col(text_col)
    thru = [F.col(p) for p in passthrough]

    def line_ok(x: Column) -> Column:
        stripped = F.regexp_replace(x, r"[ \t\r]+$", "")
        wc = F.size(F.filter(F.split(F.lower(x), "[^a-z0-9؀-ۿ]+"),
                             lambda w: w != ""))
        return (stripped.rlike(r'[.!?"]$') & (wc >= 5)
                & ~F.lower(x).rlike("javascript"))

    # stacked projections: each non-cheap array is a bound attribute
    # before anything references it twice (SPARK-36718)
    s1 = df.select(F.col(id_col), *thru, c.alias("_t"),
                   F.split(c, "\n").alias("_ln"))
    s2 = s1.select(F.col(id_col), *thru, F.col("_t"),
                   F.size("_ln").cast("long").alias("n_lines"),
                   F.filter("_ln", line_ok).alias("_k"))
    s3 = s2.select(F.col(id_col), *thru, F.col("_t"), F.col("n_lines"),
                   F.size("_k").cast("long").alias("kept_lines"),
                   F.array_join("_k", "\n").alias("_clean"))
    cleaned = F.col("_clean")
    sentences = (F.length(cleaned)
                 - F.length(F.translate(cleaned, ".!?", ""))).cast("long")
    s4 = s3.select(F.col(id_col), *thru, F.col("n_lines"),
                   F.col("kept_lines"),
                   sentences.alias("sentences"), F.col("_t"), cleaned)
    doc_ok = ((F.col("sentences") >= 3) & (F.instr(F.col("_t"), "{") == 0)
              & (F.instr(F.lower(F.col("_t")), "lorem ipsum") == 0))
    return s4.select(
        F.col(id_col), *thru, F.col("n_lines"), F.col("kept_lines"),
        F.col("sentences"),
        F.when(doc_ok, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("keep"),
        F.when(doc_ok, F.col("_clean")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# license / usage-rights signals
# ---------------------------------------------------------------------------

# (label, lowercase needle) — first match wins, ordered most-specific
# first so "creative commons ... all rights reserved" footers classify
# as CC. Needles are long multiword phrases on purpose: short tokens
# ("gpl", "mit") collide with ordinary prose and would mislabel at
# web scale.
LICENSE_MARKERS: tuple[tuple[str, str], ...] = (
    ("cc", "creative commons"),
    ("cc", "cc by-"),
    ("public-domain", "public domain"),
    ("mit", "mit license"),
    ("apache", "apache license"),
    ("gpl", "general public license"),
    ("all-rights-reserved", "all rights reserved"),
)


def license_exprs(lc: Column) -> dict[str, Column]:
    """The three rights signals as expressions over an ALREADY-LOWERCASED
    bound attribute (stage ``lower(text)`` as its own projection first —
    SPARK-36718) — the composition surface ``plans.curate`` uses to fold
    the gate into its quality projection without a join."""
    label = None
    for name, needle in LICENSE_MARKERS:
        cond = F.instr(lc, needle) > 0
        label = F.when(cond, F.lit(name)) if label is None \
            else label.when(cond, F.lit(name))
    label = label.otherwise(F.lit("none"))
    has_c = ((F.instr(lc, "copyright") > 0) | (F.instr(lc, "©") > 0))
    permissive = label.isin("cc", "public-domain", "mit", "apache")
    restricted = (((label != F.lit("none")) | has_c) & ~permissive)
    return {
        "license": label,
        "has_copyright":
            F.when(has_c, F.lit(1)).otherwise(F.lit(0)).cast("int"),
        "restricted":
            F.when(restricted, F.lit(1)).otherwise(F.lit(0)).cast("int"),
    }


def license_signals(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc usage-rights heuristics for training-data curation.

    Web-scale corpus recipes route documents by declared license
    (keep CC/public-domain, down-weight or drop all-rights-reserved) —
    e.g. the permissively-licensed-only corpora trained on Creative
    Commons crawls. This is the routing signal: a first-match scan of
    ``LICENSE_MARKERS`` over the lowercased text, plus an explicit
    copyright-line flag (the © symbol or the word "copyright").

    Returns ``(doc_id, license, has_copyright, restricted)``:
    ``license`` is the marker label or ``'none'``; ``restricted`` = 1
    iff the doc carries a rights signal and it is not a permissive
    one (cc / public-domain / mit / apache) — i.e. the rows a
    permissive-only corpus drops.

    Heuristics by design (a footer quoting a license mislabels) —
    the operator is a router, not a lawyer; precedence and needle set
    are pinned above and mirrored verbatim by the oracle. Pure
    Catalyst: one projection, first-match ``CASE`` chain over a staged
    lowercase attribute, zero shuffles, no UDF.
    """
    staged = df.select(F.col(id_col),
                       F.lower(F.col(text_col)).alias("_lc"))
    le = license_exprs(F.col("_lc"))
    return staged.select(F.col(id_col), le["license"].alias("license"),
                         le["has_copyright"].alias("has_copyright"),
                         le["restricted"].alias("restricted"))


def term_blocklist(df: DataFrame, terms: list[str],
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Token-level blocklist gate — the C4 recipe's "bad words" drop
    (Raffel et al. 2020 §2.2 removes any page containing a term from a
    published profanity blocklist; RefinedWeb and Gopher run the same
    shape with NSFW/toxicity word lists).

    ``terms`` is the caller's blocklist (the operator ships no list of
    its own — real deployments key this to a vetted, versioned list
    per language). Returns ``(id_col, n_tokens, n_hits,
    n_distinct_hits, hit_frac_e6, blocked)`` with ``blocked = n_hits
    > 0`` (the C4 any-hit rule; callers wanting a tolerance filter on
    ``hit_frac_e6`` instead).

    Pure Catalyst, zero shuffles: tokens staged once (SPARK-36718),
    membership is an array-literal scan per token — right for the
    few-hundred-term lists this stage uses; a list big enough to blow
    the expression tree belongs in a broadcast join against the
    exploded token stream instead (the ``urls.filter_blocked_domains``
    shape). Matching is exact-token over the shared lowercase
    tokenizer — substring false positives (the Scunthorpe problem) are
    structurally impossible, at the cost of missing spaced-out
    obfuscations.
    """
    lits = F.array(*[F.lit(t.lower()) for t in terms])
    toks = df.select(F.col(id_col),
                     words(F.col(text_col)).alias("_t"),
                     lits.alias("_bl"))
    hits = F.filter("_t", lambda x: F.array_contains("_bl", x))
    staged = toks.select(F.col(id_col), F.size("_t").alias("n_tokens"),
                         hits.alias("_h"))
    return staged.select(
        F.col(id_col),
        F.col("n_tokens").cast("long"),
        F.size("_h").cast("long").alias("n_hits"),
        F.size(F.array_distinct("_h")).cast("long")
        .alias("n_distinct_hits"),
        F.when(F.col("n_tokens") > 0,
               F.expr("size(_h) * 1000000 div n_tokens"))
        .otherwise(F.lit(0)).cast("long").alias("hit_frac_e6"),
        (F.size("_h") > 0).alias("blocked"))


def source_quality_prior(df: DataFrame, source_col: str = "source",
                         text_col: str = "text",
                         min_words: int = 5, max_words: int = 100_000,
                         alpha_permille: int = 100) -> DataFrame:
    """Per-source quality prior — the CCNet/C4-style per-DOMAIN routing
    signal: before spending per-document compute on a crawl, corpus
    recipes rank whole sources (hosts, dumps, feeds) by the fraction of
    their documents that clear a cheap quality bar, then sample or drop
    entire sources by that prior.

    A document passes iff its word count lies in
    ``[min_words, max_words]`` and its alphabetic character share is at
    least ``alpha_permille``/1000 — evaluated as the integer
    cross-multiplication ``1000·alpha_chars >= alpha_permille·n_chars``
    (the ``gopher_rules`` discipline: no float ratio is ever
    materialized, so the DuckDB oracle replays every row bit-exactly).
    Alphabetic means latin or arabic script, the ``quality_exprs``
    char class.

    Returns ``(source, n_docs, n_pass, pass_rate_e6, total_words)``
    with ``pass_rate_e6 = 1_000_000·n_pass div n_docs``.

    Scale shape: one narrow scan-local projection (tokens staged as a
    bound attribute), then one groupBy on source with map-side partial
    aggregation — a giant domain is one hot key, but every partial sum
    combines map-side, so the hot key moves one row per upstream
    partition, not its documents. Join the result back broadcast
    (sources number in the millions at web scale; the prior table is
    KB-per-source, not corpus-sized).
    """
    c = F.col(text_col)
    staged = df.select(
        F.col(source_col).alias("source"),
        F.size(words(c)).cast("long").alias("_nw"),
        F.length(c).cast("long").alias("_nc"),
        F.length(F.regexp_replace(c, "[^A-Za-z؀-ۿ ]", ""))
        .cast("long").alias("_na"))
    ok = ((F.col("_nw") >= min_words) & (F.col("_nw") <= max_words)
          & (F.col("_na") * 1000 >= F.col("_nc") * alpha_permille))
    agg = (staged
           .withColumn("_ok", F.when(ok, F.lit(1)).otherwise(F.lit(0))
                       .cast("long"))
           .groupBy("source")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("_ok").cast("long").alias("n_pass"),
                F.sum("_nw").cast("long").alias("total_words")))
    return agg.select(
        "source", "n_docs", "n_pass",
        F.expr("n_pass * 1000000 div n_docs").alias("pass_rate_e6"),
        "total_words")


def source_reputation(df: DataFrame, source_col: str = "source",
                      text_col: str = "text",
                      min_words: int = 5, max_words: int = 100_000,
                      alpha_permille: int = 100,
                      min_docs: int = 10,
                      min_pass_rate_e6: int = 500_000,
                      max_dup_rate_e6: int = 500_000) -> DataFrame:
    """Data-driven source blocklist derivation — the RefinedWeb /
    CCNet closing of the loop over :func:`source_quality_prior`: a
    source is *blocked* when, with at least ``min_docs`` of support,
    its cheap-quality pass rate falls below ``min_pass_rate_e6`` OR
    its exact-duplicate share exceeds ``max_dup_rate_e6`` (mirror
    farms and template sites show up as domains whose pages are
    mostly copies of each other before any per-document filter fires).

    Returns ``(source, n_docs, n_pass, pass_rate_e6, n_uniq,
    dup_rate_e6, blocked)`` with ``dup_rate_e6 =
    1_000_000·(n_docs - n_uniq) div n_docs`` and ``n_uniq`` the count
    of distinct md5(text) payloads. All fixed point — the support
    gate uses integer comparison only, so the DuckDB twin replays it
    bit-exactly.

    Scale shape: the prior is one groupBy(source) with map-side
    partials (see :func:`source_quality_prior`); the distinct count is
    the exact two-stage form — groupBy(source, md5) then
    groupBy(source) — both keyed on uniform hashes, never a
    count_distinct over a hot source in one task. The result is
    KB-per-source; join it back broadcast.
    """
    prior = source_quality_prior(df, source_col, text_col,
                                 min_words, max_words, alpha_permille)
    uniq = (df.select(F.col(source_col).alias("source"),
                      F.md5(F.col(text_col)).alias("_h"))
            .groupBy("source", "_h").agg(F.count("*").alias("_n"))
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_uniq")))
    rep = (prior.join(uniq, "source")
           .withColumn("dup_rate_e6",
                       F.expr("(n_docs - n_uniq) * 1000000 div n_docs")))
    blocked = ((F.col("n_docs") >= min_docs)
               & ((F.col("pass_rate_e6") < min_pass_rate_e6)
                  | (F.col("dup_rate_e6") > max_dup_rate_e6)))
    return rep.select(
        "source", "n_docs", "n_pass", "pass_rate_e6", "n_uniq",
        "dup_rate_e6",
        F.when(blocked, F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("blocked"))


def gate_by_source_reputation(df: DataFrame,
                              source_col: str = "source",
                              text_col: str = "text",
                              **rep_kwargs) -> DataFrame:
    """Drop every document whose source the reputation table blocks.

    The blocklist side is the per-source reputation relation —
    KB-per-source at any corpus size — so the gate is a broadcast
    LEFT ANTI join: the corpus never shuffles, only the tiny blocked
    set moves.
    """
    rep = source_reputation(df, source_col, text_col, **rep_kwargs)
    block = rep.where(F.col("blocked") == 1).select(
        F.col("source").alias(source_col))
    return df.join(F.broadcast(block), source_col, "left_anti")


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch-reading-ease-style readability, entirely in fixed point.

    Classic Flesch: ``206.835 - 1.015·(words/sentences) -
    84.6·(syllables/words)``. Two engine-portable substitutions, both
    documented:

    - **syllable proxy**: vowel-group count per word ([aeiouy]+ runs),
      floored at 1 per word — the standard dictionary-free estimator;
      non-latin words (e.g. arabic) count 1.
    - **integer arithmetic**: ``flesch_e3 = 206835
      - 1015·n_words div n_sents - 84600·n_syll div n_words`` — floor
      division at each step, so the DuckDB oracle replays every value
      exactly (the float form differs in the last ulp across libms).

    Sentences are the ``sentences`` module's RE2-safe subset boundary.
    Returns ``(doc_id, n_sents, n_words, n_syllables, flesch_e3)``;
    ``flesch_e3`` is NULL when the doc has no words or no sentences.
    Zero shuffles — per-row array arithmetic inside the scan's codegen
    span, the ``quality_exprs`` envelope.
    """
    from rag_document_parser_spark.operators.sentences import (
        sentences_expr)

    c = F.col(text_col)
    staged = df.select(F.col(id_col), words(c).alias("_w"),
                       F.size(sentences_expr(c)).cast("long")
                       .alias("n_sents"))
    syll = F.aggregate(
        "_w", F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            (F.size(F.split(w, "[aeiouy]+", -1)) - 1).cast("long"),
            F.lit(1).cast("long")))
    s2 = staged.select(F.col(id_col), "n_sents",
                       F.size("_w").cast("long").alias("n_words"),
                       syll.alias("n_syllables"))
    flesch = F.when(
        (F.col("n_words") > 0) & (F.col("n_sents") > 0),
        F.lit(206835)
        - F.expr("n_words * 1015 div n_sents")
        - F.expr("n_syllables * 84600 div n_words"))
    return s2.select(id_col, "n_sents", "n_words", "n_syllables",
                     flesch.cast("long").alias("flesch_e3"))


def tokenizer_fertility(docs: DataFrame, segmented: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        lang_col: str = "lang") -> DataFrame:
    """Per-language tokenizer fertility over a ``bpe_segment`` output.

    Tokenizer selection for a multilingual corpus reads two numbers
    per language: FERTILITY (subwords emitted per whitespace word — a
    tokenizer that explodes one language's words into many pieces
    taxes that language's effective context window) and COMPRESSION
    (chars per subword — how much text a token carries). Both are
    fixed-point integers so the DuckDB oracle replays them bitwise:
    ``fertility_e3 = 1000·Σsubwords div Σwords``,
    ``chars_per_subword_e3 = 1000·Σchars div Σsubwords``.

    ``segmented`` is any frame with ``(id_col, n_tokens, n_subwords)``
    — ``bpe.bpe_segment`` output, or a real tokenizer's counts written
    by an offline pass. Returns one row per language: ``(lang, n_docs,
    total_chars, total_words, total_subwords, fertility_e3,
    chars_per_subword_e3)``.

    Scale shape: one join on the uniform doc id, one
    map-side-combinable groupBy on the handful of language keys.
    Cited context: fertility as tokenizer-quality metric per Rust et
    al. 2021 (How Good is Your Tokenizer?); no reference analog (the
    reference parses documents, it does not size token budgets).
    """
    base = docs.select(F.col(id_col), F.col(lang_col).alias("lang"),
                       F.length(F.col(text_col)).cast("long").alias("_nc"))
    j = base.join(segmented, id_col)
    agg = j.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nc").cast("long").alias("total_chars"),
        F.sum("n_tokens").cast("long").alias("total_words"),
        F.sum("n_subwords").cast("long").alias("total_subwords"))
    return agg.select(
        "lang", "n_docs", "total_chars", "total_words", "total_subwords",
        F.expr("total_subwords * 1000 div greatest(total_words, 1)")
        .alias("fertility_e3"),
        F.expr("total_chars * 1000 div greatest(total_subwords, 1)")
        .alias("chars_per_subword_e3"))


# RE2-safe date patterns, shared verbatim with the DuckDB oracle:
# ISO dates and standalone years 1900-2099 (word-bounded)
ISO_DATE_RE = r"\b(19|20)[0-9]{2}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])\b"
YEAR_RE = r"\b(19|20)[0-9]{2}\b"


def temporal_metadata(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Temporal signals for cutoff-aware curation: how many ISO dates
    a document cites and the span of years it mentions — the metadata
    a training-cutoff filter keys on ("drop documents that reference
    years past the cutoff", leakage screening for time-split evals).
    One row per doc: ``(id, n_iso_dates, n_years, min_year, max_year)``
    — year columns NULL when nothing matches.

    Patterns are word-bounded RE2-safe literals shared with the
    oracle; years are the 1900-2099 window (a bare number like 1850 or
    2500 is far more often a quantity than a date — the documented
    trade). Row-local projection: two ``regexp_extract_all`` passes +
    array folds inside codegen, zero shuffles.
    """
    years = F.expr(
        f"transform(regexp_extract_all({text_col}, r'{YEAR_RE}', 0),"
        " y -> cast(y as int))")
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"size(regexp_extract_all({text_col},"
               f" r'{ISO_DATE_RE}', 0))").cast("long")
        .alias("n_iso_dates"),
        F.size(years).cast("long").alias("n_years"),
        F.array_min(years).cast("long").alias("min_year"),
        F.array_max(years).cast("long").alias("max_year"))


def msttr(df: DataFrame, w: int = 50, text_col: str = "text",
          id_col: str = "doc_id") -> DataFrame:
    """Mean segmental type-token ratio (Johnson 1944) — the
    length-robust lexical-diversity measure (raw TTR collapses as
    documents grow; fixed-window TTR does not): split the token
    stream into consecutive ``w``-token windows, take each full
    window's distinct-type share, average. One row per doc:
    ``(id, n_windows, msttr_e6)``; the partial tail window is dropped
    (its inflated TTR is the artifact MSTTR exists to remove,
    documented) and docs shorter than ``w`` report 0 windows with
    NULL msttr.

    Row-local: one staged tokenization, a ``transform`` over window
    starts with slice + array_distinct inside codegen, zero shuffles;
    per-doc work is linear in tokens.
    """
    staged = df.select(F.col(id_col).alias("id"),
                       words(F.col(text_col)).alias("_t"))
    staged = staged.select(
        "id", F.expr(f"size(_t) div {int(w)}").alias("n_windows"),
        F.expr(f"""
          aggregate(
            CASE WHEN size(_t) div {int(w)} >= 1
                 THEN sequence(0, cast(size(_t) div {int(w)} as int) - 1)
                 ELSE cast(array() as array<int>) END,
            0L,
            (acc, i) -> acc + size(array_distinct(
                          slice(_t, i * {int(w)} + 1, {int(w)}))))
        """).alias("_types"))
    return staged.select(
        "id", F.col("n_windows").cast("long").alias("n_windows"),
        F.when(F.col("n_windows") > 0,
               F.expr(f"_types * 1000000 div (n_windows * {int(w)})"))
        .cast("long").alias("msttr_e6"))
