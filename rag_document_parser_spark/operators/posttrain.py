"""Post-training data assembly: SFT chat records + preference pairs.

The curation tiers upstream produce clean pre-training text; fine-tuning
runs need two more shapes this module provides:

- ``chat_offsets``: supervised fine-tuning records are role-tagged
  conversations where the loss is masked to the assistant turns
  (InstructGPT, Ouyang et al. 2022 §3.5 — train on completions, not
  prompts). The loader needs, per turn, its CHARACTER interval inside
  the assembled record plus a trainable flag; emitting offsets instead
  of pre-sliced strings keeps the record assembly a loader concern and
  the Spark output narrow.
- ``preference_pairs``: reward-model / DPO training consumes
  (chosen, rejected) pairs. Mining them from a scored corpus is a
  per-group argmax/argmin — phrased here as two map-side-combinable
  aggregates plus equi-joins back on the group key, NEVER a per-group
  window (a ``row_number() OVER (PARTITION BY group)`` funnels a
  popular group's every row through one task; the aggregate form
  partial-combines inside each scan task regardless of skew).

Engine-exact arithmetic throughout: character offsets are cumulative
BIGINT sums over ``length()`` (identical in Spark and DuckDB for the
BMP-safe synthetic corpora the oracles run on), scores are caller-
provided integers, ties break on the smallest id. The reference has no
post-training surface (it stops at parsed text, /root/reference/main.py);
this is a SURVEY §6 training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["bradley_terry", "chat_offsets", "cohen_kappa",
           "preference_pairs", "verbosity_bias"]


def chat_offsets(turns: DataFrame, conv_col: str = "conv_id",
                 idx_col: str = "turn_idx", role_col: str = "role",
                 text_col: str = "text",
                 trainable_role: str = "assistant") -> DataFrame:
    """Per-turn character intervals inside the assembled chat record.

    The record for a conversation is the concatenation, in ``idx_col``
    order, of ``<|role|>`` + text for each turn. Output = one row per
    turn: ``(conv_id, turn_idx, role, start_char, end_char,
    trainable)`` where ``[start_char, end_char)`` is the turn's span
    (tag included) in that record and ``trainable`` marks
    ``trainable_role`` turns — the loss-mask intervals.

    Scale shape: ONE exchange on the uniform ``conv_col`` key feeding a
    per-conversation window whose frame is bounded by conversation
    length (tens of turns, never corpus-sized); the cumulative sum is
    the only state.
    """
    part_len = (F.length(F.col(role_col)) + F.lit(4)
                + F.length(F.col(text_col))).cast("long")
    w = (Window.partitionBy(conv_col).orderBy(idx_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(part_len).over(w), F.lit(0).cast("long"))
    return turns.select(
        F.col(conv_col), F.col(idx_col), F.col(role_col),
        start.alias("start_char"),
        (start + part_len).alias("end_char"),
        (F.col(role_col) == trainable_role).alias("trainable"))


def preference_pairs(df: DataFrame, score_col: str,
                     group_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-group (chosen, rejected) preference pair with margin.

    For every group with at least two distinct scores: ``chosen`` is
    the highest-scored member, ``rejected`` the lowest, ties broken by
    the smallest ``id_col``; ``margin = max_score - min_score``. Groups
    whose members all tie (margin 0) emit nothing — a pair with no
    preference signal is noise to a reward model.

    ``score_col`` must be integer (the package's fixed-point scores);
    float scores would make the equality joins engine-fragile.

    Scale shape: one aggregate to |groups| rows (map-side combinable),
    then two joins back keyed on (group, score) to recover the argmax /
    argmin ids as MIN-aggregates — no per-group window, so a group
    holding 99 % of the corpus still partial-aggregates inside each
    scan task instead of sorting on one.
    """
    g, s, i = F.col(group_col), F.col(score_col).cast("long"), F.col(id_col)
    base = df.select(g.alias("grp"), s.alias("score"), i.alias("id"))
    ext = (base.groupBy("grp")
           .agg(F.max("score").alias("chosen_score"),
                F.min("score").alias("rejected_score"))
           .where(F.col("chosen_score") > F.col("rejected_score")))
    chosen = (base.join(ext.select("grp", "chosen_score"), "grp")
              .where(F.col("score") == F.col("chosen_score"))
              .groupBy("grp").agg(F.min("id").alias("chosen_id")))
    rejected = (base.join(ext.select("grp", "rejected_score"), "grp")
                .where(F.col("score") == F.col("rejected_score"))
                .groupBy("grp").agg(F.min("id").alias("rejected_id")))
    return (ext.join(chosen, "grp").join(rejected, "grp")
            .select(F.col("grp").alias(group_col), "chosen_id",
                    "rejected_id",
                    (F.col("chosen_score") - F.col("rejected_score"))
                    .alias("margin")))


def cohen_kappa(df: DataFrame, a_col: str = "label_a",
                b_col: str = "label_b") -> DataFrame:
    """Inter-annotator agreement (Cohen 1960): chance-corrected
    agreement between two label columns — the QC gate run over
    double-annotated preference/SFT data before labels train a reward
    model. One row: ``(n_items, po_e6, pe_e6, kappa_e6)`` with
    ``kappa = (p_o − p_e)/(1 − p_e)`` in e6 fixed point; NULL kappa
    when chance agreement is total (``p_e = 1`` — a single label
    class, nothing to correct) or the input is empty.

    Exact integer: observed agreement from one count, expected
    agreement from the marginal product ``Σ_k n_a(k)·n_b(k)`` widened
    to decimal(38,0) (safe to n ≈ 10¹⁵ items), divisions floor. Scale
    shape: two map-side-combinable aggregates (overall + per-label
    marginals) — the label domain, not the corpus, bounds the final
    fold.
    """
    base = df.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    tot = base.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum((F.col("_a") == F.col("_b")).cast("long"))
        .cast("long").alias("_agree"))
    am = base.groupBy("_a").agg(F.count("*").cast("long").alias("_na"))
    bm = base.groupBy("_b").agg(F.count("*").cast("long").alias("_nb"))
    pe_num = (am.join(bm, am["_a"] == bm["_b"])
              .agg(F.coalesce(F.sum(F.expr(
                  "cast(_na as decimal(38,0)) * _nb")), F.lit(0))
                  .cast("decimal(38,0)").alias("_pe_num")))
    j = tot.crossJoin(pe_num)
    po = F.expr("_agree * 1000000 div nullif(n_items, 0)")
    pe = F.expr("cast(_pe_num * 1000000"
                " div nullif(cast(n_items as decimal(38,0))"
                " * n_items, 0) as bigint)")
    return (j.select("n_items", po.cast("long").alias("po_e6"),
                     pe.alias("pe_e6"))
            .select("n_items", "po_e6", "pe_e6",
                    F.when(F.col("pe_e6") < 1_000_000,
                           F.expr("(po_e6 - pe_e6) * 1000000"
                                  " div (1000000 - pe_e6)"))
                    .cast("long").alias("kappa_e6")))


def bradley_terry(outcomes: DataFrame, winner_col: str = "winner",
                  loser_col: str = "loser",
                  n_iter: int = 5) -> DataFrame:
    """Bradley-Terry preference strengths from pairwise outcomes via
    Hunter's (2004) MM iteration — the diagnostic fit run over
    preference data before it trains a reward model (inconsistent or
    degenerate comparisons surface as collapsed strengths). Returns
    one row per item: ``(item, wins, n_comparisons, strength_e6)``.

    The update ``p_i ← W_i / Σ_j n_ij/(p_i+p_j)`` in e6 fixed point:
    per unordered pair, ``term = n_ij·1e12 div (p_i+p_j)``; then
    ``p_i' = max(W_i·1e12 div D_i, 1)`` (the floor keeps never-winning
    items at a positive epsilon so later denominators stay nonzero —
    the standard regularization, documented); each round closes with
    an exact integer rescale to total mass ``n_items·1e6`` (BT is
    scale-invariant; the rescale pins the gauge so both engines agree
    bit-for-bit). Fixed ``n_iter`` rounds — MM converges
    monotonically; the oracle unrolls the same rounds.

    Scale shape: comparisons aggregate ONCE to the unordered-pair
    relation (uniform (i, j) key, map-side combinable); each round is
    one broadcast-or-shuffle join of the item-sized ``p`` onto pairs,
    one groupBy per item, one 1-row total broadcast —
    ``localCheckpoint`` per round caps lineage (the pagerank/bpe
    discipline). Driver interaction is one scalar item count, total.
    """
    pairs = outcomes.select(F.col(winner_col).alias("_w"),
                            F.col(loser_col).alias("_l"))
    und = (pairs.select(F.least("_w", "_l").alias("i"),
                        F.greatest("_w", "_l").alias("j"))
           .groupBy("i", "j").agg(F.count("*").cast("long").alias("n_ij")))
    wins = (pairs.groupBy(F.col("_w").alias("item"))
            .agg(F.count("*").cast("long").alias("wins")))
    comps = (pairs.select(F.col("_w").alias("item"))
             .unionByName(pairs.select(F.col("_l").alias("item")))
             .groupBy("item")
             .agg(F.count("*").cast("long").alias("n_comparisons")))
    items = comps.select("item").localCheckpoint()
    n_items = items.count()
    p = items.withColumn("p_e6", F.lit(1_000_000).cast("long"))
    for _ in range(max(int(n_iter), 0)):
        e = (und
             .join(p.select(F.col("item").alias("i"),
                            F.col("p_e6").alias("_pi")), "i")
             .join(p.select(F.col("item").alias("j"),
                            F.col("p_e6").alias("_pj")), "j")
             .withColumn("_term", F.expr(
                 "n_ij * 1000000000000 div (_pi + _pj)")))
        d = (e.select(F.col("i").alias("item"), "_term")
             .unionByName(e.select(F.col("j").alias("item"), "_term"))
             .groupBy("item")
             .agg(F.sum("_term").cast("long").alias("_d")))
        raw = (items
               .join(wins, "item", "left")
               .join(d, "item", "left")
               .select("item", F.expr(
                   "CASE WHEN _d IS NULL OR _d <= 0 THEN 1000000"
                   " ELSE greatest(coalesce(wins, 0) * 1000000000000"
                   " div _d, 1) END").alias("p_e6")))
        tot = raw.agg(F.sum("p_e6").cast("long").alias("_tot"))
        p = (raw.crossJoin(F.broadcast(tot))
             .select("item", F.expr(
                 f"p_e6 * ({int(n_items)} * 1000000) div _tot")
                 .cast("long").alias("p_e6"))
             .localCheckpoint())
    return (items.join(wins, "item", "left").join(comps, "item")
            .join(p, "item")
            .select("item", F.coalesce("wins", F.lit(0)).cast("long")
                    .alias("wins"),
                    "n_comparisons",
                    F.col("p_e6").alias("strength_e6")))


def verbosity_bias(pairs: DataFrame, chosen_col: str = "chosen",
                   rejected_col: str = "rejected") -> DataFrame:
    """Length-preference probe over preference pairs — the standard QC
    for the RLHF verbosity failure mode (annotators and reward models
    preferring longer answers regardless of quality; cf. the
    length-controlled AlpacaEval correction). One row:
    ``(n_pairs, n_longer_chosen, n_shorter_chosen, n_equal,
    longer_win_e6, mean_gap_chars_e3)`` where ``longer_win_e6`` is
    P(chosen strictly longer | lengths differ) in e6 fixed point —
    500000 means length-neutral — and ``mean_gap_chars_e3`` is the
    mean char-length gap (chosen − rejected) ×1000, exact integer
    floor (negative when rejected responses run longer).

    One map-side-combinable aggregate; nothing shuffles but the final
    1-row combine.
    """
    lc = F.length(F.col(chosen_col)).cast("long")
    lr = F.length(F.col(rejected_col)).cast("long")
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((lc > lr).cast("long")).cast("long")
        .alias("n_longer_chosen"),
        F.sum((lc < lr).cast("long")).cast("long")
        .alias("n_shorter_chosen"),
        F.sum((lc == lr).cast("long")).cast("long").alias("n_equal"),
        F.sum(lc - lr).cast("long").alias("_gap"))
    return agg.select(
        "n_pairs", "n_longer_chosen", "n_shorter_chosen", "n_equal",
        F.expr("n_longer_chosen * 1000000"
               " div nullif(n_longer_chosen + n_shorter_chosen, 0)")
        .cast("long").alias("longer_win_e6"),
        # sign-split division (the pca.py discipline): Spark's `div`
        # truncates toward zero while DuckDB's `//` floors, so negative
        # gaps must divide on the absolute value
        F.expr("CASE WHEN _gap >= 0"
               " THEN _gap * 1000 div nullif(n_pairs, 0)"
               " ELSE -((-_gap) * 1000 div nullif(n_pairs, 0)) END")
        .cast("long").alias("mean_gap_chars_e3"))
