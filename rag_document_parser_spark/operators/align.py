"""Gale-Church sentence alignment (Gale & Church 1993, "A Program for
Aligning Sentences in Bilingual Corpora", CL 19(1)): given a document
pair's sentence-length sequences, find the minimum-cost monotone
alignment into beads of type 1-1, 1-0, 0-1, 2-1, 1-2, 2-2 — the
classic preprocessing step that turns mined parallel DOCUMENTS
(``operators/bitext.py``) into parallel SENTENCE pairs for
translation-pair training data.

Documented deltas from the paper, chosen so Spark and the DuckDB
oracle replay the arithmetic bit-exactly (the repo's oracle-gate
discipline):

- **Linear relative length mismatch instead of the Gaussian
  log-likelihood**: the paper's match cost is −100·log P(δ) with
  δ = (l2 − l1·c)/sqrt(l1·s²) — sqrt, log, and Φ are not
  bit-portable. Ours is ``mc(sa, sb) = 1000·|sa − sb| div
  (sa + sb + 1)`` — same minimum (balanced beads), monotone in
  relative mismatch, bounded in [0, 1000), exact integer.
- **The paper's bead-type priors verbatim as integer penalties**
  (its −100·log₂ prior constants): 1-1 → 0, 1-0/0-1 → 450,
  2-1/1-2 → 230, 2-2 → 440.
- **Deterministic tie-break** by bead-type order (0-1, 1-0, 1-1,
  2-1, 1-2, 2-2) when two alignments cost the same.

The DP is a ROW-LOCAL FOLD (the ``unigram.py`` Viterbi discipline):
one ``aggregate`` over the (n+1)·(m+1) cell sequence builds the DP
table entirely inside the engine — no Python touches the data, no
shuffle, each pair one task-local computation. A second bounded fold
walks the backpointers from (n, m) to (0, 0). The accumulator is ONE
flat ``array<bigint>`` with each cell's (cost, move) PACKED as
``cost*16 + move_id`` (the ``sentence_chunks`` index-fold discipline
— round-4 VERDICT task #2): ``array_min`` over packed candidates
selects min cost with the MOVES-order tie-break for free, the
6-candidate array is evaluated ONCE per cell instead of three times,
and the per-step copy is a single primitive array rather than a
struct of two. Copying an immutable accumulator is still O(cells²)
element moves in the worst case, so pairs stay capped at
``max_cells`` cells (default 4096 ≈ 63×63 sentences) with a loud
in-plan raise — chop longer documents into windows upstream
(``tiling``/``chunking``) before aligning, the same cap discipline as
``lsh_signature``. Packing headroom: feasible costs are bounded by
``max_cells·(450+1000) ≈ 6.2e6`` so packed values stay ≤ 1e8, far
under bigint; the INF sentinel (1e15) exceeds every feasible packed
value.

Scale shape: alignment parallelism is per PAIR — a corpus of mined
pairs spreads one bounded DP per row across the cluster; nothing
shuffles, nothing is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["gale_church_align", "python_gale_church"]

# bead move table: id -> (da, db, penalty). Order IS the tie-break.
MOVES = [(0, 1, 450), (1, 0, 450), (1, 1, 0),
         (2, 1, 230), (1, 2, 230), (2, 2, 440)]
INF = 10 ** 15


def python_gale_church(la: list[int], lb: list[int]):
    """Pure-Python twin of the engine DP (tests + documentation).

    Returns beads ``[(a_start, a_len, b_start, b_len), ...]`` in
    document order.
    """
    n, m = len(la), len(lb)

    def mc(sa: int, sb: int) -> int:
        return 1000 * abs(sa - sb) // (sa + sb + 1)

    D = [[INF] * (m + 1) for _ in range(n + 1)]
    B = [[0] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(n + 1):
        for j in range(m + 1):
            if i == 0 and j == 0:
                continue
            best, move = INF, 0
            for mid, (da, db, pen) in enumerate(MOVES, start=1):
                if i < da or j < db:
                    continue
                sa = sum(la[i - da:i])
                sb = sum(lb[j - db:j])
                c = D[i - da][j - db] + pen + mc(sa, sb)
                if c < best:
                    best, move = c, mid
            D[i][j], B[i][j] = best, move
    beads = []
    i, j = n, m
    while (i, j) != (0, 0):
        da, db, _ = MOVES[B[i][j] - 1]
        beads.append((i - da, da, j - db, db))
        i, j = i - da, j - db
    beads.reverse()
    return beads


# ---- shared expression fragments (Spark SQL dialect; the DuckDB twin
# in __spark_entry__ mirrors them with // and 1-based list indexing) --

_I = "cast(kk div _w as int)"          # cell row    (a-side prefix)
_J = "cast(kk % _w as int)"            # cell column (b-side prefix)


def _mc(sa: str, sb: str) -> str:
    return f"(1000 * abs(({sa}) - ({sb})) div (({sa}) + ({sb}) + 1))"


def _cands_expr() -> str:
    """The 6-candidate PACKED cost array for cell ``kk`` over the flat
    accumulator ``acc`` (array<bigint> of ``cost*16 + move_id`` per
    completed cell; ``div 16`` recovers a predecessor's cost)."""
    cands = []
    for mid, (da, db, pen) in enumerate(MOVES, start=1):
        sa = (" + ".join(f"element_at(_la, {_I} - {x})"
                         for x in range(da)) or "0L")
        sb = (" + ".join(f"element_at(_lb, {_J} - {x})"
                         for x in range(db)) or "0L")
        prev = f"(element_at(acc, kk - {da} * _w - {db} + 1) div 16)"
        cands.append(
            f"IF({_I} >= {da} AND {_J} >= {db},"
            f" ({prev} + {pen} + {_mc(sa, sb)}) * 16 + {mid},"
            f" cast({INF} as bigint))")
    return "array(" + ", ".join(cands) + ")"


_MOVE = "cast(element_at(_dp, acc.k + 1) % 16 as int)"
_DA = (f"CASE {_MOVE}"
       " WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 1"
       " WHEN 4 THEN 2 WHEN 5 THEN 1 WHEN 6 THEN 2 END")
_DB = (f"CASE {_MOVE}"
       " WHEN 1 THEN 1 WHEN 2 THEN 0 WHEN 3 THEN 1"
       " WHEN 4 THEN 1 WHEN 5 THEN 2 WHEN 6 THEN 2 END")


def gale_church_align(pairs: DataFrame, pair_id_col: str = "pair_id",
                      la_col: str = "la", lb_col: str = "lb",
                      max_cells: int = 4096) -> DataFrame:
    """Align each pair's sentence-length sequences. Input: one row per
    pair with ``(pair_id, la: array<int>, lb: array<int>)`` (sentence
    char lengths, document order). Output: one row per BEAD —
    ``(pair_id, bead_idx, a_start, a_len, b_start, b_len)`` with
    0-based starts; ``a_len``/``b_len`` in {0, 1, 2} per the bead
    inventory. A pair with both sides empty emits no beads; one-sided
    pairs emit pure insertion/deletion beads.
    """
    guard = F.when(
        (F.size(F.col(la_col)) + 1) * (F.size(F.col(lb_col)) + 1)
        <= max_cells,
        F.lit(0),
    ).otherwise(F.raise_error(F.lit(
        f"gale_church_align: pair exceeds max_cells={max_cells} DP "
        "cells; window the documents upstream (tiling/chunking) or "
        "raise max_cells deliberately")).cast("int"))
    staged = pairs.select(
        F.col(pair_id_col).alias("pair_id"),
        F.col(la_col).cast("array<long>").alias("_la"),
        F.col(lb_col).cast("array<long>").alias("_lb"),
        guard.alias("_g"))
    staged = staged.select(
        "pair_id", "_la", "_lb",
        (F.expr("size(_lb) + 1") + F.col("_g")).alias("_w"),
        F.expr("(size(_la) + 1) * (size(_lb) + 1) - 1").alias("_nm"))
    cands = _cands_expr()
    dp = staged.select(
        "pair_id", "_la", "_lb", "_w", "_nm",
        F.expr(f"""
          aggregate(
            CASE WHEN _nm >= 1 THEN sequence(1, _nm)
                 ELSE cast(array() as array<int>) END,
            array(cast(0 as bigint)),
            (acc, kk) -> concat(acc, array(array_min({cands}))))
        """).alias("_dp"))
    beads = dp.select(
        "pair_id", "_w", "_nm", "_dp",
        F.expr(f"""
          aggregate(
            CASE WHEN _nm >= 1 THEN sequence(1, size(_la) + size(_lb))
                 ELSE cast(array() as array<int>) END,
            named_struct('k', _nm,
                         'b', cast(array() as array<struct<
                               a_start: bigint, a_len: bigint,
                               b_start: bigint, b_len: bigint>>)),
            (acc, step) -> IF(acc.k <= 0, acc,
              named_struct(
                'k', acc.k - ({_DA}) * _w - ({_DB}),
                'b', concat(acc.b, array(named_struct(
                   'a_start', cast(acc.k div _w - ({_DA}) as bigint),
                   'a_len', cast({_DA} as bigint),
                   'b_start', cast(acc.k % _w - ({_DB}) as bigint),
                   'b_len', cast({_DB} as bigint)))))))
        """).alias("_bt"))
    return (beads.select(
        "pair_id",
        F.posexplode_outer(F.reverse(F.col("_bt.b")))
        .alias("bead_idx", "_bead"))
        .where(F.col("_bead").isNotNull())
        .select("pair_id", F.col("bead_idx").cast("long").alias("bead_idx"),
                F.col("_bead.a_start").alias("a_start"),
                F.col("_bead.a_len").alias("a_len"),
                F.col("_bead.b_start").alias("b_start"),
                F.col("_bead.b_len").alias("b_len")))
