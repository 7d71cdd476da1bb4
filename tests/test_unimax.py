"""UniMax water-filling allocation (mixture.unimax_allocation) vs a
pure-Python iterative water-filler: budget conservation, cap
respect, equal levels for uncapped groups, the all-capped regime,
and the closed-form/iterative agreement over randomized masses."""

import pytest

from rag_document_parser_spark.operators import mixture as MX

E6 = 1_000_000


def _twin_unimax(masses, budget, cap_e6=4 * E6):
    caps = {g: m * cap_e6 // E6 for g, m in masses.items()}
    remaining = set(masses)
    alloc = {}
    b = budget
    # iterative water-filling: repeatedly grant the equal split, cap
    # whoever it over-grants, recompute
    while remaining:
        level = b // len(remaining)
        bound = {g for g in remaining if caps[g] <= level}
        if not bound:
            for g in remaining:
                alloc[g] = level
            break
        for g in bound:
            alloc[g] = caps[g]
            b -= caps[g]
        remaining -= bound
    return alloc, caps


CASES = [
    # (masses, budget) — regimes: split, all-capped, all-uncapped
    ({"en": 1000, "fr": 200, "de": 60, "sw": 10}, 2000),
    ({"en": 1000, "fr": 200, "de": 60, "sw": 10}, 100_000),  # all cap
    ({"en": 1000, "fr": 900, "de": 800}, 600),               # none cap
    ({"a": 7, "b": 7, "c": 7, "d": 1000}, 1500),             # ties
    ({"solo": 50}, 10),
]


@pytest.mark.parametrize("masses,budget", CASES)
def test_matches_iterative_water_filling(spark, masses, budget):
    per = spark.createDataFrame(
        [(g, 1, m) for g, m in masses.items()],
        ["group", "n_docs", "mass"])
    got = {r.group: r for r in
           MX.unimax_allocation(per, budget).collect()}
    want, caps = _twin_unimax(masses, budget)
    assert set(got) == set(masses)
    for g in masses:
        assert got[g].cap_tokens == caps[g], g
        assert got[g].allocated_tokens == want[g], g
        if got[g].capped:
            assert got[g].allocated_tokens == caps[g], g
    # conservation: never overspend; deficit < number of uncapped
    total = sum(r.allocated_tokens for r in got.values())
    n_uncapped = sum(1 for r in got.values() if not r.capped)
    spent_cap = sum(caps.values())
    assert total <= min(budget, spent_cap)
    if n_uncapped:
        assert min(budget, spent_cap) - total < n_uncapped
    # all uncapped groups share one identical level
    levels = {r.allocated_tokens for r in got.values() if not r.capped}
    assert len(levels) <= 1


def test_uncapped_beats_epoch_plan_shortfall(spark):
    """The motivating property: where epoch_plan drops the capped
    groups' shortfall, UniMax hands it to groups with headroom."""
    masses = {"en": 10_000, "sw": 10}
    per = spark.createDataFrame(
        [(g, 1, m) for g, m in masses.items()],
        ["group", "n_docs", "mass"])
    budget = 5_000
    got = {r.group: r for r in
           MX.unimax_allocation(per, budget).collect()}
    assert got["sw"].capped and got["sw"].allocated_tokens == 40
    assert got["en"].allocated_tokens == budget - 40  # redistributed
    assert got["en"].epochs_e6 < 4 * E6


def _log2_e3(n):
    il = n.bit_length() - 1
    return il * 1000 + (n * 1000) // (1 << il) - 1000


def test_mixture_summary_entropy(spark):
    """Fixed-point entropy + effective-group perplexity vs a
    pure-Python twin; uniform mixtures hit effective == n exactly
    (the piecewise exp is the exact inverse of the piecewise log at
    powers of two), degenerate mixtures hit 1."""
    cases = [
        {"a": 100, "b": 100, "c": 100, "d": 100},  # uniform
        {"a": 400},                                # single group
        {"a": 397, "b": 2, "c": 1},                # near-degenerate
        {"a": 250, "b": 125, "c": 125},
    ]
    for masses in cases:
        alloc = spark.createDataFrame(
            [(g, m, m, m, E6, False) for g, m in masses.items()],
            ["group", "mass", "cap_tokens", "allocated_tokens",
             "epochs_e6", "capped"])
        row = MX.mixture_summary(alloc).collect()[0]
        t = sum(masses.values())
        hs = sum(m * (_log2_e3(t) - _log2_e3(m))
                 for m in masses.values() if m > 0)
        h = hs // t
        eff = (1 << (h // 1000)) * (1000 + h % 1000)
        assert row.total_tokens == t
        assert row.entropy_e3 == h, masses
        assert row.effective_groups_e3 == eff, masses
        assert row.max_share_e6 == max(masses.values()) * E6 // t
    # the uniform 4-group case lands exactly on effective = 4.000
    alloc = spark.createDataFrame(
        [(g, 64, 64, 64, E6, False) for g in "abcd"],
        ["group", "mass", "cap_tokens", "allocated_tokens",
         "epochs_e6", "capped"])
    row = MX.mixture_summary(alloc).collect()[0]
    assert row.entropy_e3 == 2000 and row.effective_groups_e3 == 4000
