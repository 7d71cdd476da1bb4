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
