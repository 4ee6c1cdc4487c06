"""UniMax budget allocation (operators.sampling.unimax_allocation) —
closed-form water-filling checks against hand computations."""

from __future__ import annotations

import pytest


def _alloc(spark, rows, budget, epochs="2.0"):
    from dump1090_db_stream_spark.operators.sampling import (
        unimax_allocation,
    )

    df = spark.createDataFrame(rows, ["source", "n_tokens"])
    out = unimax_allocation(df, budget_tokens=budget, max_epochs=epochs,
                            token_col="n_tokens")
    return {r["source"]: r for r in out.collect()}


def test_mixed_regime_hand_computed(spark):
    """Capacities (x2 epochs): a=20, b=60, c=200. Budget 160:
    a capped (20 <= 160/3); remaining 140 over two -> level 70 >= 60
    so b capped too; c gets the leftover 80 < its 200 capacity.
    Sum of allocations == budget exactly."""
    got = _alloc(spark, [("a", 10), ("b", 30), ("c", 100)], 160)
    assert got["a"]["alloc_tokens"] == 20.0
    assert got["b"]["alloc_tokens"] == 60.0
    assert got["c"]["alloc_tokens"] == 80.0
    assert got["a"]["epochs"] == 2.0 and got["b"]["epochs"] == 2.0
    assert got["c"]["epochs"] == 0.8
    assert sum(r["alloc_tokens"] for r in got.values()) == 160.0


def test_undersubscribed_budget_caps_everyone(spark):
    """Total capacity 260 < budget 1000: every source takes its full
    epoch-capped capacity; the surplus stays unallocated (allocating
    it would break the epoch cap — the UniMax contract)."""
    got = _alloc(spark, [("a", 10), ("b", 30), ("c", 90)], 1000)
    assert {s: r["alloc_tokens"] for s, r in got.items()} == \
        {"a": 20.0, "b": 60.0, "c": 180.0}
    assert all(r["epochs"] == 2.0 for r in got.values())


def test_oversubscribed_budget_is_uniform(spark):
    """Budget far below every capacity: pure uniform split (the
    'fairest possible' end of the dial) regardless of source size."""
    got = _alloc(spark, [("a", 1000), ("b", 5000), ("c", 9000)], 300)
    assert {s: r["alloc_tokens"] for s, r in got.items()} == \
        {"a": 100.0, "b": 100.0, "c": 100.0}


def test_zero_budget_and_null_sources(spark):
    rows = [("a", 10), ("b", 30), (None, 999)]
    got = _alloc(spark, rows, 0)
    assert set(got) == {"a", "b"}          # NULL source excluded
    assert all(r["alloc_tokens"] == 0.0 for r in got.values())
    with pytest.raises(ValueError, match="budget_tokens"):
        _alloc(spark, rows, -1)


def test_all_null_token_source_is_excluded(spark):
    """A source whose token column is entirely NULL has no countable
    capacity: it must be EXCLUDED, not handed the water level (a NULL
    capacity would sort differently across engines and fall through
    the capped test to theta)."""
    from dump1090_db_stream_spark.operators.sampling import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("ghost", None), ("b", 80)],
        "source string, n_tokens int")
    got = {r["source"]: r for r in unimax_allocation(
        df, budget_tokens=100, max_epochs="2.0",
        token_col="n_tokens").collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["alloc_tokens"] == 40.0   # capped at 2 epochs
    assert got["b"]["alloc_tokens"] == 60.0   # the rest of the budget


def test_matches_sequential_greedy_reference(spark):
    """Property vs an independent implementation: the paper's greedy
    (ascending capacity, fair share of the remaining budget) on 40
    random sources equals the window-expressed water-filling."""
    import random

    rng = random.Random(7)
    rows = [(f"s{i}", rng.randrange(1, 10_000)) for i in range(40)]
    budget = 120_000
    caps = sorted((n * 2.0, s) for s, n in rows)
    remaining, alloc = float(budget), {}
    for idx, (k, s) in enumerate(caps):
        fair = remaining / (len(caps) - idx)
        take = min(k, fair)
        alloc[s] = take
        remaining -= take
    got = _alloc(spark, rows, budget)
    for s, want in alloc.items():
        assert got[s]["alloc_tokens"] == pytest.approx(want, abs=1e-6)
    assert sum(r["alloc_tokens"] for r in got.values()) == \
        pytest.approx(min(budget, sum(k for k, _ in caps)), abs=1e-6)
