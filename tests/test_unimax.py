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


def test_unimax_expand_whole_and_fractional_copies(spark):
    """unimax_expand materializes the allocation: integer epochs give
    every document exactly that many copies; fractional epochs give
    floor(e) copies plus an extra-copy subset whose observed share
    tracks frac(e); the draw is deterministic across repartitioning;
    unallocated/NULL-epoch sources vanish."""
    import pyspark.sql.functions as F

    from dump1090_db_stream_spark.operators.sampling import (
        unimax_expand,
    )

    docs = spark.createDataFrame(
        [(i, "two") for i in range(50)]
        + [(1000 + i, "half") for i in range(400)]
        + [(9000 + i, "ghost") for i in range(5)],
        ["doc_id", "source"])
    alloc = spark.createDataFrame(
        [("two", 2.0), ("half", 0.5), ("gone", 3.0), ("ghost", None)],
        "source string, epochs double")
    out = unimax_expand(docs, alloc, seed=11)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # integer epochs: every doc exactly twice, epoch_idx = 1, 2
    two = by_src["two"]
    assert len(two) == 100
    assert sorted((r["doc_id"], r["epoch_idx"]) for r in two) == \
        sorted((i, e) for i in range(50) for e in (1, 2))
    # fractional: each kept doc exactly once, share tracks 0.5
    half = by_src["half"]
    assert all(r["epoch_idx"] == 1 for r in half)
    assert 0.4 * 400 < len(half) < 0.6 * 400
    # NULL-epoch and absent sources contribute nothing
    assert set(by_src) == {"two", "half"}
    # deterministic under repartition
    again = unimax_expand(docs.repartition(7), alloc, seed=11)
    assert sorted(map(tuple, again.collect())) == \
        sorted(map(tuple, rows))
    # no shuffle: a single narrow stage over the corpus side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_unimax_expand_composes_with_allocation(spark):
    """End-to-end: expanding the real allocation yields, per source,
    total emitted rows == n_docs * floor(epochs) + |extra subset| and
    at least the capped sources' repetition structure."""
    from dump1090_db_stream_spark.operators.sampling import (
        unimax_allocation,
        unimax_expand,
    )

    docs = spark.createDataFrame(
        [(s * 1000 + i, f"s{s}", 100) for s in range(4)
         for i in range(20 * (s + 1))],
        ["doc_id", "source", "n_chars"])
    alloc = unimax_allocation(docs, budget_tokens=9_000,
                              max_epochs="1.5", token_col="n_chars")
    epochs = {r["source"]: r["epochs"] for r in alloc.collect()}
    out = unimax_expand(docs, alloc).groupBy("source").count()
    got = {r["source"]: r["count"] for r in out.collect()}
    import math
    for s, e in epochs.items():
        n_docs = 20 * (int(s[1]) + 1)
        lo = n_docs * math.floor(e)
        assert lo <= got.get(s, 0) <= lo + n_docs, (s, e, got.get(s))
