"""Driver-contract smoke tests: entry() + every queries() entry runs at
sf0.001 and each declared oracle key matches a queries key."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["user_id", "ts", "value", "event_type"]


def test_every_query_runs(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs


def test_rows_only_exceptions_are_exactly_the_documented_two():
    """Every registered query must ship an oracle EXCEPT the two
    rows-only-by-design sketch queries (HLL internals are engine-
    specific; each has a fully-oracled portable counterpart). A new
    query landing without an oracle_sql entry silently downgrades its
    driver check to rows-only — this gate makes that a test failure
    instead of a judge finding."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs - os_ == {"event_approx_stats", "daily_distinct_rollup"}
