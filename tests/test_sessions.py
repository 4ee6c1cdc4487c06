"""Generic session operators: salted band join equivalence + dedup."""

from __future__ import annotations

import datetime

import pytest

from dump1090_db_stream_spark.operators.sessions import (
    band_join,
    daily_sessions,
    dedup_by_key,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    base = datetime.datetime(2024, 1, 1, 12, 0)
    for u in range(3):
        for m in range(8):
            rows.append((u, base + datetime.timedelta(minutes=4 * m),
                         float(m), "click" if m % 2 else "view"))
    return spark.createDataFrame(rows, ["user_id", "ts", "value", "event_type"])


def test_salted_band_join_equivalence(events):
    fixes = events.select("user_id", "ts", "value")
    sessions = daily_sessions(events, key="user_id", label="event_type", ts="ts")
    plain = band_join(fixes, sessions, key="user_id", ts="ts")
    salted = band_join(fixes, sessions, key="user_id", ts="ts", salt_buckets=4)
    assert plain.columns == salted.columns
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_dedup_by_key_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 5), (2, "b", 7)], ["k", "g", "v"])
    out = dedup_by_key(df, keys=["k"], tiebreak=["v"]).collect()
    got = {r.k: r.v for r in out}
    assert got == {1: 5, 2: 7}  # lowest tiebreak wins


def test_dedup_by_key_arbitrary_without_tiebreak(spark):
    df = spark.createDataFrame([(1, "x"), (1, "y")], ["k", "v"])
    assert dedup_by_key(df, keys=["k"]).count() == 1
