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


def test_asof_join_matches_naive(spark):
    from dump1090_db_stream_spark.operators.sessions import asof_join

    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 25, "t2"), ("B", 5, "t3"), ("B", 6, "t4")],
        ["sym", "t", "trade"])
    quotes = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 10, 2.0), ("A", 20, 3.0),
         ("B", 7, 9.0), ("C", 1, 5.0)],
        ["sym", "t", "px"])
    from pyspark.sql import functions as F

    q = (quotes.withColumnRenamed("t", "t_q")
         .withColumn("t_r", F.col("t_q")))
    out = {(r.sym, r.t): (r.px_asof, r.t_r_asof) for r in asof_join(
        trades, q, key="sym", left_ts="t", right_ts="t_q",
        right_cols=["px", "t_r"]).collect()}
    assert out[("A", 10)] == (2.0, 10)   # inclusive at equal ts
    assert out[("A", 25)] == (3.0, 20)   # latest preceding
    assert out[("B", 5)] == (None, None)  # nothing precedes
    assert out[("B", 6)] == (None, None)
    assert len(out) == 4                  # left rows preserved 1:1


def test_asof_join_single_shuffle(spark):
    from dump1090_db_stream_spark.operators.sessions import asof_join

    left = spark.createDataFrame([("A", 10)], ["k", "t"])
    right = spark.createDataFrame([("A", 5, 1.0)], ["k", "t", "v"])
    plan = (asof_join(left, right, key="k", left_ts="t")
            ._jdf.queryExecution().executedPlan().toString())
    import re
    shuffles = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert shuffles == 1  # the window's — never a range-join explosion
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_value_runs_coalesces_and_half_open_intervals(spark):
    import datetime as dt

    from dump1090_db_stream_spark.operators.sessions import value_runs

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, t0 + dt.timedelta(hours=i), v)
            for i, v in enumerate(["a", "a", "b", "b", "b", "a"])]
    df = spark.createDataFrame(rows, ["event_id", "key", "ts", "v"])
    got = sorted(value_runs(df, "key", "ts", "v", "event_id").collect(),
                 key=lambda r: r["run"])
    assert [(r["v"], r["run"], r["n_rows"]) for r in got] == [
        ("a", 1, 2), ("b", 2, 3), ("a", 3, 1)]
    # half-open chaining: each valid_to is the next run's valid_from;
    # the current (last) run stays open
    assert got[0]["valid_to"] == got[1]["valid_from"]
    assert got[1]["valid_to"] == got[2]["valid_from"]
    assert got[2]["valid_to"] is None


def test_value_runs_null_values_coalesce_and_first_row_is_run_one(spark):
    import datetime as dt

    from dump1090_db_stream_spark.operators.sessions import value_runs

    t0 = dt.datetime(2024, 1, 1)
    rows = [(0, 1, t0, None), (1, 1, t0 + dt.timedelta(hours=1), None),
            (2, 1, t0 + dt.timedelta(hours=2), "x"),
            (3, 2, t0, "y")]
    df = spark.createDataFrame(rows, ["event_id", "key", "ts", "v"])
    got = {(r["key"], r["run"]): r for r in
           value_runs(df, "key", "ts", "v", "event_id").collect()}
    # NULL-valued run coalesces like any value; every key starts at run 1
    assert got[(1, 1)]["n_rows"] == 2 and got[(1, 1)]["v"] is None
    assert got[(1, 2)]["v"] == "x"
    assert got[(2, 1)]["v"] == "y" and len(got) == 3


def test_value_runs_ties_break_on_tie_col(spark):
    import datetime as dt

    from dump1090_db_stream_spark.operators.sessions import value_runs

    t0 = dt.datetime(2024, 1, 1)
    # identical ts: event_id order makes a,b,a -> three runs
    rows = [(0, 1, t0, "a"), (1, 1, t0, "b"), (2, 1, t0, "a")]
    df = spark.createDataFrame(rows, ["event_id", "key", "ts", "v"])
    got = value_runs(df, "key", "ts", "v", "event_id").collect()
    assert sorted(r["run"] for r in got) == [1, 2, 3]


def test_cap_events_per_key_first_and_last(spark):
    import datetime as dt

    from dump1090_db_stream_spark.operators.sessions import (
        cap_events_per_key,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, uid, t0 + dt.timedelta(seconds=i), f"e{i}")
            for uid in (1, 2) for i in range(uid * 10, uid * 10 + 5)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "v"])
    first = cap_events_per_key(df, "user_id", "ts", 2,
                               tie_col="event_id").collect()
    got = {r["user_id"]: sorted(x["event_id"] for x in first
                                if x["user_id"] == r["user_id"])
           for r in first}
    assert got == {1: [10, 11], 2: [20, 21]}
    last = cap_events_per_key(df, "user_id", "ts", 2,
                              tie_col="event_id", keep="last").collect()
    got = {r["user_id"]: sorted(x["event_id"] for x in last
                                if x["user_id"] == r["user_id"])
           for r in last}
    assert got == {1: [13, 14], 2: [23, 24]}


def test_cap_events_per_key_tie_determinism_and_validation(spark):
    import datetime as dt

    import pytest

    from dump1090_db_stream_spark.operators.sessions import (
        cap_events_per_key,
    )

    t0 = dt.datetime(2024, 1, 1)
    # all timestamps equal: tie_col decides the cut deterministically
    rows = [(i, 1, t0) for i in (5, 3, 9, 1, 7)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = sorted(r["event_id"] for r in cap_events_per_key(
        df, ["user_id"], "ts", 3, tie_col="event_id").collect())
    assert got == [1, 3, 5]
    with pytest.raises(ValueError, match="max_rows"):
        cap_events_per_key(df, "user_id", "ts", 0)
    with pytest.raises(ValueError, match="keep"):
        cap_events_per_key(df, "user_id", "ts", 1, keep="middle")


def test_cap_events_per_key_heavy_key_single_shuffle(spark):
    """The planted 1e6-events-one-user shape: the cap is a streaming
    row_number (O(1) task state), one Exchange, and a following groupBy
    on the same key adds NO second Exchange."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.sessions import (
        cap_events_per_key,
    )

    # user 1 owns 1e6 - 4 events; four light users own one each (a
    # non-constant key keeps the Exchange in the plan)
    df = spark.range(1_000_000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 4, F.col("id") + 100)
         .otherwise(F.lit(1)).alias("user_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"))
    capped = cap_events_per_key(df, "user_id", "ts", 100,
                                tie_col="event_id")
    agg = capped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("event_id").alias("max_id"))
    got = {r["user_id"]: (r["n"], r["max_id"]) for r in agg.collect()}
    assert got[1] == (100, 103)  # earliest 100 of the heavy user
    assert all(got[u] == (1, u - 100) for u in (100, 101, 102, 103))
    final_plan = (agg._jdf.queryExecution().executedPlan().toString()
                  .split("== Initial Plan ==")[0])
    assert final_plan.count("Exchange") == 1
    # Spark's WindowGroupLimit pushes the rank<=100 cap MAP-SIDE: each
    # input partition pre-caps to 100 rows/key before the shuffle, so
    # the exchange itself never carries the heavy user's full history
    assert "WindowGroupLimit" in final_plan
    assert "Partial" in final_plan.split("WindowGroupLimit")[-1] or \
        final_plan.count("WindowGroupLimit") == 2


def test_sessionize_gap_boundaries_and_numbering(spark):
    import datetime as dt

    from dump1090_db_stream_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)
    # user 1: gaps of exactly 60s (continues), 61s (breaks), 1s
    rows = [(0, 1, t0),
            (1, 1, t0 + dt.timedelta(seconds=60)),     # dt == gap: same
            (2, 1, t0 + dt.timedelta(seconds=121)),    # dt = 61 > gap: new
            (3, 1, t0 + dt.timedelta(seconds=122)),
            (4, 2, t0 + dt.timedelta(seconds=500))]    # other key: own ids
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {r["event_id"]: r["session_id"] for r in
           sessionize(df, "user_id", "ts", 60,
                      tie_col="event_id").collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 1}


def test_sessionize_tie_break_and_validation(spark):
    import datetime as dt

    import pytest

    from dump1090_db_stream_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)
    # equal timestamps: zero dt never breaks; ordering still total
    df = spark.createDataFrame(
        [(i, 1, t0) for i in (3, 1, 2)], ["event_id", "user_id", "ts"])
    got = sessionize(df, "user_id", "ts", 10, tie_col="event_id").collect()
    assert {r["session_id"] for r in got} == {1}
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(df, "user_id", "ts", 0)


def test_sessionize_single_exchange_plan(spark):
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.sessions import sessionize

    df = spark.range(10_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 50).alias("user_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 7).alias("ts"))
    out = sessionize(df, "user_id", "ts", 60, tie_col="event_id")
    out.write.format("noop").mode("overwrite").save()
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    # flag window and running sum share one spec: one Exchange, one Sort
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1
