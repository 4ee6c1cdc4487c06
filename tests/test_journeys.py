"""Cohort retention and transition matrices (operators.journeys)."""

from __future__ import annotations

import datetime as dt

from dump1090_db_stream_spark.operators.journeys import (
    cohort_retention,
    event_transitions,
)

T0 = dt.datetime(2024, 1, 1)
DAY = 86400


def _ev(spark, rows):
    """rows: (user_id, day_offset_float, event_type)."""
    return spark.createDataFrame(
        [(i, uid, T0 + dt.timedelta(seconds=int(d * DAY)), et)
         for i, (uid, d, et) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type"])


def test_retention_offsets_and_rates(spark):
    # user 1: first day 0, also active day 2; user 2: first day 0 only;
    # user 3: first day 1
    df = _ev(spark, [(1, 0.1, "a"), (1, 2.5, "a"), (2, 0.7, "a"),
                     (3, 1.2, "a")])
    got = {(r["cohort_start"], r["period_offset"]): r
           for r in cohort_retention(df, period_seconds=DAY).collect()}
    d0, d1 = T0, T0 + dt.timedelta(days=1)
    assert got[(d0, 0)]["n_active"] == 2
    assert got[(d0, 0)]["n_cohort"] == 2
    assert got[(d0, 0)]["retention"] == 1.0
    assert got[(d0, 2)]["n_active"] == 1
    assert got[(d0, 2)]["retention"] == 0.5
    assert got[(d1, 0)]["n_cohort"] == 1
    # no activity -> no row (triangular, not dense)
    assert (d0, 1) not in got and len(got) == 3


def test_retention_same_period_activity_counts_once(spark):
    # three events in the cohort period still count the user once
    df = _ev(spark, [(1, 0.1, "a"), (1, 0.5, "a"), (1, 0.9, "a")])
    got = cohort_retention(df, period_seconds=DAY).collect()
    assert len(got) == 1
    assert got[0]["n_active"] == 1 and got[0]["n_cohort"] == 1


def test_transitions_counts_and_row_stochastic_probs(spark):
    # user 1: a->b->b->c ; user 2: a->c
    df = _ev(spark, [(1, 0.0, "a"), (1, 0.1, "b"), (1, 0.2, "b"),
                     (1, 0.3, "c"), (2, 0.0, "a"), (2, 0.1, "c")])
    got = {(r["from_state"], r["to_type"]): r
           for r in event_transitions(df).collect()}
    assert got[("a", "b")]["n_transitions"] == 1
    assert got[("a", "c")]["n_transitions"] == 1
    assert got[("a", "b")]["prob"] == 0.5
    assert got[("b", "b")]["prob"] == 0.5
    assert got[("b", "c")]["prob"] == 0.5
    # last event per user emits no pair
    assert ("c", None) not in got and len(got) == 4


def test_transitions_tie_breaks_on_event_id(spark):
    # identical ts: order falls back to event_id (insertion order here)
    df = _ev(spark, [(1, 0.0, "x"), (1, 0.0, "y"), (1, 0.0, "z")])
    got = {(r["from_state"], r["to_type"])
           for r in event_transitions(df).collect()}
    assert got == {("x", "y"), ("y", "z")}


def test_trailing_actives_window_and_clip(spark):
    from dump1090_db_stream_spark.operators.journeys import (
        trailing_active_users,
    )

    # user 1 active day 0; user 2 active day 2; span = days 0..2 with a
    # 3-day window: day0 sees {1}, day1 sees {1}, day2 sees {1,2};
    # days 3-4 (phantom tails of user 2's vote) are clipped
    df = _ev(spark, [(1, 0.5, "a"), (2, 2.5, "a")])
    got = {r["day"]: r["n_active"]
           for r in trailing_active_users(df, window_days=3).collect()}
    assert got == {T0: 1, T0 + dt.timedelta(days=1): 1,
                   T0 + dt.timedelta(days=2): 2}


def test_trailing_actives_dense_zero_for_empty_windows(spark):
    from dump1090_db_stream_spark.operators.journeys import (
        trailing_active_users,
    )

    # activity on day 0 and day 5 with a 2-day window: days 2-4 have
    # EMPTY trailing windows and must emit n_active = 0, not vanish
    df = _ev(spark, [(1, 0.5, "a"), (2, 5.5, "a")])
    got = {r["day"]: r["n_active"]
           for r in trailing_active_users(df, window_days=2).collect()}
    assert len(got) == 6  # dense: every day in [0, 5]
    assert got[T0 + dt.timedelta(days=1)] == 1  # trailing edge of day 0
    assert got[T0 + dt.timedelta(days=2)] == 0
    assert got[T0 + dt.timedelta(days=4)] == 0
    assert got[T0 + dt.timedelta(days=5)] == 1


def test_trailing_actives_counts_user_once_per_window(spark):
    from dump1090_db_stream_spark.operators.journeys import (
        trailing_active_users,
    )

    # one user active twice on day 0 and once on day 1: every window
    # still counts them once
    df = _ev(spark, [(1, 0.1, "a"), (1, 0.6, "a"), (1, 1.2, "a")])
    got = {r["day"]: r["n_active"]
           for r in trailing_active_users(df, window_days=7).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 2  # clipped to the observed 2-day span


def test_top_paths_ranks_and_keeps_ragged_users(spark):
    from dump1090_db_stream_spark.operators.journeys import top_paths

    # users 1,2: a>b>c ; user 3: a>b>c>d (slice keeps first 3);
    # user 4 ragged with only a>b
    rows = []
    for uid in (1, 2):
        rows += [(uid, 0.1, "a"), (uid, 0.2, "b"), (uid, 0.3, "c")]
    rows += [(3, 0.1, "a"), (3, 0.2, "b"), (3, 0.3, "c"), (3, 0.4, "d")]
    rows += [(4, 0.1, "a"), (4, 0.2, "b")]
    got = {r["path"]: r for r in
           top_paths(_ev(spark, rows), n_steps=3, k=10).collect()}
    assert got["a>b>c"]["n_users"] == 3 and got["a>b>c"]["rank"] == 1
    assert got["a>b"]["n_users"] == 1 and got["a>b"]["rank"] == 2


def test_top_paths_equals_unbounded_reference_form(spark):
    """The r4 implementation collected each user's FULL history and
    sliced after aggregation; r5 pre-caps with cap_events_per_key so
    aggregation state is O(n_steps)/user. Same answer, proven here
    against the old form inlined as the reference."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.journeys import top_paths

    rows = [(uid, (uid * 7 + j * 13) % 50 / 10.0,
             "abcde"[(uid + j) % 5])
            for uid in range(1, 30) for j in range(uid % 9 + 1)]
    df = _ev(spark, rows)
    got = sorted((r["path"], r["n_users"], r["rank"]) for r in
                 top_paths(df, n_steps=3, k=25).collect())

    seq = F.array_sort(F.collect_list(F.struct(
        F.col("ts").alias("t"), F.col("event_id").alias("k"),
        F.col("event_type").alias("e"))))
    path = F.array_join(
        F.transform(F.slice(seq, 1, 3), lambda s: s["e"]), ">")
    ref = (df.groupBy(F.col("user_id").alias("_id"))
           .agg(path.alias("path"))
           .groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
           .orderBy(F.col("n_users").desc(), "path").limit(25)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.col("n_users").desc(), "path"))))
    want = sorted((r["path"], r["n_users"], r["rank"])
                  for r in ref.collect())
    assert got == want


def test_top_paths_heavy_user_stays_bounded(spark):
    """One user owns 1e6 events (the 100 TB skew shape): the capped
    aggregation state is 3 structs for them, not 1e6 — the query must
    complete and the heavy user must contribute exactly one 3-step
    path. The old collect-then-slice form buffered the full history
    per user in one aggregate state."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.journeys import top_paths

    heavy = spark.range(1_000_000).select(
        F.col("id").alias("event_id"),
        F.lit(777).alias("user_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        F.concat(F.lit("e"), (F.col("id") % 4)).alias("event_type"))
    light = spark.range(5).select(
        (F.col("id") + 2_000_000).alias("event_id"),
        F.col("id").alias("user_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        F.lit("x").alias("event_type"))
    got = {r["path"]: r["n_users"] for r in
           top_paths(heavy.union(light), n_steps=3, k=10).collect()}
    assert got == {"x": 5, "e0>e1>e2": 1}


def test_top_paths_k_limit_and_tie_order(spark):
    from dump1090_db_stream_spark.operators.journeys import top_paths

    # three single-user paths, k=2: ties broken by path ascending
    rows = [(1, 0.1, "a"), (2, 0.1, "b"), (3, 0.1, "c")]
    got = top_paths(_ev(spark, rows), n_steps=3, k=2).collect()
    assert [(r["path"], r["rank"]) for r in
            sorted(got, key=lambda r: r["rank"])] == [("a", 1), ("b", 2)]


def test_journeys_operators_handle_empty_input(spark):
    from dump1090_db_stream_spark.operators.journeys import (
        cohort_retention,
        event_transitions,
        top_paths,
        trailing_active_users,
    )

    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string")
    assert cohort_retention(empty).count() == 0
    assert event_transitions(empty).count() == 0
    assert top_paths(empty).count() == 0
    # span aggregate emits one NULL row on empty input; the sequence
    # explode of a NULL span must yield zero rows, not an error
    assert trailing_active_users(empty).count() == 0


def test_trailing_actives_rejects_nonpositive_window(spark):
    import pytest

    from dump1090_db_stream_spark.operators.journeys import (
        trailing_active_users,
    )

    df = _ev(spark, [(1, 0.5, "a")])
    with pytest.raises(ValueError, match="window_days"):
        trailing_active_users(df, window_days=0)


def test_trailing_actives_segmented_by_key(spark):
    from dump1090_db_stream_spark.operators.journeys import (
        trailing_active_users,
    )

    # type "a": user 1 on days 0 and 2; type "b": users 1,2 on day 1 —
    # each segment gets its own dense span and counts
    df = _ev(spark, [(1, 0.5, "a"), (1, 2.5, "a"), (1, 1.5, "b"),
                     (2, 1.2, "b")])
    got = {(r["event_type"], r["day"]): r["n_active"]
           for r in trailing_active_users(
               df, window_days=2, keys=["event_type"]).collect()}
    assert got[("a", T0)] == 1
    assert got[("a", T0 + dt.timedelta(days=1))] == 1  # trailing edge
    assert got[("a", T0 + dt.timedelta(days=2))] == 1
    # segment b spans ONLY day 1 (its own min/max), count 2
    assert got[("b", T0 + dt.timedelta(days=1))] == 2
    assert len(got) == 4


def test_transitions_second_order_states(spark):
    # user 1: a,b,c,a -> states a>b -> c, b>c -> a; user 2's single
    # pair has no order-2 history and feeds nothing
    df = _ev(spark, [(1, 0.0, "a"), (1, 0.1, "b"), (1, 0.2, "c"),
                     (1, 0.3, "a"), (2, 0.0, "x"), (2, 0.1, "y")])
    got = {(r["from_state"], r["to_type"]): r
           for r in event_transitions(df, order=2).collect()}
    assert set(got) == {("a>b", "c"), ("b>c", "a")}
    assert all(r["prob"] == 1.0 for r in got.values())


def test_transitions_null_types_feed_no_state(spark):
    # NULL event types must not shrink the state (concat_ws drops
    # NULLs) or appear as a state themselves — such rows feed nothing
    df = spark.createDataFrame(
        [(0, 1, T0, "a"), (1, 1, T0 + dt.timedelta(hours=1), None),
         (2, 1, T0 + dt.timedelta(hours=2), "b"),
         (3, 1, T0 + dt.timedelta(hours=3), "c")],
        "event_id long, user_id long, ts timestamp, event_type string")
    got1 = {(r["from_state"], r["to_type"])
            for r in event_transitions(df).collect()}
    # order 1: 'a'->NULL filtered (to_type null? no: to_type='b'? lead
    # of row0 is NULL-typed row -> to_type IS NULL -> dropped), the
    # NULL-typed row itself has no state, b->c survives
    assert got1 == {("b", "c")}
    got2 = {(r["from_state"], r["to_type"])
            for r in event_transitions(df, order=2).collect()}
    # order 2: every 2-window containing the NULL is invalid; only
    # b>c would need a successor and has none
    assert got2 == set()


def test_survival_curve_kaplan_meier_hand_case(spark):
    from datetime import datetime as dt

    from dump1090_db_stream_spark.operators.journeys import survival_curve

    def ev(u, day):
        return (u, dt(2024, 1, 1 + day))

    # window end = Jan 21 (user D's last). censor_gap=3:
    #   A: days 0..2  -> lifetime 2, last Jan 3  -> churned
    #   B: days 0..5  -> lifetime 5, last Jan 6  -> churned
    #   C: days 0..5  -> lifetime 5, last Jan 6  -> churned
    #   D: days 0..20 -> lifetime 20, last Jan 21 -> CENSORED (gap 0)
    rows = ([ev("A", d) for d in (0, 1, 2)]
            + [ev("B", d) for d in (0, 3, 5)]
            + [ev("C", d) for d in (0, 5)]
            + [ev("D", d) for d in (0, 10, 20)])
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r["t_day"]: r for r in survival_curve(
        df, censor_gap_days=3).collect()}
    # day 2: n_risk 4, 1 churn -> S = 3/4
    assert (got[2]["n_risk"], got[2]["churned"]) == (4, 1)
    assert got[2]["survival"] == 0.75
    # day 5: n_risk 3, 2 churns -> S = 0.75 * (1 - 2/3) = 0.25
    assert (got[5]["n_risk"], got[5]["churned"]) == (3, 2)
    assert got[5]["survival"] == 0.25
    # day 20: D censored, no churn -> survival UNCHANGED (the KM point:
    # naive retention would have counted D as churned here)
    assert (got[20]["censored"], got[20]["churned"]) == (1, 0)
    assert got[20]["survival"] == 0.25


def test_survival_curve_full_churn_day_hits_zero(spark):
    """churned == n_risk (everyone still at risk churns the same
    lifetime-day): 1 - d/n is exactly 0 and the curve must drop to
    0.0 — F.log(0) is NULL in Spark and window sums skip NULLs, so
    without the explicit -inf branch the curve silently held its
    prior value (r6 ADVICE)."""
    from datetime import datetime as dt

    import pytest

    from dump1090_db_stream_spark.operators.journeys import survival_curve

    # A churns at lifetime 1; B and C both churn at lifetime 3 — at
    # day 3 the at-risk set is exactly {B, C} and both churn.
    # censor_gap=0 => nobody is censored.
    rows = [("A", dt(2024, 1, 1)), ("A", dt(2024, 1, 2)),
            ("B", dt(2024, 1, 1)), ("B", dt(2024, 1, 4)),
            ("C", dt(2024, 1, 1)), ("C", dt(2024, 1, 4))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r["t_day"]: r for r in survival_curve(
        df, censor_gap_days=0).collect()}
    assert (got[1]["n_risk"], got[1]["churned"]) == (3, 1)
    assert got[1]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert (got[3]["n_risk"], got[3]["churned"]) == (2, 2)
    assert got[3]["survival"] == 0.0
