"""Sliding windows, trailing range frames, and gap filling
(operators.timeseries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.timeseries import (
    gap_fill,
    sliding_window_agg,
    trailing_range_stats,
)

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, uid, T0 + dt.timedelta(seconds=s), float(v))
         for i, (uid, s, v) in enumerate(rows)],
        ["event_id", "user_id", "ts", "value"])


def test_sliding_event_lands_in_width_over_slide_windows(spark):
    df = _df(spark, [(1, 720, 1.0)])  # 00:12:00
    got = sliding_window_agg(df, "ts", "10 minutes", "5 minutes", [],
                             F.count(F.lit(1)).alias("n")).collect()
    starts = sorted(r["window_start"] for r in got)
    # 00:12 falls in [00:05,00:15) and [00:10,00:20)
    assert starts == [T0 + dt.timedelta(minutes=5),
                      T0 + dt.timedelta(minutes=10)]
    assert all(r["n"] == 1 for r in got)
    assert all(r["window_end"] - r["window_start"]
               == dt.timedelta(minutes=10) for r in got)


def test_sliding_window_start_boundary_inclusive_end_exclusive(spark):
    # event exactly at 00:05:00 belongs to [00:05,00:15) and
    # [00:00,00:10), NOT to [00:-05,00:05)
    df = _df(spark, [(1, 300, 1.0)])
    got = sliding_window_agg(df, "ts", "10 minutes", "5 minutes", [],
                             F.count(F.lit(1)).alias("n")).collect()
    starts = sorted(r["window_start"] for r in got)
    assert starts == [T0, T0 + dt.timedelta(minutes=5)]


def test_trailing_frame_is_closed_on_both_ends(spark):
    # events at t=0 and t=3600: the 1h trailing frame of the second
    # INCLUDES the first (inclusive lower bound); at t=3601 it does not
    df = _df(spark, [(1, 0, 10.0), (1, 3600, 1.0), (1, 7201, 5.0)])
    got = {r["event_id"]: r for r in
           trailing_range_stats(df, trailing_seconds=3600).collect()}
    assert got[1]["n_trail"] == 2 and got[1]["sum_trail"] == 11.0
    assert got[2]["n_trail"] == 1 and got[2]["sum_trail"] == 5.0


def test_trailing_frame_partitions_by_user(spark):
    df = _df(spark, [(1, 0, 1.0), (2, 1, 100.0), (1, 2, 3.0)])
    got = {r["event_id"]: r for r in
           trailing_range_stats(df, trailing_seconds=3600).collect()}
    assert got[2]["n_trail"] == 2 and got[2]["sum_trail"] == 4.0
    assert got[1]["n_trail"] == 1 and got[1]["sum_trail"] == 100.0


def test_trailing_frame_ties_are_peers(spark):
    # two events with IDENTICAL ts: RANGE frames include peers, so both
    # rows see both values
    df = _df(spark, [(1, 100, 2.0), (1, 100, 3.0)])
    got = trailing_range_stats(df, trailing_seconds=10).collect()
    assert [r["n_trail"] for r in got] == [2, 2]
    assert [r["sum_trail"] for r in got] == [5.0, 5.0]


def _gap(spark, rows):
    """rows: (key, bucket_index, value) at 1h buckets."""
    return _df(spark, [(k, b * 3600, v) for (k, b, v) in rows]
               ).withColumnRenamed("user_id", "key")


def test_gap_fill_grid_covers_span_and_marks_gaps(spark):
    # key 1 observed in buckets 0 and 3 -> grid emits 0,1,2,3
    df = _gap(spark, [(1, 0, 1.0), (1, 3, 7.0)])
    got = sorted(gap_fill(df, "ts", ["key"], "value", 3600).collect(),
                 key=lambda r: r["bucket_start"])
    assert [r["bucket_start"] for r in got] == [
        T0 + dt.timedelta(hours=h) for h in range(4)]
    assert [r["n_obs"] for r in got] == [1, 0, 0, 1]
    assert [r["value_avg"] for r in got] == [1.0, None, None, 7.0]


def test_gap_fill_locf_carries_last_observation(spark):
    df = _gap(spark, [(1, 0, 1.0), (1, 2, 5.0), (1, 3, 9.0)])
    got = sorted(gap_fill(df, "ts", ["key"], "value", 3600).collect(),
                 key=lambda r: r["bucket_start"])
    # gap at bucket 1 carries bucket 0's value; observed buckets carry
    # their own
    assert [r["value_locf"] for r in got] == [1.0, 1.0, 5.0, 9.0]


def test_gap_fill_linear_interpolation_in_bucket_space(spark):
    # obs 1.0 at bucket 0 and 5.0 at bucket 4: interp 2,3,4 in between
    df = _gap(spark, [(1, 0, 1.0), (1, 4, 5.0)])
    got = sorted(gap_fill(df, "ts", ["key"], "value", 3600).collect(),
                 key=lambda r: r["bucket_start"])
    assert [r["value_interp"] for r in got] == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_gap_fill_buckets_average_and_keys_are_independent(spark):
    # two obs in one bucket -> avg; second key's span doesn't leak
    df = _gap(spark, [(1, 0, 2.0), (1, 0, 4.0), (2, 5, 1.0)])
    got = gap_fill(df, "ts", ["key"], "value", 3600).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r)
    assert len(by_key[1]) == 1
    assert by_key[1][0]["n_obs"] == 2 and by_key[1][0]["value_avg"] == 3.0
    assert len(by_key[2]) == 1  # single-obs key: one grid row
    assert by_key[2][0]["value_interp"] == 1.0


def test_gap_fill_empty_input_yields_empty_grid(spark):
    empty = spark.createDataFrame(
        [], "event_id long, key long, ts timestamp, value double")
    assert gap_fill(empty, "ts", ["key"], "value", 3600).count() == 0


def _iv(spark, rows):
    from pyspark.sql import functions as F

    return (spark.createDataFrame(rows, ["id", "st_s", "en_s"])
            .select("id",
                    F.timestamp_seconds("st_s").alias("st"),
                    F.timestamp_seconds("en_s").alias("en")))


def test_interval_overlap_pairs_known_layout(spark):
    from dump1090_db_stream_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    # a[0,100] overlaps b[50,150]; c[150,200] touches b at 150 (closed
    # -> counts, overlap 0); d[300,310] overlaps nothing; e is a POINT
    # interval inside a.
    iv = _iv(spark, [(1, 0, 100), (2, 50, 150), (3, 150, 200),
                     (4, 300, 310), (5, 70, 70)])
    got = {(r["id"], r["_b_id"]): r["overlap_sec"]
           for r in interval_overlap_pairs(
               iv, ["id"], "st", "en", bucket_seconds=60).collect()}
    assert got == {(1, 2): 50.0, (2, 3): 0.0, (1, 5): 0.0, (2, 5): 0.0}


def test_interval_overlap_pairs_exactly_once_across_buckets(spark):
    import pytest

    from dump1090_db_stream_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    # both intervals span MANY buckets and co-occupy several of them;
    # the later-start discipline must emit the pair exactly once
    iv = _iv(spark, [(1, 0, 1000), (2, 10, 990)])
    rows = interval_overlap_pairs(iv, ["id"], "st", "en",
                                  bucket_seconds=7).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id"], r["_b_id"], r["overlap_sec"]) == (1, 2, 980.0)
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_overlap_pairs(iv, ["id"], "st", "en", bucket_seconds=0)


def test_interval_overlap_pairs_matches_bruteforce(spark):
    import itertools

    from dump1090_db_stream_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    import random
    rng = random.Random(7)
    rows = [(i, s, s + rng.randrange(0, 500))
            for i, s in ((i, rng.randrange(0, 5000)) for i in range(80))]
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(sorted(rows), 2)
        if a[1] <= b[2] and b[1] <= a[2]
    }
    iv = _iv(spark, rows)
    got = {(r["id"], r["_b_id"])
           for r in interval_overlap_pairs(
               iv, ["id"], "st", "en", bucket_seconds=120).collect()}
    assert got == want


def test_interval_overlap_pairs_reversed_interval_policy(spark):
    import pytest

    from dump1090_db_stream_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    # id=9 is REVERSED (en < st): under the default policy it is
    # dropped before the explode (advisor r5: sequence() generates
    # descending ranges, so it silently landed on wrong buckets);
    # the clean rows still pair normally
    iv = _iv(spark, [(1, 0, 100), (2, 50, 150), (9, 500, 400)])
    got = {(r["id"], r["_b_id"])
           for r in interval_overlap_pairs(
               iv, ["id"], "st", "en", bucket_seconds=60).collect()}
    assert got == {(1, 2)}
    with pytest.raises(Exception, match="reversed interval"):
        interval_overlap_pairs(iv, ["id"], "st", "en", bucket_seconds=60,
                               on_reversed="raise").collect()
    with pytest.raises(ValueError, match="on_reversed"):
        interval_overlap_pairs(iv, ["id"], "st", "en", bucket_seconds=60,
                               on_reversed="ignore")
