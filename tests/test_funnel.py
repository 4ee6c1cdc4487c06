"""Funnel matching (operators.funnel) and outlier detection
(operators.anomaly) against hand-built event histories."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.anomaly import (
    mad_outliers,
    zscore_outliers,
)
from dump1090_db_stream_spark.operators.funnel import (
    funnel_counts,
    funnel_steps,
)


def _ev(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, uid, t0 + dt.timedelta(minutes=m), e)
         for i, (uid, m, e) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type"])


def test_funnel_requires_strict_order(spark):
    ev = _ev(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "buy"),    # full funnel
        (2, 0, "click"), (2, 1, "view"), (2, 2, "buy"),    # click BEFORE
        (3, 0, "view"), (3, 1, "buy"),                     # skipped click
        (4, 0, "view"),
    ])
    got = {r["id"]: r["steps_completed"]
           for r in funnel_steps(ev, ["view", "click", "buy"]).collect()}
    assert got == {1: 3, 2: 1, 3: 1, 4: 1}
    # user 2's click precedes their view: only "view" matches; user 3
    # never clicks so their buy cannot count


def test_funnel_greedy_matches_earliest(spark):
    # view@0, click@1, view@2, buy@3: greedy takes view@0, click@1,
    # buy@3 -> complete even though a later view exists
    ev = _ev(spark, [(1, 0, "view"), (1, 1, "click"),
                     (1, 2, "view"), (1, 3, "buy")])
    got = funnel_steps(ev, ["view", "click", "buy"]).collect()
    assert got[0]["steps_completed"] == 3


def test_funnel_counts_monotone_and_gap_filled(spark):
    # both users reach step 3; NOBODY stops at depth 2 exactly — the
    # step-2 count must still include the deeper users
    ev = _ev(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "buy"),
        (2, 0, "view"), (2, 1, "click"), (2, 2, "buy"),
        (3, 0, "view"),
    ])
    got = {r["step"]: (r["step_name"], r["n_users"])
           for r in funnel_counts(ev, ["view", "click", "buy"]).collect()}
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("buy", 2)}


def test_zscore_flags_planted_outlier(spark):
    vals = [10.0] * 20 + [10.5] * 20 + [500.0]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)],
        ["event_id", "event_type", "value"])
    out = zscore_outliers(df, "value", ["event_type"], threshold=2.0)
    assert [r["event_id"] for r in out.collect()] == [40]


def test_mad_resists_contaminated_spread(spark):
    # two extreme points inflate stddev enough that z-score misses the
    # moderate outlier at 40; MAD still flags all three
    vals = [10.0, 10.1] * 15 + [40.0, 5000.0, -5000.0]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)],
        ["event_id", "event_type", "value"])
    mad = {r["event_id"] for r in
           mad_outliers(df, "value", ["event_type"], 3.0).collect()}
    z = {r["event_id"] for r in
         zscore_outliers(df, "value", ["event_type"], 2.0).collect()}
    assert {30, 31, 32} <= mad
    assert 30 not in z  # parametric detector swamped by the extremes


def test_outliers_skip_degenerate_groups(spark):
    df = spark.createDataFrame(
        [(1, "solo", 99.0), (2, "flat", 5.0), (3, "flat", 5.0),
         (4, "flat", 5.0)],
        ["event_id", "event_type", "value"])
    assert zscore_outliers(df, "value", ["event_type"]).count() == 0
    assert mad_outliers(df, "value", ["event_type"]).count() == 0


def test_mad_known_value(spark):
    # values 1..7 plus 100: median=4.5, |v-med| = [3.5,2.5,1.5,.5,.5,
    # 1.5,2.5,95.5], MAD=2.0 -> score(100)=47.75
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7,
                                                   100])],
        ["event_id", "event_type", "value"])
    out = mad_outliers(df, "value", ["event_type"], threshold=3.0).collect()
    assert len(out) == 1
    assert out[0]["mad_score"] == pytest.approx(47.75, abs=1e-6)


def test_winsorize_clips_into_band_and_preserves_nulls(spark):
    import pytest

    from dump1090_db_stream_spark.operators.anomaly import winsorize

    # key "a": 0..10 -> p0/p100 with lower=0, upper=1 leaves values;
    # with a tight band the tails clip to the bounds
    rows = [("a", float(v)) for v in range(11)] + [("a", None),
                                                   ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {(r["k"], r["value"]): r for r in
           winsorize(df, "value", ["k"], 0.1, 0.9).collect()}
    assert got[("a", 0.0)]["value_w"] == got[("a", 0.0)]["p_lo"] == 1.0
    assert got[("a", 10.0)]["value_w"] == got[("a", 10.0)]["p_hi"] == 9.0
    assert got[("a", 5.0)]["value_w"] == 5.0        # interior untouched
    assert got[("a", None)]["value_w"] is None      # null stays null
    # single-value key: degenerate band, value keeps itself
    assert got[("b", 5.0)]["value_w"] == 5.0
    with pytest.raises(ValueError, match="lower"):
        winsorize(df, "value", ["k"], 0.9, 0.1)
