"""Model-eval analytics (operators.evaluation): exact tie-aware AUC,
reliability bins, ECE — checked against closed-form hand computations."""

from __future__ import annotations

import pytest


def test_auc_exact_values_and_ties(spark):
    from dump1090_db_stream_spark.operators.evaluation import auc_score

    # perfect separation -> 1.0; reversed -> 0.0; random-ish -> 0.5
    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        ["s", "y"])
    assert auc_score(perfect, "s", "y").collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame(
        [(0.1, True), (0.2, False)], ["s", "y"])
    assert auc_score(rev, "s", "y").collect()[0]["auc"] == 0.0
    # tie handling: a tied pos/neg pair contributes exactly 1/2
    tied = spark.createDataFrame(
        [(0.5, True), (0.5, False)], ["s", "y"])
    assert auc_score(tied, "s", "y").collect()[0]["auc"] == 0.5
    # hand-computed mixed case: scores .1-,.2+,.3-,.3+,.4+
    # ranks 1..5, tie group {.3} -> avg rank 3.5
    # pos ranks: 2, 3.5, 5 -> sum 10.5; AUC=(10.5-3*4/2)/(3*2)=0.75
    mixed = spark.createDataFrame(
        [(0.1, False), (0.2, True), (0.3, False), (0.3, True),
         (0.4, True)], ["s", "y"])
    r = auc_score(mixed, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (3, 2, 0.75)
    # NULLs carry no information
    nulls = spark.createDataFrame(
        [(None, True), (0.9, None), (0.9, True), (0.1, False)],
        "s double, y boolean")
    assert auc_score(nulls, "s", "y").collect()[0]["auc"] == 1.0


def test_calibration_bins_and_ece(spark):
    from dump1090_db_stream_spark.operators.evaluation import (
        calibration_bins,
        expected_calibration_error,
    )

    # bin 9 (scores .9x): 4 rows, conf .925, acc .75
    # bin 0 (scores .0x): 4 rows, conf .05, acc 0.25
    rows = [(0.9, True), (0.9, True), (0.95, True), (0.95, False),
            (0.05, False), (0.05, False), (0.05, False), (0.05, True),
            (1.0, True)]  # exactly 1.0 -> top bin, not bin 10
    df = spark.createDataFrame(rows, ["s", "y"])
    bins = {r["bin"]: r for r in calibration_bins(df, "s", "y").collect()}
    assert set(bins) == {0, 9}
    assert bins[9]["n"] == 5 and bins[0]["n"] == 4
    assert bins[0]["confidence"] == 0.05 and bins[0]["accuracy"] == 0.25
    e = expected_calibration_error(df, "s", "y").collect()[0]
    # ECE = (5*|4/5-conf9| + 4*|.25-.05|)/9 with conf9=(0.9*2+0.95*2+1)/5
    conf9 = round((0.9 * 2 + 0.95 * 2 + 1.0) / 5, 6)
    want = round((5 * abs(0.8 - conf9) + 4 * 0.2) / 9, 6)
    assert e["ece"] == pytest.approx(want, abs=1e-6) and e["n"] == 9
    with pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "s", "y", n_bins=0)


def test_auc_single_class_is_null_not_silent(spark):
    """AUC is undefined when only one class is present: the row must
    carry an explicit NULL (try_divide), never a crash — and the
    counts still say WHICH class is missing (r6 ADVICE)."""
    from dump1090_db_stream_spark.operators.evaluation import auc_score

    pos_only = spark.createDataFrame(
        [(0.9, True), (0.1, True)], ["s", "y"])
    r = auc_score(pos_only, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 0, None)
    neg_only = spark.createDataFrame(
        [(0.9, False), (0.1, False)], ["s", "y"])
    r = auc_score(neg_only, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (0, 2, None)


def test_auc_plan_aggregates_before_global_sort(spark):
    """The r7 scale fix: the ordering window must run over the
    distinct-score relation (post-groupBy), never input-grain rows —
    pinned by the same detector the registry-wide gate uses."""
    from test_plans import plan_of, single_partition_window_sites

    from dump1090_db_stream_spark.operators.evaluation import auc_score

    df = spark.createDataFrame(
        [(float(i % 7) / 7, i % 3 == 0) for i in range(100)], ["s", "y"])
    assert single_partition_window_sites(plan_of(auc_score(df, "s", "y"))) == []
