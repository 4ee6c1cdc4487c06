"""filter_funnel (operators.cleaning): cumulative-conjunction survival
report — hand-computed counts, fail-closed NULLs, param validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _run(spark, rows, stages):
    from dump1090_db_stream_spark.operators.cleaning import filter_funnel

    df = spark.createDataFrame(rows, "v int, lang string")
    out = filter_funnel(df, stages)
    return {r["stage"]: r for r in out.collect()}


def test_hand_computed_cumulative_counts(spark):
    rows = [(1, "en"), (2, "en"), (3, "de"), (10, "en"), (20, None)]
    got = _run(spark, rows, [
        ("small", F.col("v") < 10),        # 1,2,3 pass
        ("english", F.col("lang") == "en"),  # of those: 1,2
    ])
    assert (got["small"]["stage_idx"], got["small"]["n_in"],
            got["small"]["n_out"], got["small"]["n_dropped"]) == \
        (1, 5, 3, 2)
    assert got["small"]["survival_rate"] == 0.6
    assert (got["english"]["stage_idx"], got["english"]["n_in"],
            got["english"]["n_out"]) == (2, 3, 2)
    # a doc failing stage 1 never reaches stage 2, even if it would
    # pass it (v=10/en and v=20/None are not in stage 2's n_in)


def test_null_predicate_fails_closed(spark):
    """A NULL signal must not pass a gate inspecting that signal."""
    rows = [(1, "en"), (2, None), (3, "en")]
    got = _run(spark, rows, [("english", F.col("lang") == "en")])
    assert got["english"]["n_out"] == 2          # the NULL row dropped


def test_empty_input_yields_null_rates(spark):
    got = _run(spark, [], [("any", F.lit(True)), ("none", F.lit(False))])
    assert got["any"]["n_in"] == 0
    assert got["any"]["survival_rate"] is None   # try_divide, not 0/0
    assert got["none"]["n_in"] == 0


def test_stage_validation(spark):
    from dump1090_db_stream_spark.operators.cleaning import filter_funnel

    df = spark.createDataFrame([(1, "en")], "v int, lang string")
    with pytest.raises(ValueError, match="at least one"):
        filter_funnel(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        filter_funnel(df, [("a", F.lit(True)), ("a", F.lit(True))])
    # names are embedded in a generated stack() expression: quotes,
    # backslashes and injection-shaped names must be REFUSED, not
    # escaped-and-hoped (Spark string literals treat backslash as an
    # escape, so 'win\\loss' would silently rename the stage)
    for bad in ("win\\loss", "it's", "x', 9, _s_in, _s0 --"):
        with pytest.raises(ValueError, match="stage names"):
            filter_funnel(df, [(bad, F.lit(True))])


def test_single_aggregate_plan(spark):
    """The whole funnel is ONE map-side-combined aggregate: a single
    pair of hash-aggregate exchanges, no join, no Python."""
    from dump1090_db_stream_spark.operators.cleaning import filter_funnel

    df = spark.range(1000).select(
        F.col("id").cast("int").alias("v"), F.lit("en").alias("lang"))
    out = filter_funnel(df, [("a", F.col("v") < 500),
                             ("b", F.col("v") % 2 == 0)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1          # the single-row agg
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
