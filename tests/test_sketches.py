"""Sketch aggregates: accuracy vs exact, and mergeability (the property
that makes sketch columns a continuous aggregate)."""

from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.sketches import (
    approx_group_stats,
    daily_sketches,
    union_estimate,
)

SF_DIR = "/root/testdata/sf0.01"


def _events(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def test_approx_stats_within_error_bounds(spark):
    ev = _events(spark)
    approx = {r["event_type"]: r for r in approx_group_stats(
        ev, ["event_type"], "user_id", "value").collect()}
    exact = {r["event_type"]: r for r in ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("d"),
        F.expr("percentile(value, 0.5)").alias("m"),
        F.min("value").alias("lo"), F.max("value").alias("hi")).collect()}
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        # HLL++ with rsd=0.01: allow 5 sigma
        assert abs(a["approx_distinct"] - e["d"]) <= max(0.05 * e["d"], 2)
        # percentile_approx: rank-error based; generous value tolerance
        spread = e["hi"] - e["lo"]
        assert abs(a["approx_median"] - e["m"]) <= 0.05 * spread


def test_sketch_union_is_lossless_and_accurate(spark):
    """Merging per-day sketches gives the SAME estimate as one global
    sketch (HLL union at equal lg_k is lossless), and both land within
    the sketch's error bound of the exact distinct count."""
    ev = _events(spark)
    per_day = daily_sketches(ev, ts="ts", keys=["event_type"],
                             distinct_col="user_id")
    merged = {r["event_type"]: r["distinct_estimate"]
              for r in union_estimate(per_day, ["event_type"]).collect()}
    direct = {r["event_type"]: r["est"] for r in ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
              .collect()}
    assert merged == direct
    exact = {r["event_type"]: r["d"] for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("d")).collect()}
    for et, est in merged.items():
        assert abs(est - exact[et]) <= max(0.06 * exact[et], 2)


def test_global_union_from_stored_sketches(spark):
    """The ad-hoc-span workflow: estimate over ALL days and types from
    sketch bytes alone (keys=[]) matches the exact global distinct."""
    ev = _events(spark)
    per_day = daily_sketches(ev, ts="ts", keys=["event_type"],
                             distinct_col="user_id")
    est = union_estimate(per_day, keys=[]).first()["distinct_estimate"]
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) <= max(0.06 * exact, 2)
