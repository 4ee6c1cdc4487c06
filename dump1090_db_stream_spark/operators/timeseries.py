"""Event-time window operators beyond tumbling/session windows.

Two shapes a telemetry/feature pipeline needs that the existing
rollup/session operators don't cover:

- sliding_window_agg : overlapping fixed windows (width > slide) via
  the built-in ``F.window`` — each event lands in width/slide windows,
  Spark plans it as one explode + hash aggregation (no self-join).
  The tumbling case is width == slide; session windows live in
  streaming/pipeline.py.
- trailing_range_stats : per-ROW trailing aggregates over an event-time
  RANGE frame ([t - range, t] per row) — the "features as of this
  event" primitive (trailing 1 h event count, rolling mean). Uses a
  numeric range frame over epoch MICROSECONDS so sub-second timestamps
  order exactly and any ANSI engine replays the frame bit-for-bit
  (interval-typed frames have engine-specific inclusivity folklore;
  integers do not).

Scale: both are single-shuffle operators (window-key hash agg / one
partition-key exchange). The range frame is evaluated with a sliding
two-pointer in both engines — O(rows) per partition, state bounded by
the frame's row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICROS_PER_SEC = 1_000_000


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: list[str],
    *aggs: Column,
) -> DataFrame:
    """Aggregate per (sliding window, keys): window_start, window_end,
    keys..., aggs... — [start, end) semantics, width/slide windows per
    event."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("_w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def trailing_range_stats(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    part_col: str = "user_id",
    trailing_seconds: int = 3600,
) -> DataFrame:
    """Adds per-row trailing-frame features over [t - trailing, t]:

    - n_trail    : events in the frame (including the current row)
    - sum_trail  : sum of ``value_col`` over the frame (rounded 6)
    - avg_trail  : mean over the frame (rounded 6)

    Frame bounds are inclusive on both ends, expressed in epoch
    microseconds; ties in ts fall in the same frame position in any
    engine because RANGE frames group peers by ORDER BY value.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(part_col)
         .orderBy(us)
         .rangeBetween(-trailing_seconds * MICROS_PER_SEC, 0))
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_trail"),
        F.round(F.sum(value_col).over(w), 6).alias("sum_trail"),
        F.round(F.avg(value_col).over(w), 6).alias("avg_trail"),
    )
