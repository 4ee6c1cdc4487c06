"""Sketch-based approximate aggregation (north-star extension; the
reference has no aggregate surface beyond min/max — SURVEY.md §2.4
'absent' list).

Two tiers, both JVM-native (zero Python in the data path):

1. One-shot approximations: ``approx_count_distinct`` (HyperLogLog++)
   and ``percentile_approx`` — constant memory per group vs the
   O(distinct)/O(rows) state of their exact twins. At 100 TB an exact
   COUNT(DISTINCT user) materializes every key through an Expand +
   two-phase aggregate; the sketch keeps ~1.5 KB per group regardless.

2. MERGEABLE sketch columns (Apache DataSketches HLL via
   ``hll_sketch_agg`` / ``hll_union_agg``): the sketch itself is stored
   as a binary column, so coarse aggregates derive from fine ones
   WITHOUT touching raw data — the same continuous-aggregate shape as
   ``operators.rollup.time_rollup``, but for distinct counts, which are
   not decomposable exactly (sum-of-daily-distincts overcounts).
   Pattern: roll per-day sketches once; any ad-hoc span (week, month,
   arbitrary date range, per-key or global) is a union over day
   sketches — O(days × groups × 1.5 KB), never a raw rescan.

Estimates are deterministic for a given input set (HLL has no RNG), but
not SQL-portable — DuckDB's approx_count_distinct uses a different
sketch — so driver-contract checks are rows-only; accuracy is asserted
against exact values in tests (HLL++ rsd and DataSketches lgK bound the
error; defaults here give ~1-2%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_group_stats(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    value_col: str,
    rsd: float = 0.01,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative std dev
    ``rsd``) and median (``percentile_approx`` with 1/``accuracy``
    rank error). Single partial-aggregatable pass, constant state per
    group."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"),
        F.percentile_approx(value_col, 0.5, accuracy).alias("approx_median"),
    )


def daily_sketches(
    df: DataFrame,
    ts: str,
    keys: list[str],
    distinct_col: str,
    lg_k: int = 12,
    day_col: str = "day",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-(day, keys) DataSketches HLL sketch of ``distinct_col`` as a
    binary column — the stored, mergeable form. lg_k=12 → ~2.5 KB and
    ~1.6% standard error per sketch."""
    return (
        df.groupBy(F.to_date(F.col(ts)).alias(day_col),
                   *[F.col(k) for k in keys])
        .agg(F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias(sketch_col))
    )


def union_estimate(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored sketches down to ``keys`` and estimate distincts —
    re-aggregation over sketch bytes only. An empty ``keys`` gives the
    global estimate."""
    merged = (
        sketches.groupBy(*[F.col(k) for k in keys])
        .agg(F.hll_union_agg(sketch_col).alias("_u"))
        if keys else
        sketches.agg(F.hll_union_agg(sketch_col).alias("_u"))
    )
    return merged.select(
        *keys,
        F.hll_sketch_estimate("_u").alias(estimate_col),
    )
