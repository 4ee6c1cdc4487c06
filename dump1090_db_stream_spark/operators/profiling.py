"""Table profiling: per-column quality statistics in one scan.

The data-quality audit primitive a pipeline runs before trusting a new
snapshot: row count, null count, distinct count, and min/max per
column, emitted long-format (one row per column) so downstream checks
diff profiles across versions like any other relation.

Physical shape: ONE aggregation over the table computes every
column's statistics simultaneously (a single row of ~4 x n_cols
aggregates, partial-combined map-side), then a narrow explode unpivots
it — the table is scanned once regardless of column count, never once
per column.

Typing discipline for the long format: numeric columns report min/max
as DOUBLE (exact for integers/decimals below 2^53); string, date and
timestamp columns report min/max as their STRING form (ISO dates are
identical across ANSI engines). Mixing both through one string cast
would make numeric mins lexical ("10" < "9") and engine-formatted —
the classic profiling-tool bug this split avoids.

``exact_distinct=False`` swaps COUNT(DISTINCT) for HLL++
approx_count_distinct: at 100 TB one exact distinct per column is an
expand-based multi-aggregate (n_cols full shuffles of the row id
space); the sketch keeps the single-scan single-shuffle shape with
constant state per column.

``value_histogram`` extends the profile to distributions: per-key
equi-width histograms over a numeric column, two aggregate passes
(per-key min/max, then bin counts with the tiny extent relation
broadcast back) — never a driver-side collect of values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_STRINGY = (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)


def table_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    max_str) — one output row per profiled column, one input scan."""
    fields = [f for f in df.schema.fields
              if cols is None or f.name in cols]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f in fields:
        c, name = F.col(f.name), f.name
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"_null_{name}"))
        aggs.append(
            (F.count_distinct(c) if exact_distinct
             else F.approx_count_distinct(c)).alias(f"_nd_{name}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"_min_{name}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{name}"))
        elif isinstance(f.dataType, _STRINGY):
            aggs.append(F.min(c).cast("string").alias(f"_smin_{name}"))
            aggs.append(F.max(c).cast("string").alias(f"_smax_{name}"))
    one = df.agg(*aggs)
    rows = []
    for f in fields:
        name = f.name
        numeric = isinstance(f.dataType, _NUMERIC)
        stringy = isinstance(f.dataType, _STRINGY)
        rows.append(F.struct(
            F.lit(name).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{name}").alias("n_null"),
            F.col(f"_nd_{name}").alias("n_distinct"),
            (F.col(f"_min_{name}") if numeric
             else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"_max_{name}") if numeric
             else F.lit(None).cast("double")).alias("max_num"),
            (F.col(f"_smin_{name}") if stringy
             else F.lit(None).cast("string")).alias("min_str"),
            (F.col(f"_smax_{name}") if stringy
             else F.lit(None).cast("string")).alias("max_str"),
        ))
    return (one.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.*"))


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    keys: list[str] | None = None,
    n_bins: int = 10,
) -> DataFrame:
    """Per-key equi-width histogram of ``value_col``: one row per
    (keys, bin) with the bin bounds and count; only non-empty bins are
    emitted (a dense grid is a trivial downstream sequence-join if a
    renderer needs it).

    - ``bin``            : 0..n_bins-1; bin i covers
      [min + i*w, min + (i+1)*w) with the last bin closed on the right
      (the max value lands in bin n_bins-1, the standard equi-width
      convention)
    - ``bin_lo/bin_hi``  : bounds, rounded 6
    - ``n``              : rows in the bin

    Degenerate extent (min == max, including single-row keys) puts all
    rows in bin 0 with lo == hi. NULL values are excluded (they have no
    bin; the null count is table_profile's job).

    Physical shape: a per-key min/max aggregation (aggregate-sized),
    broadcast-joined back, then one map-side-combined count per (keys,
    bin). The raw relation is scanned twice but shuffled once at
    aggregate size — at 100 TB both scans prune to (keys..., value) at
    the reader. Bin index arithmetic is the order-fixed IEEE sequence
    floor((v - min) / (max - min) * n_bins) clamped to n_bins-1, so any
    ANSI engine reproduces bin placement bit-for-bit.
    """
    keys = keys or []
    vals = df.filter(F.col(value_col).isNotNull())
    extent = vals.groupBy(*keys).agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"))
    joined = (vals.join(F.broadcast(extent), on=keys)
              if keys else vals.crossJoin(F.broadcast(extent)))
    raw_bin = F.floor((F.col(value_col).cast("double") - F.col("_lo"))
                      / (F.col("_hi") - F.col("_lo")) * n_bins)
    bin_idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(raw_bin, F.lit(n_bins - 1))).cast("int")
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    return (
        joined.select(*keys, "_lo", "_hi", bin_idx.alias("bin"))
        .groupBy(*keys, "_lo", "_hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bin",
            F.round(F.col("_lo") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("_lo") + (F.col("bin") + 1) * width, 6)
             .alias("bin_hi"),
            "n",
        )
    )
