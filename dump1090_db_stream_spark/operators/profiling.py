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
