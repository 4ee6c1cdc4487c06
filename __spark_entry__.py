"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry re-expresses an operator from SURVEY.md §2 on the
driver's synthetic tables (mapping per FIXTURES.md §C: the ADS-B fact table
maps onto ``events`` — hex_ident→user_id, callsign→event_type,
parsed_time→ts, lat/lon→value). ``oracle_sql()`` gives the DuckDB-checkable
equivalent. Column aliases match exactly on both sides (driver hashes
values under name-sorted columns).

Determinism rules used throughout:
- computed doubles are ``round``-ed identically on both sides (raw parquet
  doubles pass through bit-identical, no rounding needed);
- window orderings always carry a unique tiebreak column;
- no LIMIT without a total ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.sessions import (
    band_join,
    daily_sessions,
    dedup_by_key,
)
from dump1090_db_stream_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- reference-parity queries (SURVEY.md §2) -------------------------------


def q_callsign_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-9 + A-1..A-4: the callsigns view (create_schema.sql:85-93) on
    events: per-day (user, event_type) sessions with first/last ts."""
    return daily_sessions(
        _events(spark, sf_dir), key="user_id", label="event_type", ts="ts"
    ).select("user_id", "event_type", "date_seen", "last_seen", "first_seen")


def q_locations_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-10 + F-11: the locations view (create_schema.sql:101-108) —
    narrow projection + NOT NULL predicate, pushed to the parquet scan."""
    return (
        _events(spark, sf_dir)
        .select("event_id", "user_id", "ts", "value")
        .filter(F.col("value").isNotNull())
    )


def q_flights_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-1 + A-5: the flights view (create_schema.sql:116-124) — equi key
    + ±10 min band residual + DISTINCT, on events vs its own sessions."""
    ev = _events(spark, sf_dir)
    fixes = ev.select("user_id", "ts", "value")
    sessions = daily_sessions(ev, key="user_id", label="event_type", ts="ts")
    return band_join(
        fixes, sessions, key="user_id", ts="ts",
        band="INTERVAL 10 MINUTES", session_cols=["event_type"],
    ).select("user_id", "ts", "value", "event_type")


def q_like_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-12: LIKE prefix predicate (README.md:212)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").like("AUTO%"))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


def q_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-13: equality predicate (README.md:237)."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


def q_time_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-14/C-3: time-range BETWEEN (README.md:262) with fixed bounds for
    oracle determinism (the reference's now()-relative variant is exposed
    as operators.adhoc.last_24h)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1996-12-31 23:59:59").cast("timestamp"),
            )
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


def q_window_track_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-1..W-4: the PostGIS track-line query shape (README.md:266-273) —
    shared window spec, row_number + lead, post-window NOT NULL filter.
    event_id tiebreak makes lead() deterministic under ts ties."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .select(
            "user_id", "ts", "value",
            F.row_number().over(w).alias("rn"),
            F.lead("value").over(w).alias("next_value"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .filter(F.col("next_value").isNotNull())
    )


def q_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-6: PK-style dedup (create_schema.sql:132-133) on the analog key
    (event_type, ts, user_id), deterministic survivor via event_id."""
    return dedup_by_key(
        _events(spark, sf_dir),
        keys=["event_type", "ts", "user_id"],
        tiebreak=["event_id"],
    ).select("event_id", "ts", "user_id", "event_type", "value")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-1..A-4 at scale (TPC-H Q1 shape): multi-key hash agg with partial
    (map-side) aggregation; the shuffle carries only group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join + agg (TPC-H Q5 shape): small dims (nation, customer)
    broadcast; only lineitem⋈orders shuffles on the order key."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis (north-star): per-document token/char counts as
    native expressions — no UDF, fully codegen'd."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars",
        F.length("text").alias("text_len"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the flights band join (the reference's hardest query) at
    sf0.001; driver checks rows>0 and stable schema."""
    return q_flights_band_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "callsign_sessions": q_callsign_sessions,
        "locations_projection": q_locations_projection,
        "flights_band_join": q_flights_band_join,
        "like_prefix_filter": q_like_prefix_filter,
        "equality_filter": q_equality_filter,
        "time_range_between": q_time_range_between,
        "window_track_lines": q_window_track_lines,
        "dedup_by_key": q_dedup_by_key,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "doc_token_stats": q_doc_token_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "callsign_sessions": """
            SELECT user_id, event_type, CAST(ts AS DATE) AS date_seen,
                   max(ts) AS last_seen, min(ts) AS first_seen
            FROM events
            WHERE event_type IS NOT NULL AND event_type <> ''
            GROUP BY user_id, event_type, CAST(ts AS DATE)
        """,
        "locations_projection": """
            SELECT event_id, user_id, ts, value
            FROM events WHERE value IS NOT NULL
        """,
        "flights_band_join": """
            WITH sessions AS (
                SELECT user_id, event_type, CAST(ts AS DATE) AS date_seen,
                       max(ts) AS last_seen, min(ts) AS first_seen
                FROM events
                WHERE event_type IS NOT NULL AND event_type <> ''
                GROUP BY user_id, event_type, CAST(ts AS DATE)
            )
            SELECT DISTINCT l.user_id, l.ts, l.value, s.event_type
            FROM events l JOIN sessions s
              ON l.user_id = s.user_id
             AND l.ts <= s.last_seen + INTERVAL 10 MINUTE
             AND l.ts >= s.first_seen - INTERVAL 10 MINUTE
        """,
        "like_prefix_filter": """
            SELECT c_custkey, c_name, c_mktsegment, c_acctbal
            FROM customer WHERE c_mktsegment LIKE 'AUTO%'
        """,
        "equality_filter": """
            SELECT event_id, user_id, ts, event_type, value
            FROM events WHERE event_type = 'purchase'
        """,
        "time_range_between": """
            SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
            FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                  AND TIMESTAMP '1996-12-31 23:59:59'
        """,
        "window_track_lines": """
            SELECT * FROM (
                SELECT user_id, ts, value,
                       row_number() OVER w AS rn,
                       lead(value) OVER w AS next_value,
                       lead(ts)    OVER w AS next_ts
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) WHERE next_value IS NOT NULL
        """,
        "dedup_by_key": """
            SELECT event_id, ts, user_id, event_type, value
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY event_type, ts, user_id
                    ORDER BY event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "doc_token_stats": """
            SELECT doc_id, lang, source, n_chars,
                   length(text) AS text_len,
                   length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        """,
    }
