"""The reference README's documented ad-hoc query corpus as DataFrame
builders (README.md:180-273) — the queries a reference user runs today,
re-expressed on the view layer.

Geo functions (G-1/G-2): OSS Spark has no ST_MakePoint/ST_MakeLine; the
struct stand-in keeps the same information content ((lon,lat) points,
point-pair segments) and swaps cleanly for Apache Sedona expressions when
a geo runtime is attached (the column shapes match Sedona's ST_* inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def make_point(lon: Column | str, lat: Column | str,
               srid: int = 4326) -> Column:
    """G-1 stand-in for ST_SetSRID(ST_MakePoint(lon, lat), 4326)
    (README.md:261, :269-270)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    return F.struct(lon.alias("lon"), lat.alias("lat"),
                    F.lit(srid).alias("srid"))


def make_line(p1: Column, p2: Column) -> Column:
    """G-2 stand-in for ST_MakeLine(geom, geom2) (README.md:267)."""
    return F.struct(p1.alias("start"), p2.alias("end"))


def callsign_lookup(callsigns: DataFrame, prefix: str,
                    limit: int | None = 5) -> DataFrame:
    """README.md:210-213: flights (callsign sessions) by prefix."""
    out = callsigns.filter(F.col("callsign").like(prefix + "%"))
    return out.limit(limit) if limit is not None else out


def location_trace(locations: DataFrame, hex_ident: str,
                   limit: int | None = 10) -> DataFrame:
    """README.md:235-239: position fixes for one aircraft."""
    out = locations.filter(F.col("hex_ident") == hex_ident)
    return out.limit(limit) if limit is not None else out


def last_24h(messages: DataFrame, ts_col: str = "parsed_time") -> DataFrame:
    """README.md:258-263: rows in the trailing 24 hours (F-14/C-3/C-4).
    On a date-partitioned store the two-sided predicate prunes to at most
    two date partitions."""
    now = F.current_timestamp()
    return messages.filter(
        F.col(ts_col).between(now - F.expr("INTERVAL 24 HOURS"), now))


def track_lines(locations_df: DataFrame) -> DataFrame:
    """README.md:266-273: per-aircraft track segments.

    W-1 shared window spec, W-2 row_number, W-3 lead(geom), W-4 drop the
    last fix per aircraft (geom2 IS NULL). Single shuffle on hex_ident;
    both window functions share the same sort."""
    w = Window.partitionBy("hex_ident").orderBy("parsed_time")
    geom = make_point("lon", "lat")
    with_next = locations_df.select(
        "hex_ident", "parsed_time",
        F.row_number().over(w).alias("seq"),
        geom.alias("geom"),
        F.lead(geom).over(w).alias("geom2"),
    )
    return (with_next
            .filter(F.col("geom2").isNotNull())
            .withColumn("segment", make_line(F.col("geom"), F.col("geom2"))))
