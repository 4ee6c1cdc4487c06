"""Optional Apache Sedona adapter for the geo surface.

The reference's PostGIS-optional queries (README.md:255-273) are
covered by ``operators.geo``'s struct stand-ins + bit-exact WKT/WKB
text — that path is the contract surface and stays the default. This
module exists for users whose DOWNSTREAM tooling expects real geometry
UDTs (GeoParquet readers, Sedona spatial joins): when the ``sedona``
package is importable, the same logical columns materialize as Sedona
geometries; when it is not (this container ships no Sedona), every
entry point either falls back to the struct/WKT stand-in or raises a
clear ImportError naming the dependency — nothing here changes any
contract query's plan or output.

Design: adapt at the COLUMN level, not the operator level. The
stand-in struct ``(x, y, srid)`` and Sedona's ``ST_Point`` carry the
same information, so conversion is one expression each way and every
operator in ``operators.geo`` (grid cells, radius join, z-order,
close encounters) keeps running on plain doubles — the scale path
never depends on a geometry lib.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.geo import (
    make_point,
    st_astext_point,
)


def sedona_available() -> bool:
    """True when the Apache Sedona Python package is importable."""
    try:
        import sedona  # noqa: F401

        return True
    except ImportError:
        return False


def require_sedona() -> None:
    if not sedona_available():
        raise ImportError(
            "Apache Sedona is not installed; install apache-sedona (and "
            "its Spark jars) to materialize real geometry UDTs. The "
            "struct/WKT stand-ins in operators.geo cover the same "
            "surface without it.")


def register(spark: SparkSession) -> SparkSession:
    """Register Sedona's SQL functions (ST_Point, ST_AsText, ...) on
    this session. Raises ImportError with the remedy when Sedona is
    absent."""
    require_sedona()
    from sedona.spark import SedonaContext

    return SedonaContext.create(spark)


def point_column(lon: Column, lat: Column, srid: int = 4326,
                 use_sedona: bool | None = None) -> Column:
    """A point geometry column: Sedona ``ST_SetSRID(ST_Point(...))``
    when available (or forced via ``use_sedona=True``), else the
    struct stand-in (:func:`operators.geo.make_point`). ``use_sedona``
    defaults to auto-detection."""
    if use_sedona is None:
        use_sedona = sedona_available()
    if use_sedona:
        require_sedona()
        from sedona.sql import st_constructors as stc
        from sedona.sql import st_functions as stf

        return stf.ST_SetSRID(stc.ST_Point(lon, lat), srid)
    return make_point(lon, lat, srid)


def as_wkt(point: Column, use_sedona: bool | None = None) -> Column:
    """WKT text for a point produced by :func:`point_column` — routes
    to Sedona's ``ST_AsText`` or the stand-in's bit-exact formatter so
    mixed deployments read identical strings."""
    if use_sedona is None:
        use_sedona = sedona_available()
    if use_sedona:
        require_sedona()
        from sedona.sql import st_functions as stf

        return stf.ST_AsText(point)
    return st_astext_point(point)


def standin_to_sedona(df: DataFrame, struct_col: str,
                      out_col: str | None = None) -> DataFrame:
    """Convert a stand-in ``(x, y, srid)`` struct column to a real
    Sedona geometry column (requires Sedona). The inverse of
    :func:`sedona_to_standin`; both are single narrow projections."""
    require_sedona()
    from sedona.sql import st_constructors as stc
    from sedona.sql import st_functions as stf

    out = out_col or struct_col
    c = F.col(struct_col)
    return df.withColumn(out, stf.ST_SetSRID(
        stc.ST_Point(c["x"], c["y"]), c["srid"].cast("int")))


def sedona_to_standin(df: DataFrame, geom_col: str,
                      out_col: str | None = None,
                      srid: int = 4326) -> DataFrame:
    """Convert a Sedona point geometry back to the portable stand-in
    struct consumed by every operator in ``operators.geo``."""
    require_sedona()
    from sedona.sql import st_functions as stf

    out = out_col or geom_col
    return df.withColumn(out, F.struct(
        stf.ST_X(F.col(geom_col)).alias("x"),
        stf.ST_Y(F.col(geom_col)).alias("y"),
        F.lit(srid).alias("srid")))
