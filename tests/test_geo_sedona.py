"""Sedona-optional geo adapter (operators.geo_sedona): the fallback
path is the contract surface and must work without Sedona; the Sedona
path is import-guarded and exercised only where the package exists."""

from __future__ import annotations

import pytest

from dump1090_db_stream_spark.operators.geo_sedona import (
    as_wkt,
    point_column,
    register,
    sedona_available,
    sedona_to_standin,
    standin_to_sedona,
)


def test_fallback_builds_standin_struct_and_wkt(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(102.5, -33.125)], ["lon", "lat"])
    out = df.select(
        point_column(F.col("lon"), F.col("lat")).alias("p")
    ).select(F.col("p"), as_wkt(F.col("p")).alias("wkt")).collect()[0]
    assert (out["p"]["x"], out["p"]["y"], out["p"]["srid"]) == \
        (102.5, -33.125, 4326)
    assert out["wkt"] == "POINT(102.5 -33.125)"


@pytest.mark.skipif(sedona_available(), reason="Sedona present: the "
                    "ImportError contract applies only without it")
def test_sedona_paths_raise_with_remedy_when_absent(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0, 2.0)], ["lon", "lat"])
    pts = df.select(point_column(F.col("lon"), F.col("lat")).alias("p"))
    with pytest.raises(ImportError, match="apache-sedona"):
        register(spark)
    with pytest.raises(ImportError, match="apache-sedona"):
        standin_to_sedona(pts, "p")
    with pytest.raises(ImportError, match="apache-sedona"):
        sedona_to_standin(pts, "p")
    # forcing the Sedona column path without the package also raises
    with pytest.raises(ImportError, match="apache-sedona"):
        df.select(point_column(F.col("lon"), F.col("lat"),
                               use_sedona=True))


@pytest.mark.skipif(not sedona_available(), reason="Sedona not installed")
def test_sedona_roundtrip_matches_standin(spark):
    from pyspark.sql import functions as F

    sed = register(spark)
    df = sed.createDataFrame([(102.5, -33.125)], ["lon", "lat"])
    pts = df.select(point_column(F.col("lon"), F.col("lat"),
                                 use_sedona=True).alias("g"))
    back = sedona_to_standin(pts, "g", out_col="p").select("p").collect()[0]
    assert (back["p"]["x"], back["p"]["y"]) == (102.5, -33.125)
