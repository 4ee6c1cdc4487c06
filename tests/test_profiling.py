"""Table profiling (operators.profiling) on a hand-built table."""

from __future__ import annotations

import datetime as dt

from dump1090_db_stream_spark.operators.profiling import table_profile


def _tbl(spark):
    return spark.createDataFrame(
        [(1, "a", 2.5, dt.date(2024, 1, 1)),
         (2, "b", None, dt.date(2024, 1, 2)),
         (3, None, 10.0, dt.date(2024, 1, 3)),
         (4, "a", -1.0, None)],
        ["k", "s", "v", "d"])


def test_profile_counts_and_typed_minmax(spark):
    got = {r["column"]: r for r in table_profile(_tbl(spark)).collect()}
    assert set(got) == {"k", "s", "v", "d"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["k"]["n_null"], got["s"]["n_null"],
            got["v"]["n_null"], got["d"]["n_null"]) == (0, 1, 1, 1)
    assert got["s"]["n_distinct"] == 2  # NULL not a distinct value
    assert got["v"]["min_num"] == -1.0 and got["v"]["max_num"] == 10.0
    # numeric columns never report lexical strings, and vice versa
    assert got["v"]["min_str"] is None and got["k"]["min_str"] is None
    assert got["s"]["min_num"] is None
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["d"]["min_str"] == "2024-01-01"


def test_profile_numeric_min_is_numeric_not_lexical(spark):
    # the classic profiling bug: lexically "10" < "9"
    df = spark.createDataFrame([(9,), (10,)], ["x"])
    r = table_profile(df).collect()[0]
    assert r["min_num"] == 9.0 and r["max_num"] == 10.0


def test_profile_scans_table_once(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = (table_profile(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("FileScan") == 1


def test_profile_approx_distinct_close(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {r["column"]: r["n_distinct"]
             for r in table_profile(df).collect()}
    approx = {r["column"]: r["n_distinct"]
              for r in table_profile(df, exact_distinct=False).collect()}
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(2, 0.1 * n), c


def test_profile_column_subset(spark):
    got = table_profile(_tbl(spark), cols=["k", "v"]).collect()
    assert sorted(r["column"] for r in got) == ["k", "v"]
