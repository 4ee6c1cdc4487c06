"""JDBC sink tests (sinks.writers.write_jdbc).

Two layers: recording-stand-in tests pin the call contract the
reference's sink depends on (reference dump1090-postgres.py:92-131) —
append mode (INSERT-only, never overwrite), batched inserts via the
JDBC ``batchsize`` option (S-7), caller-supplied connection properties
reaching the writer — and a LIVE round-trip through embedded Apache
Derby (the jar Spark ships for its Hive metastore) exercises the real
DataFrameWriter.jdbc path end-to-end. No PostgreSQL driver jar ships
in this container, so Derby stands in for the reference's live sink.
"""

from __future__ import annotations

from dump1090_db_stream_spark.sinks.writers import write_jdbc


class _RecordingWriter:
    def __init__(self):
        self.mode_arg = None
        self.options_arg = None
        self.jdbc_args = None

    def mode(self, m):
        self.mode_arg = m
        return self

    def options(self, **kw):
        self.options_arg = kw
        return self

    def jdbc(self, url, table):
        self.jdbc_args = (url, table)


class _FakeDF:
    def __init__(self):
        self.write = _RecordingWriter()


def test_write_jdbc_appends_with_batchsize():
    df = _FakeDF()
    write_jdbc(df, "jdbc:postgresql://db:5432/adsb", "adsb.adsb_messages",
               batchsize=500)
    w = df.write
    assert w.mode_arg == "append"          # INSERT-only, like the reference
    assert w.options_arg == {"batchsize": "500"}
    assert w.jdbc_args == ("jdbc:postgresql://db:5432/adsb",
                           "adsb.adsb_messages")


def test_write_jdbc_defaults_and_property_merge():
    df = _FakeDF()
    write_jdbc(df, "jdbc:postgresql://h/d", "t",
               properties={"user": "pg", "batchsize": "9999"})
    w = df.write
    # caller properties win over the default batchsize
    assert w.options_arg == {"batchsize": "9999", "user": "pg"}
    assert w.mode_arg == "append"


def test_write_jdbc_default_batchsize_is_1000():
    df = _FakeDF()
    write_jdbc(df, "jdbc:postgresql://h/d", "t")
    assert df.write.options_arg == {"batchsize": "1000"}


def test_write_jdbc_round_trip_embedded_derby(spark, tmp_path):
    """LIVE JDBC round-trip: write through write_jdbc into an embedded
    Apache Derby database (the derby-*.jar Spark ships for its Hive
    metastore, already on the classpath) and read the rows back over
    JDBC. This executes the real DataFrameWriter.jdbc path end-to-end —
    table auto-create on append, batched inserts, property passthrough —
    the part the recording-stand-in tests above cannot reach.
    Skip-marked if the Spark distribution carries no Derby jar."""
    import glob
    import os

    import pyspark
    import pytest

    if not glob.glob(os.path.join(
            os.path.dirname(pyspark.__file__), "jars", "derby-*.jar")):
        pytest.skip("no embedded Derby jar on the Spark classpath")

    url = f"jdbc:derby:{tmp_path}/jdbc_rt;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [(1, "RJA1118", 37000), (2, "BAW123", 35000), (3, None, None)]
    df = spark.createDataFrame(
        rows, "message_id long, callsign string, altitude long")

    write_jdbc(df, url, "messages", properties=props, batchsize=2)
    back = spark.read.options(**props).jdbc(url, "messages")
    got = sorted((r["message_id"], r["callsign"], r["altitude"])
                 for r in back.collect())
    assert got == sorted(rows)

    # append semantics (INSERT-only, reference dump1090-postgres.py:110):
    # a second write adds rows, never truncates
    write_jdbc(df, url, "messages", properties=props)
    assert spark.read.options(**props).jdbc(url, "messages").count() == 6
