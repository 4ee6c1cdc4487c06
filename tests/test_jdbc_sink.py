"""JDBC sink call-path contract (sinks.writers.write_jdbc).

No JDBC driver jar ships in this container, so the sink cannot run
against a live database here. These tests still execute every line of
write_jdbc against a recording stand-in for the DataFrameWriter chain,
pinning the contract the reference's sink depends on (reference
dump1090-postgres.py:92-131): append mode (INSERT-only, never
overwrite), batched inserts via the JDBC ``batchsize`` option (S-7),
and caller-supplied connection properties reaching the writer.
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
