"""Driver-side JSON sidecar helpers (sinks.writers — r15): the 1-row
index-metadata sidecars must round-trip without a Spark job and stay
layout-compatible with the DataFrame json writer in BOTH directions
(old indexes readable by the new reader, new sidecars readable by
``spark.read.json`` and by older probes)."""

from __future__ import annotations

import pytest

from dump1090_db_stream_spark.sinks.writers import (
    read_json_sidecar,
    write_json_sidecar,
)


def test_roundtrip_and_spark_read_compat(spark, tmp_path):
    rec = {"n": 3, "bands": 16, "portable_base_hash": True,
           "tokenizer": "whitespace",
           "centroids_json": "[[1.0, 2.5]]"}
    d = str(tmp_path / "_meta")
    write_json_sidecar(spark, d, rec)
    # driver-side read: exact types, no job
    assert read_json_sidecar(spark, d) == rec
    # the DataFrame reader sees the same record (old probes keep
    # working against new sidecars)
    row = spark.read.json(d).first().asDict()
    assert int(row["n"]) == 3 and bool(row["portable_base_hash"])
    assert row["centroids_json"] == rec["centroids_json"]
    # overwrite semantics: a second write replaces, not appends
    write_json_sidecar(spark, d, {"n": 9})
    assert read_json_sidecar(spark, d) == {"n": 9}


def test_reads_dataframe_writer_layout(spark, tmp_path):
    """Pre-r15 sidecars were written by the DataFrame json writer —
    the driver-side reader must read them unchanged."""
    d = str(tmp_path / "_old_meta")
    (spark.createDataFrame([(7, "unicode_word")],
                           "n int, tokenizer string")
     .coalesce(1).write.mode("overwrite").json(d))
    got = read_json_sidecar(spark, d)
    assert got == {"n": 7, "tokenizer": "unicode_word"}


def test_missing_semantics(spark, tmp_path):
    gone = str(tmp_path / "nope")
    assert read_json_sidecar(spark, gone, missing_ok=True) is None
    with pytest.raises(FileNotFoundError):
        read_json_sidecar(spark, gone)
