"""CLI entrypoint (python -m dump1090_db_stream_spark): flag surface
parity with the reference script and a file-replay end-to-end run."""

from __future__ import annotations

import pytest

from dump1090_db_stream_spark.__main__ import build_parser, main
from tests.fixtures import N_MSG_LINES, SAMPLE_LINES


def test_flags_mirror_reference_env_defaults(monkeypatch):
    # dump1090-postgres.py:15-30 reads these; the CLI must honor them
    monkeypatch.setenv("DUMP1090HOST", "radar.local")
    monkeypatch.setenv("DUMP1090PORT", "31003")
    monkeypatch.setenv("PGDATABASE", "adsb_db")
    monkeypatch.setenv("PGUSER", "feeder")
    monkeypatch.setenv("BATCH_SIZE", "250")
    monkeypatch.setenv("CONNECT_ATTEMPT_LIMIT", "3")
    args = build_parser().parse_args([])
    assert args.dump1090 == "radar.local" and args.port == 31003
    assert args.dbname == "adsb_db" and args.dbuser == "feeder"
    assert args.batch_size == 250 and args.connect_attempt_limit == 3
    # reference flag spellings still parse
    args = build_parser().parse_args(
        ["--dump1090", "h", "--port", "30003", "-d", "db", "-U", "u",
         "--dbpass", "p", "--buffer-size", "2048", "--batch-size", "9",
         "--connect-attempt-limit", "2", "--connect-attempt-delay",
         "0.5", "--verbose"])
    assert args.buffer_size == 2048 and args.verbose


def test_cli_requires_source_and_sink(monkeypatch):
    for var in ("DUMP1090HOST", "PGDATABASE"):
        monkeypatch.delenv(var, raising=False)
    assert main(["--parquet-store", "/tmp/x"]) == 2      # no source
    assert main(["--dump1090", "h"]) == 2                # no sink


def test_cli_file_replay_into_parquet_store(spark, tmp_path, monkeypatch):
    for var in ("DUMP1090HOST", "PGDATABASE"):
        monkeypatch.delenv(var, raising=False)
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "log1.txt").write_text("\n".join(SAMPLE_LINES) + "\n")
    store = tmp_path / "store"
    rc = main(["--file-source", str(feed),
               "--parquet-store", str(store),
               "--checkpoint", str(tmp_path / "ck"),
               "--available-now"])
    assert rc == 0
    got = spark.read.parquet(str(store))
    assert got.count() == N_MSG_LINES
    assert "hex_ident" in got.columns
