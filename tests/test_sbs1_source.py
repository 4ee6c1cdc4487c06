"""Custom SBS-1 Python DataSource tests (sources.sbs1_source)."""

from __future__ import annotations

import os
import socket
import socketserver
import threading
import time

import pytest

from dump1090_db_stream_spark.functions.parser import parse_sbs1
from dump1090_db_stream_spark.sources.sbs1_source import register_sbs1_source
from tests.fixtures import SAMPLE_LINES


@pytest.fixture(scope="module")
def sbs1(spark):
    register_sbs1_source(spark)
    return spark


def test_batch_file_replay_matches_text_source(sbs1, tmp_path):
    half = len(SAMPLE_LINES) // 2
    for i, chunk in enumerate((SAMPLE_LINES[:half], SAMPLE_LINES[half:])):
        (tmp_path / f"feed{i}.log").write_text("\n".join(chunk) + "\n")
    via_source = (sbs1.read.format("sbs1")
                  .option("path", str(tmp_path / "*.log")).load())
    via_text = sbs1.read.text(str(tmp_path))
    assert sorted(r.value for r in via_source.collect()) == \
        sorted(r.value for r in via_text.collect())
    # one partition per file -> a log archive fans out across executors
    assert via_source.rdd.getNumPartitions() == 2


def test_batch_replay_feeds_jvm_parser(sbs1, tmp_path):
    (tmp_path / "feed.log").write_text("\n".join(SAMPLE_LINES) + "\n")
    lines = (sbs1.read.format("sbs1")
             .option("path", str(tmp_path / "*.log")).load())
    msgs = parse_sbs1(lines)
    rows = msgs.collect()
    assert len(rows) > 0
    # the 22-width filter drops SEL/ID/AIR/STA/CLK short forms silently
    assert all(r.message_type == "MSG" for r in rows)
    assert all(r.transmission_type is not None for r in rows)
    assert all(r.hex_ident is not None for r in rows)


class _FeedHandler(socketserver.BaseRequestHandler):
    def handle(self):
        payload = "\r\n".join(SAMPLE_LINES) + "\r\n"
        self.request.sendall(payload.encode())
        time.sleep(30)  # hold the connection open while the stream drains


def test_socket_stream_end_to_end(sbs1, tmp_path):
    server = socketserver.ThreadingTCPServer(
        ("127.0.0.1", 0), _FeedHandler)
    server.daemon_threads = True
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        lines = (sbs1.readStream.format("sbs1")
                 .option("host", "127.0.0.1").option("port", str(port))
                 .option("connect_attempt_limit", "3")
                 .option("connect_attempt_delay", "0.1")
                 .load())
        q = (parse_sbs1(lines).writeStream.format("memory")
             .queryName("sbs1_live").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(processingTime="1 second").start())
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = sbs1.sql("SELECT count(*) c FROM sbs1_live").first().c
            if n >= 7:  # the 7 full-width MSG lines of the fixture set
                break
            time.sleep(1)
        q.stop()
        assert n >= 7
        callsigns = {r.callsign for r in sbs1.sql(
            "SELECT callsign FROM sbs1_live WHERE callsign IS NOT NULL"
        ).collect()}
        assert "RJA1118" in callsigns
    finally:
        server.shutdown()
        server.server_close()


def test_socket_bounded_retry_gives_up(sbs1):
    # no listener on this port: the reader must raise after N attempts,
    # failing the stream (reference semantics: bounded retries then exit)
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        dead_port = probe.getsockname()[1]
    lines = (sbs1.readStream.format("sbs1")
             .option("host", "127.0.0.1").option("port", str(dead_port))
             .option("connect_attempt_limit", "2")
             .option("connect_attempt_delay", "0.05")
             .load())
    q = (lines.writeStream.format("memory").queryName("sbs1_dead")
         .outputMode("append").trigger(processingTime="1 second").start())
    with pytest.raises(Exception):
        q.awaitTermination(30)
        raise RuntimeError("stream should have failed")  # pragma: no cover


class _FakeSocket:
    """recv() feeds scripted chunks, then signals peer close (b"")."""

    def __init__(self, chunks):
        self._chunks = list(chunks)

    def recv(self, _n):
        return self._chunks.pop(0) if self._chunks else b""

    def close(self):
        pass


def test_residual_cleared_on_peer_close():
    # A partial line left in the buffer when the peer closes must NOT be
    # spliced onto the first line of the next connection: that would
    # fabricate one corrupted record per reconnect.
    from dump1090_db_stream_spark.sources.sbs1_source import (
        SBS1SocketStreamReader,
    )

    r = SBS1SocketStreamReader({})
    r._sock = _FakeSocket([b"MSG,3,full line\nMSG,3,partial-no-newline"])
    lines, off = r.read({"n": 0})
    assert [ln for (ln,) in lines] == ["MSG,3,full line"]
    assert off == {"n": 1}
    assert r._sock is None          # reconnect scheduled
    assert r._residual == b""       # stale partial dropped, not carried
