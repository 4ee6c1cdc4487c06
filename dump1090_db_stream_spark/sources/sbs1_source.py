"""Custom Python DataSource for SBS-1 BaseStation feeds (Spark 4
DataSource API) — the production-grade source path for S-1/S-2/S-3
(SURVEY.md §2.1; reference: dump1090-postgres.py:160-164, :204-239).

Two modes, one format name ("sbs1"):

- ``spark.read.format("sbs1").option("path", glob)`` — batch replay of
  raw SBS-1 log files. One InputPartition PER FILE, so a 10k-file
  archive fans out across all executors; each task streams its file
  line-by-line (constant memory, no whole-file reads).
- ``spark.readStream.format("sbs1").option("host", h).option("port", p)``
  — live socket feed. The reader owns one TCP connection and applies the
  reference's bounded-reconnect policy (connect_attempt_limit/-delay,
  dump1090-postgres.py:181-198) inside the source instead of around the
  query.

Both emit ONE COLUMN ``value: string`` (the raw wire line) — by design.
Parsing stays in ``functions.parser.parse_sbs1`` (pure Column
expressions, whole-stage codegen); the Python source only moves bytes.
Emitting typed rows from Python would drag the parser onto the slow
row-at-a-time path for every record.

Durability: the socket mode is at-most-once across restarts (a socket
has no replayable offsets), matching the reference's own non-durable
handling (dump1090-postgres.py:216-218). Within a run, the
SimpleDataSourceStreamReader wrapper caches each read for micro-batch
replay. For durable ingest, point the batch/file mode (or the file
streaming source in streaming/pipeline.py) at an archiver's output.
"""

from __future__ import annotations

import glob as globmod
import socket
import time
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType([StructField("value", StringType())])


class SBS1FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SBS1BatchReader(DataSourceReader):
    """Batch replay over raw SBS-1 log files, one partition per file."""

    def __init__(self, options: dict[str, str]):
        path = options.get("path")
        if not path:
            raise ValueError("sbs1 batch mode requires .option('path', <glob>)")
        self.paths = sorted(globmod.glob(path))

    def partitions(self) -> list[InputPartition]:
        return [SBS1FilePartition(p) for p in self.paths]

    def read(self, partition: SBS1FilePartition) -> Iterator[tuple[Any, ...]]:
        with open(partition.path, encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.rstrip("\n")
                if line:
                    yield (line,)


class SBS1SocketStreamReader(SimpleDataSourceStreamReader):
    """Live dump1090 socket feed with the reference's reconnect policy.

    Runs on the driver (SimpleDataSourceStreamReader contract); each
    micro-batch drains whatever lines arrived since the last one. The
    offset is a monotonic line counter — bookkeeping only, since a live
    socket cannot seek; restart recovery yields no rows (documented
    at-most-once, like the reference)."""

    def __init__(self, options: dict[str, str]):
        self.host = options.get("host", "localhost")
        self.port = int(options.get("port", "30003"))
        self.attempt_limit = int(options.get("connect_attempt_limit", "10"))
        self.attempt_delay = float(options.get("connect_attempt_delay", "5.0"))
        self.recv_timeout = float(options.get("recv_timeout", "0.2"))
        self.buffer_size = int(options.get("buffer_size", "10000"))
        self.max_lines_per_batch = int(
            options.get("max_lines_per_batch", "100000"))
        self._sock: socket.socket | None = None
        self._residual = b""

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _connect(self) -> socket.socket:
        attempts = 0
        while True:
            try:
                s = socket.create_connection((self.host, self.port), timeout=5)
                s.settimeout(self.recv_timeout)
                return s
            except OSError:
                attempts += 1
                if attempts >= self.attempt_limit:
                    raise
                time.sleep(self.attempt_delay)

    def read(self, start: dict) -> tuple[Iterator[tuple[Any, ...]], dict]:
        if self._sock is None:
            self._sock = self._connect()
        lines: list[tuple[str]] = []
        while len(lines) < self.max_lines_per_batch:
            try:
                chunk = self._sock.recv(self.buffer_size)
            except TimeoutError:
                break  # drained what was available this micro-batch
            except OSError:
                chunk = b""
            if not chunk:  # peer closed -> reconnect next batch
                self._sock.close()
                self._sock = None
                # drop the stale partial line: splicing it onto the first
                # line of the NEW connection would fabricate one corrupted
                # record (usually dropped by the 22-field filter, but it
                # could silently parse as a wrong row)
                self._residual = b""
                break
            buf = self._residual + chunk
            *complete, self._residual = buf.split(b"\n")
            lines.extend(
                (ln.decode("utf-8", errors="replace"),)
                for ln in complete if ln)
        return iter(lines), {"n": start["n"] + len(lines)}

    def readBetweenOffsets(
            self, start: dict, end: dict) -> Iterator[tuple[Any, ...]]:
        # post-restart replay: a socket cannot seek; yield nothing
        # (at-most-once across restarts, same as the reference)
        return iter(())

    def commit(self, end: dict) -> None:
        # deliberate no-op, not a stub: a live socket has no replayable
        # offset store to acknowledge — progress is tracked by Spark's
        # checkpoint, and the wire protocol has no consumer acks
        pass


class SBS1DataSource(DataSource):
    """format("sbs1"): batch file replay or live socket stream."""

    @classmethod
    def name(cls) -> str:
        return "sbs1"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> SBS1BatchReader:
        return SBS1BatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SBS1SocketStreamReader:
        return SBS1SocketStreamReader(self.options)


def register_sbs1_source(spark) -> None:
    """Make format('sbs1') available on this session."""
    spark.dataSource.register(SBS1DataSource)
