"""dump1090 ``aircraft.json`` snapshot source.

Besides the SBS-1 TCP feed the reference ingests
(dump1090-postgres.py:204-239), every dump1090 deployment also serves
periodic JSON state snapshots over HTTP (``/data/aircraft.json`` —
dump1090-mutability's documented README format): a top-level ``now``
epoch timestamp and an ``aircraft`` array of per-plane state dicts.
Archives of those snapshots are the other wire format a reference user
holds; this module turns them into the same typed message shape the
SBS-1 parser produces, so the downstream views/queries run unchanged.

Spark shape: one ``from_json`` with an explicit schema (never inferred
— snapshot fields drift across dump1090 forks, and inference would
shuffle-scan the corpus), ``explode`` of the aircraft array, then a
narrow typed projection. Works identically on batch (``spark.read``)
and streaming (``readStream``) inputs since every step is a stateless
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Explicit snapshot schema (dump1090-mutability README "aircraft.json"):
#: only the fields our message projection consumes, plus seen/rssi for
#: staleness filtering. Extra JSON keys are ignored by from_json.
AIRCRAFT_JSON_SCHEMA = T.StructType([
    T.StructField("now", T.DoubleType()),
    T.StructField("messages", T.LongType()),
    T.StructField("aircraft", T.ArrayType(T.StructType([
        T.StructField("hex", T.StringType()),
        T.StructField("squawk", T.StringType()),
        T.StructField("flight", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("altitude", T.LongType()),
        T.StructField("vert_rate", T.LongType()),
        T.StructField("track", T.LongType()),
        T.StructField("speed", T.LongType()),
        T.StructField("seen", T.DoubleType()),
        T.StructField("rssi", T.DoubleType()),
    ]))),
])


def parse_aircraft_json(
    snapshots: DataFrame,
    value_col: str = "value",
    max_seen_s: float | None = None,
) -> DataFrame:
    """Parse raw ``aircraft.json`` document strings (one snapshot per
    row — the shape of ``spark.read.text(..., wholetext=True)`` or a
    stream of polled HTTP bodies) into one typed row per aircraft
    observation.

    Output columns mirror the SBS-1 message names (hex_ident, callsign,
    altitude, ground_speed, track, lat, lon, vertical_rate, squawk)
    plus ``snapshot_time`` (the ``now`` epoch as a timestamp), ``seen``
    and ``rssi``. ``max_seen_s`` drops stale entries (aircraft not
    heard for more than N seconds keep appearing in snapshots with a
    growing ``seen`` — the standard dedup-at-source filter).

    Malformed documents yield a NULL struct from ``from_json`` and are
    dropped (the snapshot analog of the SBS-1 width filter F-4).
    """
    doc = snapshots.select(
        F.from_json(F.col(value_col), AIRCRAFT_JSON_SCHEMA).alias("j"))
    rows = (
        doc.filter(F.col("j").isNotNull()
                   & F.col("j.aircraft").isNotNull())
        .select(F.col("j.now").alias("_now"),
                F.explode("j.aircraft").alias("a"))
    )
    out = rows.select(
        F.timestamp_seconds(F.col("_now")).alias("snapshot_time"),
        F.upper(F.col("a.hex")).alias("hex_ident"),
        F.trim(F.col("a.flight")).alias("callsign"),
        F.col("a.altitude").cast("int").alias("altitude"),
        F.col("a.speed").cast("int").alias("ground_speed"),
        F.col("a.track").cast("int").alias("track"),
        F.col("a.lat").cast("float").alias("lat"),
        F.col("a.lon").cast("float").alias("lon"),
        F.col("a.vert_rate").cast("float").alias("vertical_rate"),
        F.col("a.squawk").alias("squawk"),
        F.col("a.seen").alias("seen"),
        F.col("a.rssi").alias("rssi"),
    ).filter(F.col("hex_ident").isNotNull())
    if max_seen_s is not None:
        out = out.filter(F.col("seen") <= F.lit(float(max_seen_s)))
    return out


def read_aircraft_json(spark, path: str,
                       max_seen_s: float | None = None) -> DataFrame:
    """Batch-read archived snapshots: one JSON document per FILE
    (``wholetext``), the layout a curl-in-cron archiver produces."""
    raw = spark.read.text(path, wholetext=True)
    return parse_aircraft_json(raw, max_seen_s=max_seen_s)


# --- live HTTP polling stream: the way a real dump1090 serves this ------
# A running dump1090 exposes /data/aircraft.json over HTTP and rewrites
# it every second; deployments poll it on an interval. The polling
# stream reader below completes the ecosystem: format("aircraft_json")
# readStream -> parse_aircraft_json is the HTTP analog of the
# format("sbs1") socket stream (sources/sbs1_source.py:84).


def _poll_classes():
    """Build the DataSource classes on first registration so this module
    stays importable for its pure batch helpers without touching the
    DataSource API surface."""
    import hashlib
    import json as jsonmod
    import time
    import urllib.request
    from collections.abc import Iterator
    from typing import Any

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    schema = T.StructType([T.StructField("value", T.StringType())])

    class AircraftJsonPollStreamReader(SimpleDataSourceStreamReader):
        """Polls ``url`` at ``poll_interval_s``, emitting each NEW
        snapshot document as one raw-string row (parsing stays in
        parse_aircraft_json — JVM-side, codegen'd; the Python reader
        only moves bytes, the sbs1 division of labor).

        Delivery semantics: WITHIN a run, at-least-once per observed
        snapshot — the SimpleDataSourceStreamReader wrapper caches each
        read() for micro-batch replay, and consecutive identical
        snapshots are deduped by the document's ``now`` stamp (the
        server rewrites the file on its own clock; polling faster than
        it writes must not duplicate rows). ACROSS restarts,
        at-most-once: HTTP has no replayable offset to refetch history
        from — same durability class as the reference's socket ingest
        (dump1090-postgres.py:216-218). Transient HTTP errors skip the
        batch and retry next trigger, bounded by
        ``poll_attempt_limit`` consecutive failures (the reference's
        bounded-reconnect policy, dump1090-postgres.py:181-198)."""

        def __init__(self, options: dict[str, str]):
            self.url = options.get("url")
            if not self.url:
                raise ValueError(
                    "aircraft_json stream requires .option('url', ...)")
            self.poll_interval_s = float(options.get("poll_interval_s", "1.0"))
            self.request_timeout_s = float(
                options.get("request_timeout_s", "5.0"))
            self.attempt_limit = int(options.get("poll_attempt_limit", "10"))
            self._last_poll = float("-inf")
            self._last_now: float | None = None
            self._last_bad: str | None = None  # digest of a malformed body
            self._failures = 0

        def initialOffset(self) -> dict:
            return {"n": 0}

        def read(self, start: dict) -> tuple[Iterator[tuple[Any, ...]], dict]:
            mono = time.monotonic()
            if mono - self._last_poll < self.poll_interval_s:
                return iter(()), start  # not due yet: empty micro-batch
            self._last_poll = mono
            try:
                with urllib.request.urlopen(
                        self.url, timeout=self.request_timeout_s) as resp:
                    body = resp.read().decode("utf-8", errors="replace")
                self._failures = 0
            except OSError:
                self._failures += 1
                if self._failures >= self.attempt_limit:
                    raise
                return iter(()), start
            try:
                snap_now = jsonmod.loads(body).get("now")
            except ValueError:
                snap_now = None  # malformed body still flows downstream
            if snap_now is not None:
                if snap_now == self._last_now:
                    return iter(()), start  # server hasn't rewritten yet
                self._last_now = snap_now  # NOT cleared on malformed
                self._last_bad = None
            else:
                # a malformed body has no `now` stamp to dedupe on; use
                # its own digest so a STATIC broken document (crashed
                # writer) is delivered once, not once per poll forever
                digest = hashlib.md5(body.encode()).hexdigest()
                if digest == self._last_bad:
                    return iter(()), start
                self._last_bad = digest
            return iter([(body,)]), {"n": start["n"] + 1}

        def readBetweenOffsets(
                self, start: dict, end: dict) -> Iterator[tuple[Any, ...]]:
            # post-restart replay: HTTP polling cannot refetch history
            return iter(())

        def commit(self, end: dict) -> None:
            # no consumer acks in HTTP polling; progress lives in
            # Spark's checkpoint
            pass

    class AircraftJsonDataSource(DataSource):
        """format("aircraft_json"): live HTTP-polling snapshot stream."""

        @classmethod
        def name(cls) -> str:
            return "aircraft_json"

        def schema(self):
            return schema

        def simpleStreamReader(self, schema):  # noqa: A002
            return AircraftJsonPollStreamReader(self.options)

    return AircraftJsonDataSource


def register_aircraft_json_source(spark) -> None:
    """Make format('aircraft_json') available on this session."""
    spark.dataSource.register(_poll_classes())


def read_aircraft_json_stream(
    spark,
    url: str,
    poll_interval_s: float = 1.0,
    max_seen_s: float | None = None,
) -> DataFrame:
    """Live typed stream from a running dump1090: register the polling
    source, read it, and parse — the HTTP analog of the sbs1 socket
    pipeline. Returns the typed per-aircraft stream ready for
    windows/watermarks on ``snapshot_time``."""
    register_aircraft_json_source(spark)
    raw = (spark.readStream.format("aircraft_json")
           .option("url", url)
           .option("poll_interval_s", str(poll_interval_s))
           .load())
    return parse_aircraft_json(raw, max_seen_s=max_seen_s)
