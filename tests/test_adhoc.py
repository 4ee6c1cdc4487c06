"""Ad-hoc README query corpus tests (operators.adhoc)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from dump1090_db_stream_spark.operators.adhoc import (
    callsign_lookup,
    last_24h,
    location_trace,
    track_lines,
)
from dump1090_db_stream_spark.operators.views import callsigns, locations
from dump1090_db_stream_spark.schema import ALL_COLUMNS, MESSAGE_SCHEMA


def ts(minute):
    return datetime.datetime(2020, 1, 1, 12, minute)


def msg(**kw):
    base = {c: None for c in ALL_COLUMNS}
    base.update(transmission_type=3, hex_ident="A6893C",
                generated_date=datetime.date(2020, 1, 1),
                generated_time="12:00:00.000", parsed_time=ts(0))
    base.update(kw)
    return Row(**{c: base[c] for c in ALL_COLUMNS})


@pytest.fixture(scope="module")
def messages(spark):
    rows = [
        msg(transmission_type=1, callsign="FDX26   ", parsed_time=ts(0)),
        msg(parsed_time=ts(1), lat=51.0, lon=-1.0, altitude=1000),
        msg(parsed_time=ts(2), lat=51.1, lon=-1.1, altitude=1100),
        msg(parsed_time=ts(3), lat=51.2, lon=-1.2, altitude=1200),
        msg(hex_ident="OTHER1", parsed_time=ts(4), lat=40.0, lon=2.0),
    ]
    return spark.createDataFrame(rows, MESSAGE_SCHEMA)


def test_callsign_lookup(messages):
    got = callsign_lookup(callsigns(messages), "FDX").collect()
    assert len(got) == 1 and got[0].callsign == "FDX26   "


def test_location_trace(messages):
    got = location_trace(locations(messages), "A6893C").collect()
    assert len(got) == 3
    assert all(r.hex_ident == "A6893C" for r in got)


def test_track_lines_window_query(messages):
    got = track_lines(locations(messages)).collect()
    a = sorted([r for r in got if r.hex_ident == "A6893C"], key=lambda r: r.seq)
    # 3 fixes -> 2 segments (last point dropped, W-4)
    assert len(a) == 2
    assert [r.seq for r in a] == [1, 2]
    assert a[0].geom.lon == pytest.approx(-1.0, abs=1e-4)
    assert a[0].geom2.lat == pytest.approx(51.1, abs=1e-4)
    assert a[0].segment.start.srid == 4326
    # single-fix aircraft contributes no segment
    assert not [r for r in got if r.hex_ident == "OTHER1"]


def test_last_24h(spark):
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    rows = [msg(parsed_time=now - datetime.timedelta(hours=h)) for h in (1, 23, 30)]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    assert last_24h(df).count() == 2
