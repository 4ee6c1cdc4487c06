"""MP4 structure parsing + real frame sampling (functions.mp4,
operators.multimodal.sample_frames MP4 path).

The fixture is a minimal-but-valid ISO BMFF file built box-by-box with
struct.pack: 10 video samples of distinct bytes across two chunks,
100 ms apart (timescale 1000), keyframes at samples 1/4/7/10 — enough
structure to exercise stsz/stsc/stco/stts/stss reconstruction exactly.
"""

from __future__ import annotations

import struct

from dump1090_db_stream_spark.functions.mp4 import (
    is_mp4,
    sync_frame_plan,
    video_sample_index,
)

# 1-based sample i carries byte value i, length 19+i (sizes 20..29)
SAMPLES = [bytes([i]) * (19 + i) for i in range(1, 11)]
SYNC = [1, 4, 7, 10]


def _box(t: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + t + payload


def _full(t: bytes, payload: bytes) -> bytes:
    return _box(t, b"\x00\x00\x00\x00" + payload)


def build_fixture_mp4() -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat = _box(b"mdat", b"".join(SAMPLES))
    data_off = len(ftyp) + 8                      # mdat payload start
    chunk2_off = data_off + sum(len(s) for s in SAMPLES[:6])

    stts = _full(b"stts", struct.pack(">III", 1, 10, 100))
    stsc = _full(b"stsc", struct.pack(">I", 2)
                 + struct.pack(">III", 1, 6, 1)   # chunk 1: 6 samples
                 + struct.pack(">III", 2, 4, 1))  # chunk 2+: 4 samples
    stsz = _full(b"stsz", struct.pack(">II", 0, 10)
                 + b"".join(struct.pack(">I", len(s)) for s in SAMPLES))
    stco = _full(b"stco", struct.pack(">III", 2, data_off, chunk2_off))
    stss = _full(b"stss", struct.pack(">I", len(SYNC))
                 + b"".join(struct.pack(">I", s) for s in SYNC))
    stbl = _box(b"stbl", stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", stbl)
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 1000, 1000, 0, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov


def test_sniff_and_index():
    data = build_fixture_mp4()
    assert is_mp4(data) and not is_mp4(b"\x89PNG\r\n\x1a\nrest")
    idx = video_sample_index(data)
    assert len(idx) == 10
    # every sample's byte range points at exactly its planted payload
    for s, planted in zip(idx, SAMPLES):
        assert data[s.offset:s.offset + s.size] == planted
    assert [s.ts_ms for s in idx] == [i * 100 for i in range(10)]
    assert [s.index for s in idx if s.is_sync] == SYNC


def test_sync_frame_plan_spacing():
    idx = video_sample_index(build_fixture_mp4())
    plan = sync_frame_plan(idx, every_ms=300, max_frames=8)
    assert [s.index for s in plan] == [1, 4, 7, 10]
    assert [s.ts_ms for s in plan] == [0, 300, 600, 900]
    # max_frames truncates
    assert len(sync_frame_plan(idx, every_ms=100, max_frames=2)) == 2


def test_no_stss_means_all_sync():
    data = build_fixture_mp4()
    # drop the stss box by rebuilding without it: parser must treat
    # every sample as a keyframe
    stss_at = data.find(b"stss") - 4
    size = struct.unpack_from(">I", data, stss_at)[0]
    stripped = data[:stss_at] + data[stss_at + size:]
    # fix ancestor sizes (stbl/minf/mdia/trak/moov each shrink by size)
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = stripped.find(name) - 4
        old = struct.unpack_from(">I", stripped, at)[0]
        stripped = (stripped[:at] + struct.pack(">I", old - size)
                    + stripped[at + 4:])
    idx = video_sample_index(stripped)
    assert all(s.is_sync for s in idx) and len(idx) == 10


def test_sample_frames_mp4_end_to_end(spark):
    """Through Spark: the mapInPandas kernel sniffs MP4 and emits the
    exact keyframe byte ranges, one row per sampled frame."""
    from dump1090_db_stream_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(7, bytearray(build_fixture_mp4()))], "media_id long, payload binary")
    out = sorted(
        sample_frames(df, every_ms=300, max_frames=8,
                      decode_stub=False).collect(),
        key=lambda r: r["frame_index"])
    assert [(r["frame_index"], r["frame_ts_ms"]) for r in out] == [
        (0, 0), (1, 300), (2, 600), (3, 900)]
    assert [bytes(r["frame_bytes"]) for r in out] == [
        SAMPLES[0], SAMPLES[3], SAMPLES[6], SAMPLES[9]]


def test_malformed_inputs_raise_at_the_seam():
    import pytest

    # fragmented MP4: moof instead of moov
    frag = _box(b"ftyp", b"isomAAAA") + _box(b"moof", b"")
    with pytest.raises(ValueError, match="fragmented"):
        video_sample_index(frag)
    # no moov at all
    with pytest.raises(ValueError, match="no moov"):
        video_sample_index(_box(b"ftyp", b"isomAAAA") + _box(b"mdat", b"x"))
    # truncated box size beyond EOF must stop parsing, not loop/crash
    bad = _box(b"ftyp", b"isomAAAA") + struct.pack(">I4s", 1 << 30, b"mdat")
    with pytest.raises(ValueError, match="no moov"):
        video_sample_index(bad)
    # audio-only file: moov/trak with soun handler
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"soun"
                 + b"\x00" * 12 + b"\x00")
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", hdlr)))
    with pytest.raises(ValueError, match="no video"):
        video_sample_index(_box(b"ftyp", b"isomAAAA") + moov)


def test_inconsistent_sample_tables_raise_valueerror():
    """stts shorter than stsz (truncated/re-muxed file) must surface as
    the documented ValueError seam, not an IndexError inside a task."""
    import pytest

    data = build_fixture_mp4()
    # rewrite stts to cover only 9 of the 10 declared samples
    stts_at = data.find(b"stts") + 4
    patched = (data[:stts_at + 4]
               + struct.pack(">III", 1, 9, 100)
               + data[stts_at + 16:])
    with pytest.raises(ValueError, match="stts covers 9"):
        video_sample_index(patched)
