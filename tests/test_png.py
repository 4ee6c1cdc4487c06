"""Pure-Python PNG codec (functions.png) + the real multimodal decode
path it unlocks (operators.multimodal.extract_image_features with
decode_stub=False)."""

from __future__ import annotations

import struct
import zlib

import pytest

from dump1090_db_stream_spark.functions.png import (
    _SIGNATURE,
    decode_png,
    encode_png,
    luma_stats,
)


def _pixels(w, h, ch):
    """Deterministic gradient pixels."""
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip(ch):
    w, h = 17, 9  # odd sizes: catch stride bugs
    px = _pixels(w, h, ch)
    got = decode_png(encode_png(w, h, ch, px))
    assert got == (w, h, ch, bytearray(px))


def _png_with_filters(w, h, ch, px, filters):
    """Build a PNG applying a per-row filter list at encode time, so the
    decoder's reconstruction of every filter type is exercised."""
    stride = w * ch
    rows = []
    for y in range(h):
        orig = px[y * stride:(y + 1) * stride]
        prev = px[(y - 1) * stride:y * stride] if y else bytes(stride)
        f = filters[y]
        line = bytearray()
        for i in range(stride):
            left = orig[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else ul)
            line.append((orig[i] - pred) & 0xFF)
        rows.append(bytes([f]) + bytes(line))

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", crc))

    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def test_all_five_filters_reconstruct():
    w, h, ch = 8, 5, 3
    px = _pixels(w, h, ch)
    data = _png_with_filters(w, h, ch, px, filters=[0, 1, 2, 3, 4])
    assert decode_png(data) == (w, h, ch, bytearray(px))


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF not a png")
    # 16-bit depth
    bad = bytearray(encode_png(2, 2, 3, _pixels(2, 2, 3)))
    bad[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad))


def test_luma_stats_known_values():
    # 2x1 gray: pixels 0 and 255 -> mean 127.5/255, histogram split
    luma, feat = luma_stats(2, 1, 1, bytes([0, 255]), feature_dim=4)
    assert luma == pytest.approx(0.5)
    assert feat == [0.5, 0.0, 0.0, 0.5]


def test_real_decode_through_spark(spark):
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_image_features,
    )

    imgs = [(i, encode_png(6 + i, 4, 3, _pixels(6 + i, 4, 3)))
            for i in range(3)]
    df = spark.createDataFrame(imgs, ["media_id", "payload"])
    out = {r["media_id"]: r for r in
           extract_image_features(df, feature_dim=8,
                                  decode_stub=False).collect()}
    for i, png in imgs:
        w, h, ch, px = decode_png(png)
        luma, feat = luma_stats(w, h, ch, px, 8)
        assert out[i]["width"] == 6 + i
        assert out[i]["height"] == 4
        assert out[i]["n_bytes"] == len(png)
        assert out[i]["mean_luma"] == pytest.approx(luma)
        assert out[i]["feature"] == pytest.approx(feat)


def test_real_frame_sampling_from_concatenated_pngs(spark):
    from dump1090_db_stream_spark.functions.png import decode_png
    from dump1090_db_stream_spark.operators.multimodal import sample_frames

    # a 10-frame "video": ten 4x3 PNGs appended back to back, each
    # frame's pixels derived from its index
    frames = [encode_png(4, 3, 3, bytes([(f * 40 + i) % 256
                                         for i in range(36)]))
              for f in range(10)]
    df = spark.createDataFrame([(7, b"".join(frames))],
                               ["media_id", "payload"])
    out = sorted(sample_frames(df, every_ms=3, max_frames=3,
                               decode_stub=False).collect(),
                 key=lambda r: r["frame_index"])
    # frames 0, 3, 6 sampled; each is a complete, decodable PNG
    assert [r["frame_ts_ms"] for r in out] == [0, 3, 6]
    for r, fi in zip(out, [0, 3, 6]):
        assert bytes(r["frame_bytes"]) == frames[fi]
        w, h, ch, px = decode_png(bytes(r["frame_bytes"]))
        assert (w, h, ch) == (4, 3, 3)
        assert px[0] == (fi * 40) % 256


def test_frame_sampling_rejects_non_container(spark):
    from dump1090_db_stream_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"mp4 data here")],
                               ["media_id", "payload"])
    with pytest.raises(Exception, match="concatenated-PNG"):
        sample_frames(df, decode_stub=False).collect()
