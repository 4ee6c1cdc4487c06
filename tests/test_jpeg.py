"""Baseline JPEG codec (functions.jpeg): round-trip exactness at
quality=100, 4:2:0 MCU handling, restart markers, unsupported-format
carve-outs, and the real-decode dispatch through the multimodal seam."""

from __future__ import annotations

import pytest

from dump1090_db_stream_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(w: int, h: int, ch: int) -> bytes:
    if ch == 1:
        return bytes([(x * 13 + y * 7) % 256
                      for y in range(h) for x in range(w)])
    return bytes([(x * 13 + y * 7 + c * 40) % 256
                  for y in range(h) for x in range(w) for c in range(ch)])


def test_gray_roundtrip_exact_at_q100():
    w, h = 24, 17  # non-multiple of 8: edge-replicated partial MCUs
    px = _gradient(w, h, 1)
    got_w, got_h, ch, out = decode_jpeg(encode_jpeg(w, h, 1, px,
                                                    quality=100))
    assert (got_w, got_h, ch) == (w, h, 1)
    # all-ones quant tables: the only loss left is rounding irrational
    # DCT coefficients to integers — bounded at +/-2 per sample
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2


def test_rgb_444_roundtrip_near_lossless_at_q100():
    w, h = 40, 24
    px = _gradient(w, h, 3)
    got_w, got_h, ch, out = decode_jpeg(encode_jpeg(w, h, 3, px,
                                                    quality=100))
    assert (got_w, got_h, ch) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2


def test_rgb_420_flat_color_exact_and_gradient_bounded():
    w, h = 19, 13  # odd dims: chroma planes cover ceil(w/2) x ceil(h/2)
    flat = bytes([10, 200, 60] * (w * h))
    _, _, _, out = decode_jpeg(encode_jpeg(w, h, 3, flat, quality=100,
                                           subsample=True))
    assert bytes(out) == flat  # flat chroma survives 2x2 avg + upsample
    # SMOOTH gradient (no mod-256 wrap edges: 2x2 chroma averaging
    # across a wrap is inherent subsampling loss, not codec error)
    px = bytes([x * 3 + y * 2 + c * 10
                for y in range(h) for x in range(w) for c in range(3)])
    gw, gh, ch, out = decode_jpeg(encode_jpeg(w, h, 3, px, quality=85,
                                              subsample=True))
    assert (gw, gh, ch, len(out)) == (w, h, 3, w * h * 3)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 3


def test_restart_markers_do_not_change_pixels():
    w, h = 40, 24  # 15 MCUs at 4:4:4 -> several RST boundaries
    px = _gradient(w, h, 3)
    plain = decode_jpeg(encode_jpeg(w, h, 3, px, quality=100))
    with_rst = decode_jpeg(encode_jpeg(w, h, 3, px, quality=100,
                                       restart_interval=2))
    assert plain == with_rst  # resync path decodes IDENTICAL pixels
    assert max(abs(a - b) for a, b in zip(px, plain[3])) <= 2


def test_unsupported_formats_raise_at_the_seam():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    data = bytearray(encode_jpeg(8, 8, 1, bytes(64), quality=90))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite baseline SOF0 as progressive SOF2
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(8, 8, 1, bytes(64))[:40])  # truncated
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(8, 8, 1, bytes(64), quality=0)
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg(4, 4, 2, bytes(32))
    with pytest.raises(ValueError, match="mismatch"):
        encode_jpeg(8, 8, 1, bytes(63))


def test_real_decode_through_multimodal_seam(spark):
    """extract_image_features(decode_stub=False) dispatches PNG and
    JPEG payloads by signature in the SAME relation and reports real
    dimensions + real Rec.601 luma for both."""
    from dump1090_db_stream_spark.functions.png import encode_png, luma_stats
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_image_features,
    )

    w, h = 16, 8
    px = _gradient(w, h, 3)
    want_luma, _ = luma_stats(w, h, 3, px, 16)
    rows = [(0, bytearray(encode_jpeg(w, h, 3, px, quality=100))),
            (1, bytearray(encode_png(w, h, 3, px)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_image_features(
        media, decode_stub=False).collect()}
    for mid in (0, 1):
        assert (got[mid]["width"], got[mid]["height"]) == (w, h)
        # q=100 JPEG round-trips within +/-2 per sample -> luma agrees
        # to well under a gray level
        assert got[mid]["mean_luma"] == pytest.approx(want_luma,
                                                      abs=2 / 255)
    # histograms agree up to pixels landing one bucket over
    diff = sum(abs(a - b) for a, b in zip(got[0]["feature"],
                                          got[1]["feature"]))
    assert diff <= 0.1


def test_zigzag_order_matches_the_spec_sequence():
    """Pins the zigzag table to ITU T.81 Figure A.6's canonical
    flat-index sequence. Encoder and decoder share the table, so a
    wrong order (e.g. the transpose) still round-trips internally —
    only an external pin like this catches it, and it is what makes
    files from real encoders decode with correct geometry."""
    from dump1090_db_stream_spark.functions.jpeg import _ZIGZAG

    spec = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63]
    assert [r * 8 + c for r, c in _ZIGZAG] == spec
