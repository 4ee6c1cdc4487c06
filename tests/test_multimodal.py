"""Multimodal plumbing tests (operators.multimodal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.multimodal import (
    attach_media_meta,
    extract_image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(256)) * (i + 1)) for i in range(4)]
    return spark.createDataFrame(rows, ["media_id", "payload"])


def test_attach_media_meta(media):
    out = attach_media_meta(media, "payload", "image", "png")
    row = out.collect()[0]
    assert row.media_meta.media_type == "image"
    assert row.media_meta.format == "png"
    assert row.media_meta.width is None


def test_extract_image_features_schema_and_determinism(media):
    out = extract_image_features(media, feature_dim=8)
    rows1 = {r.media_id: r for r in out.collect()}
    rows2 = {r.media_id: r for r in out.collect()}
    assert len(rows1) == 4
    for mid in rows1:
        assert rows1[mid].n_bytes == 256 * (mid + 1)
        assert len(rows1[mid].feature) == 8
        assert rows1[mid].feature == rows2[mid].feature  # deterministic
        assert abs(sum(rows1[mid].feature) - 1.0) < 1e-5


def test_extract_uses_arrow_batches(media):
    plan = extract_image_features(media)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan


def test_sample_frames_cardinality(media):
    out = sample_frames(media, max_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[0]) == 4  # 256 bytes -> 4 frames
    frames = sorted(by_id[0], key=lambda r: r.frame_index)
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000, 3000]
    assert len(frames[0].frame_bytes) == 64


def test_decode_stub_seam(media):
    # non-PNG payloads still raise at the codec seam on the real path
    with pytest.raises(Exception, match="not a PNG"):
        extract_image_features(media, decode_stub=False).collect()


def test_resize_images_normalizes_payload_size(media):
    from dump1090_db_stream_spark.operators.multimodal import resize_images

    out = resize_images(media, width=64, height=64).collect()
    assert len(out) == 4
    target = (64 * 64) // 64
    assert all(len(r.payload) == target for r in out)
    assert all((r.width, r.height) == (64, 64) for r in out)
    # deterministic: same input -> same resized bytes
    again = resize_images(media, width=64, height=64).collect()
    assert sorted(bytes(r.payload) for r in out) == \
        sorted(bytes(r.payload) for r in again)


def test_extract_audio_features(media):
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_audio_features,
    )

    out = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert len(out) == 4
    # stub duration: 256*(i+1) bytes at 32 B/ms
    assert out[0].duration_ms == 256 * 1000 // 32000
    assert out[3].n_bytes == 1024
    assert all(len(r.mfcc) == 13 for r in out.values())
    assert all(0.0 <= r.rms <= 1.0 for r in out.values())


def test_phash_real_decode_neardup_detection(spark):
    """The image dedup story end to end: the SAME picture as PNG and as
    JPEG (q=95) lands a few hamming bits apart; a different picture
    lands far; hamming_neardup_pairs finds exactly the re-encode pair."""
    from dump1090_db_stream_spark.functions.jpeg import encode_jpeg
    from dump1090_db_stream_spark.functions.png import encode_png
    from dump1090_db_stream_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from dump1090_db_stream_spark.operators.multimodal import phash_images

    w, h = 64, 48
    # structured image (gradient + diagonal band) — pHash needs real
    # spatial structure, not noise
    px_a = bytes(
        min(255, (x * 2 + y) % 256 if abs(x - y) > 6 else 250)
        for y in range(h) for x in range(w) for _ in range(3))
    px_b = bytes((x * 5 + y * y) % 256
                 for y in range(h) for x in range(w) for _ in range(3))
    rows = [(0, bytearray(encode_png(w, h, 3, px_a))),
            (1, bytearray(encode_jpeg(w, h, 3, px_a, quality=95))),
            (2, bytearray(encode_png(w, h, 3, px_b)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = phash_images(media, decode_stub=False)
    got = {r["media_id"]: r["phash"] for r in hashes.collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(got[0], got[1]) <= 6          # same picture, re-encoded
    assert ham(got[0], got[2]) > 10          # different picture
    pairs = hamming_neardup_pairs(hashes, "phash", max_hamming=6,
                                  n_chunks=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    # deterministic
    again = {r["media_id"]: r["phash"]
             for r in phash_images(media, decode_stub=False).collect()}
    assert again == got


def test_phash_stub_path_and_hamming_validation(spark):
    import pytest

    from dump1090_db_stream_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from dump1090_db_stream_spark.operators.multimodal import phash_images

    media = spark.createDataFrame(
        [(i, bytes([(i * 7 + j) % 256 for j in range(256)]))
         for i in range(4)], "media_id long, payload binary")
    out = phash_images(media).collect()
    assert len(out) == 4
    again = {r["media_id"]: r["phash"] for r in phash_images(media).collect()}
    assert again == {r["media_id"]: r["phash"] for r in out}
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_neardup_pairs(phash_images(media), "phash",
                              max_hamming=8, n_chunks=8)


def test_audio_fingerprint_neardup_detection(spark):
    """Same recording re-gained and lightly noised lands within a few
    bits; a different recording lands far; gain invariance is exact."""
    import math
    import random

    from dump1090_db_stream_spark.functions.wav import encode_wav
    from dump1090_db_stream_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from dump1090_db_stream_spark.operators.multimodal import (
        audio_fingerprints,
    )

    rate, n = 8000, 8000
    rng = random.Random(5)
    # amplitude-modulated tone: real energy structure across frames
    sig = [0.5 * math.sin(2 * math.pi * 440 * t / rate)
           * (0.3 + 0.7 * abs(math.sin(2 * math.pi * 3 * t / rate)))
           for t in range(n)]
    quiet = [0.25 * s for s in sig]                      # re-gained
    noisy = [s + rng.uniform(-0.01, 0.01) for s in sig]  # light noise
    other = [0.5 * math.sin(2 * math.pi * (200 + 900 * t / n) * t / rate)
             for t in range(n)]                          # chirp
    rows = [(0, bytearray(encode_wav(rate, 1, 16, sig))),
            (1, bytearray(encode_wav(rate, 1, 16, quiet))),
            (2, bytearray(encode_wav(rate, 1, 16, noisy))),
            (3, bytearray(encode_wav(rate, 1, 16, other)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["audio_fp"] for r in
           audio_fingerprints(media, decode_stub=False).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(got[0], got[1]) <= 2     # gain cancels in energy ratios
    assert ham(got[0], got[2]) <= 6     # light noise moves a few bits
    assert ham(got[0], got[3]) > 10     # different recording
    pairs = {(r["id_a"], r["id_b"]) for r in hamming_neardup_pairs(
        audio_fingerprints(media, decode_stub=False), "audio_fp",
        max_hamming=6, n_chunks=8).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_audio_real_path_mp3_frame_stats(spark):
    """The MPEG-audio seam now yields REAL frame-level values (r6
    verdict ask #7): duration_ms comes from an exact frame walk
    (functions.mp3), not a byte-size guess; the sample-level fields
    (rms/mfcc) are NULL because PCM synthesis remains the documented
    decode_frames seam. WAV payloads in the same batch keep full
    decode — signature dispatch, like the PNG/JPEG image twin."""
    import math

    from dump1090_db_stream_spark.functions.mp3 import encode_cbr_stream
    from dump1090_db_stream_spark.functions.wav import encode_wav
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_audio_features,
    )

    rate = 8000
    wav = encode_wav(rate, 1, 16,
                     [0.4 * math.sin(2 * math.pi * 440 * t / rate)
                      for t in range(4000)])
    mp3 = encode_cbr_stream("1", 3, 128, 44100, n_frames=38)
    # MP3 with an ID3v2 prefix must dispatch the same way
    id3 = (b"ID3\x04\x00\x00" + bytes((0, 0, 0, 64)) + b"\x00" * 64
           + encode_cbr_stream("2.5", 3, 16, 8000, n_frames=10))
    media = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(mp3)), (2, bytearray(id3))],
        "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_audio_features(
        media, decode_stub=False).collect()}
    assert out[0].duration_ms == 500 and out[0].rms is not None
    assert out[1].duration_ms == round(38 * 1152 * 1000 / 44100)
    assert out[1].rms is None and out[1].mfcc is None
    # MPEG2.5 Layer III: 576 samples/frame at 8 kHz -> 72 ms/frame
    assert out[2].duration_ms == round(10 * 576 * 1000 / 8000)


def test_audio_real_path_rejects_random_binary_and_dead_letters(spark):
    """ADVICE r7: a pseudo-random blob used to sniff as MPEG and
    yield FABRICATED stats (2 frames, 56 ms). Now: (a) random binary
    no longer sniffs as MPEG — it raises at the documented codec seam
    like any unknown format; (b) an MPEG stream that IS signatured
    (ID3 prefix) but has no walkable frames dead-letters to a
    NULL-duration row instead of failing the whole Arrow batch."""
    import pytest as _pytest

    from dump1090_db_stream_spark.functions.mp3 import (
        encode_cbr_stream,
        looks_like_mpeg_audio,
    )
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_audio_features,
    )

    x = 0x9E3779B97F4A7C15
    blob = bytearray()
    while len(blob) < 6400:
        x = (x ^ (x >> 12)) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x << 25)) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) & 0xFFFFFFFFFFFFFFFF
        blob += ((x * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) \
            .to_bytes(8, "big")
    assert not looks_like_mpeg_audio(bytes(blob))
    media = spark.createDataFrame([(0, bytearray(blob))],
                                  "media_id long, payload binary")
    with _pytest.raises(Exception, match="RIFF|WAV"):
        extract_audio_features(media, decode_stub=False).collect()

    # ID3-signatured but frameless / junk-tailed: NULL dead-letter rows
    # alongside a healthy stream in the SAME batch
    frameless = b"ID3\x04\x00\x00" + bytes((0, 0, 0, 10)) + b"\x00" * 10
    junk_tail = encode_cbr_stream("1", 3, 128, 44100, n_frames=2) \
        + b"\x00" * 4000          # coverage < 0.5 -> distrusted
    ok = encode_cbr_stream("1", 3, 128, 44100, n_frames=38)
    media = spark.createDataFrame(
        [(0, bytearray(frameless)), (1, bytearray(junk_tail)),
         (2, bytearray(ok))],
        "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_audio_features(
        media, decode_stub=False).collect()}
    assert out[0].duration_ms is None and out[0].n_bytes == len(frameless)
    assert out[1].duration_ms is None
    assert out[2].duration_ms == round(38 * 1152 * 1000 / 44100)


def test_audio_fingerprint_mp3_e2e(spark):
    """audio_fingerprints on a mixed WAV+MP3 corpus: WAV rows carry
    real fingerprints, MPEG rows flow through as NULL (PCM seam), and
    hamming_neardup_pairs over the mixed output neither errors nor
    pairs the NULL rows."""
    import math

    from dump1090_db_stream_spark.functions.mp3 import encode_cbr_stream
    from dump1090_db_stream_spark.functions.wav import encode_wav
    from dump1090_db_stream_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from dump1090_db_stream_spark.operators.multimodal import (
        audio_fingerprints,
    )

    rate, n = 8000, 8000
    sig = [0.5 * math.sin(2 * math.pi * 440 * t / rate)
           * (0.3 + 0.7 * abs(math.sin(2 * math.pi * 3 * t / rate)))
           for t in range(n)]
    quiet = [0.25 * s for s in sig]
    rows = [(0, bytearray(encode_wav(rate, 1, 16, sig))),
            (1, bytearray(encode_wav(rate, 1, 16, quiet))),
            (2, bytearray(encode_cbr_stream("1", 3, 128, 44100,
                                            n_frames=20)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = audio_fingerprints(media, decode_stub=False)
    got = {r["media_id"]: r["audio_fp"] for r in fps.collect()}
    assert got[2] is None and got[0] is not None
    pairs = {(r["id_a"], r["id_b"]) for r in hamming_neardup_pairs(
        fps, "audio_fp", max_hamming=6, n_chunks=8).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
