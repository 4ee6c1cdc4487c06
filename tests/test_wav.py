"""Pure-Python WAV codec (functions.wav) + the real audio decode path
(operators.multimodal.extract_audio_features with decode_stub=False)."""

from __future__ import annotations

import math

import pytest

from dump1090_db_stream_spark.functions.wav import (
    audio_stats,
    decode_wav,
    encode_wav,
)


def _sine(rate=8000, hz=440.0, ms=50):
    n = rate * ms // 1000
    return [math.sin(2 * math.pi * hz * i / rate) for i in range(n)]


@pytest.mark.parametrize("bits", [8, 16])
def test_roundtrip(bits):
    s = _sine()
    rate, ch, b, back = decode_wav(encode_wav(8000, 1, bits, s))
    assert (rate, ch, b) == (8000, 1, bits)
    tol = 1 / 64 if bits == 8 else 1 / 8192
    assert len(back) == len(s)
    assert max(abs(a - c) for a, c in zip(s, back)) < tol


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"ID3 this is an mp3 maybe")
    wav = bytearray(encode_wav(8000, 1, 16, _sine()))
    wav[20] = 3  # format code -> IEEE float
    with pytest.raises(ValueError, match="format code"):
        decode_wav(bytes(wav))


def test_audio_stats_known_values():
    # constant 0.5 signal: rms 0.5, all bands 0.5
    rate, ch = 1000, 1
    dur, rms, bands = audio_stats(rate, ch, [0.5] * 500, n_mfcc=5)
    assert dur == 500
    assert rms == pytest.approx(0.5)
    assert bands == pytest.approx([0.5] * 5)


def test_real_audio_decode_through_spark(spark):
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_audio_features,
    )

    clips = [(i, encode_wav(8000, 1, 16, _sine(hz=220.0 * (i + 1))))
             for i in range(3)]
    df = spark.createDataFrame(clips, ["media_id", "payload"])
    out = {r["media_id"]: r for r in extract_audio_features(
        df, n_mfcc=4, decode_stub=False).collect()}
    for i, wav in clips:
        rate, ch, _b, samples = decode_wav(wav)
        dur, rms, bands = audio_stats(rate, ch, samples, 4)
        assert out[i]["duration_ms"] == dur == 50
        assert out[i]["rms"] == pytest.approx(rms)
        assert out[i]["mfcc"] == pytest.approx(bands)
    # sine rms ~ 1/sqrt(2)
    assert out[0]["rms"] == pytest.approx(0.707, abs=0.01)


def test_non_wav_payload_raises_at_seam(spark):
    from dump1090_db_stream_spark.operators.multimodal import (
        extract_audio_features,
    )

    df = spark.createDataFrame([(1, b"not audio")],
                               ["media_id", "payload"])
    with pytest.raises(Exception, match="not a WAV"):
        extract_audio_features(df, decode_stub=False).collect()
