"""Minimal pure-Python WAV (RIFF) PCM codec — stdlib struct only.

The audio twin of ``functions.png``: the container ships no
librosa/soundfile, but canonical RIFF/WAVE with integer PCM is simple
enough to parse directly, so
``operators.multimodal.extract_audio_features(decode_stub=False)`` can
run genuine decode -> sample -> feature extraction.

Scope: PCM format 1 (integer), 8/16-bit, any channel count / sample
rate, 'fmt ' + 'data' chunks in any order with unknown chunks skipped.
Anything else (float PCM, ADPCM, mp3-in-RIFF) raises ValueError — the
honest seam for formats this parser does not speak.
"""

from __future__ import annotations

import struct


def decode_wav(data: bytes) -> tuple[int, int, int, list[float]]:
    """Decode a WAV into (sample_rate, channels, bits, samples) where
    samples are channel-interleaved floats in [-1, 1]."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    rate = channels = bits = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise ValueError(f"unsupported WAV format code {fmt}")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
        elif cid == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if bits == 8:  # unsigned
        samples = [(b - 128) / 128.0 for b in pcm]
    else:  # 16-bit signed little-endian
        n = len(pcm) // 2
        samples = [v / 32768.0 for v in
                   struct.unpack(f"<{n}h", pcm[:n * 2])]
    return rate, channels, bits, samples


def encode_wav(rate: int, channels: int, bits: int,
               samples: list[float]) -> bytes:
    """Encode float samples in [-1, 1] as canonical PCM WAV (the
    test-side twin of :func:`decode_wav`)."""
    if bits == 8:
        pcm = bytes(min(255, max(0, int(round(s * 128 + 128))))
                    for s in samples)
    elif bits == 16:
        pcm = struct.pack(
            f"<{len(samples)}h",
            *(min(32767, max(-32768, int(round(s * 32768))))
              for s in samples))
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_stats(rate: int, channels: int, samples: list[float],
                n_mfcc: int) -> tuple[int, float, list[float]]:
    """(duration_ms, rms, band-energy vector) from decoded samples —
    the real-decode feature set mirroring the stub's contract. The
    "mfcc" stand-in is a coarse spectral proxy: mean absolute sample
    value over n_mfcc equal time bands (no FFT dependency), which is
    deterministic and discriminative enough for pipeline plumbing."""
    n_frames = len(samples) // max(1, channels)
    duration_ms = n_frames * 1000 // max(1, rate)
    if not samples:
        return duration_ms, 0.0, [0.0] * n_mfcc
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
    bands = []
    step = max(1, len(samples) // n_mfcc)
    for i in range(n_mfcc):
        seg = samples[i * step:(i + 1) * step]
        bands.append(sum(abs(s) for s in seg) / len(seg) if seg else 0.0)
    return duration_ms, rms, bands
