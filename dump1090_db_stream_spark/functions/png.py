"""Minimal pure-Python PNG codec (stdlib only: zlib + struct).

This is the first REAL codec behind the multimodal decode seam
(operators.multimodal): the container ships no PIL/opencv/ffmpeg, but
PNG's format is simple enough to decode with zlib, which IS stdlib —
so ``extract_image_features(decode_stub=False)`` can run genuine
decode -> pixel -> feature extraction end-to-end.

Scope (deliberately small, covers everything the tests generate):
- 8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA)
- non-interlaced, single IDAT or multiple concatenated IDATs
- all five PNG scanline filters (None/Sub/Up/Average/Paeth)

Anything else (16-bit, palette, interlace) raises ValueError — the
honest seam stays visible for formats this decoder does not speak.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a PNG into (width, height, channels, raw pixel bytes).

    Pixel bytes are row-major, ``channels`` interleaved, 8 bits each.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + payload + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("pixel data size mismatch")
    out = bytearray(height * stride)
    prev_row_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o:o + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                left = out[o + i - ch] if i >= ch else 0
                out[o + i] = (line[i] + left) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                up = out[prev_row_start + i] if y else 0
                out[o + i] = (line[i] + up) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = out[o + i - ch] if i >= ch else 0
                up = out[prev_row_start + i] if y else 0
                out[o + i] = (line[i] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[o + i - ch] if i >= ch else 0
                up = out[prev_row_start + i] if y else 0
                ul = out[prev_row_start + i - ch] if (y and i >= ch) else 0
                out[o + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        prev_row_start = o
    return width, height, ch, out


def encode_png(width: int, height: int, channels: int,
               pixels: bytes) -> bytes:
    """Encode raw 8-bit pixels as a PNG (filter 0 on every row).

    The test-side twin of :func:`decode_png` — lets the suite generate
    real PNGs deterministically without any imaging library.
    """
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scanlines = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height))
    return (_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines, 6))
            + chunk(b"IEND", b""))


def luma_stats(width: int, height: int, channels: int, pixels: bytes,
               feature_dim: int) -> tuple[float, list[float]]:
    """Rec.601 mean luma in [0,1] + normalized luma histogram of
    ``feature_dim`` buckets — the real-decode feature set mirroring the
    stub's (mean_luma, feature) contract."""
    n = width * height
    buckets = [0] * feature_dim
    total = 0
    if channels == 1:
        for v in pixels:
            total += v
            buckets[v * feature_dim // 256] += 1
    else:
        for p in range(0, n * channels, channels):
            y = (299 * pixels[p] + 587 * pixels[p + 1]
                 + 114 * pixels[p + 2]) // 1000
            total += y
            buckets[y * feature_dim // 256] += 1
    return (total / n) / 255.0, [b / n for b in buckets]
