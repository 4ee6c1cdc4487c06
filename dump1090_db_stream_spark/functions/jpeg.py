"""Minimal pure-Python baseline JPEG codec (stdlib only: math + struct).

Closes the largest real-media gap behind the multimodal decode seam
(operators.multimodal) the same way ``png.py``/``wav.py`` did: the
container ships no PIL/opencv, but baseline JPEG needs only Huffman
coding + an 8x8 DCT, both expressible in stdlib Python. With this
module ``extract_image_features(decode_stub=False)`` runs genuine
entropy-decode -> dequant -> IDCT -> upsample -> RGB on JPEG payloads.

Decoder scope (ITU T.81 baseline sequential, SOF0):
- 8-bit samples, 1 or 3 components, interleaved single scan
- ARBITRARY DQT / DHT segments (tables are parsed from the stream, so
  files from real encoders decode — nothing here assumes this module's
  own encoder), 16-bit quant entries included
- sampling factors 1-2 per axis (4:4:4, 4:2:2, 4:2:0, grayscale),
  nearest-neighbor chroma upsampling
- restart markers (DRI/RSTn) with DC-predictor reset

Progressive (SOF2), arithmetic coding, 12-bit depth, and >2 sampling
factors raise ValueError — the honest seam stays visible for formats
this decoder does not speak, exactly like png.py's 16-bit/interlace
carve-outs.

Encoder scope (the test vehicle, mirroring encode_png/encode_wav): a
VALID baseline JPEG bitstream that any decoder reads, built from
self-describing tables — flat-length canonical Huffman tables (4-bit
DC, 8-bit AC codes; suboptimal compression, zero memorized spec
constants) and a frequency-ramp quant table scaled by ``quality``
(quality=100 -> all-ones tables, making encode->decode round-trips
near-lossless: the only error left is FDCT/IDCT float rounding).
Supports 4:4:4 and 4:2:0 so the decoder's interleaved multi-block MCU
path is testable end to end.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------- shared

_ZIGZAG: list[tuple[int, int]] = []  # index -> (row, col), spec order


def _build_zigzag() -> None:
    # T.81 Figure A.6: odd diagonals walk DOWN from (0, s), even
    # diagonals walk UP to (0, s). (An earlier revision generated the
    # TRANSPOSE of this order; self round-trips could not see it —
    # encoder and decoder shared the table — so the order is pinned
    # against the spec's flat-index sequence in tests/test_jpeg.py.)
    for s in range(15):
        pts = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            pts.reverse()
        _ZIGZAG.extend(pts)


_build_zigzag()

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _clamp(v: float) -> int:
    return 0 if v < 0 else (255 if v > 255 else int(v))


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker (0xFF xx, xx != 0)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("marker inside entropy stream")
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align, consume the RSTn marker for restart index n."""
        self.nbits = 0
        if (self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (n % 8)):
            raise ValueError("expected restart marker")
        self.pos += 2


def _build_huff(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_block(coef: list[float]) -> list[list[float]]:
    """Separable 2-D inverse DCT of one 8x8 block (row-major coef)."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        row = coef[y * 8:y * 8 + 8]
        for x in range(8):
            tmp[y][x] = sum(_C[u] * row[u] * _COS[u][x]
                            for u in range(8)) / 2
    out = [[0.0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            out[y][x] = sum(_C[v] * tmp[v][x] * _COS[v][y]
                            for v in range(8)) / 2
    return out


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a baseline JPEG into (width, height, channels, pixels).

    Pixel bytes are row-major, ``channels`` interleaved (1=gray, 3=RGB),
    8 bits each — the same contract as :func:`png.decode_png`, so the
    multimodal feature kernels consume either format identically.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    hufftables: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    scan_comps: list[dict] = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — one or more tables per segment
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    qtables[tid] = list(seg[i:i + 64])
                    i += 64
                else:  # 16-bit entries
                    qtables[tid] = list(
                        struct.unpack(f">{64}H", seg[i:i + 128]))
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                hufftables[(tc, th)] = _build_huff(bits, values)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError(f"unsupported sampling {h}x{v}")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(only baseline sequential SOF0 is implemented)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("non-interleaved scans unsupported")
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan_comps.append({**comp, "td": tables >> 4,
                                   "ta": tables & 0x0F})
            break
        # APPn / COM / others: skipped

    if width is None or not scan_comps:
        raise ValueError("missing SOF0/SOS")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    planes = []
    for c in scan_comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append([[0] * pw for _ in range(ph)])

    r = _BitReader(data, pos)
    preds = [0] * len(scan_comps)
    rst_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            n_mcu = my * mcus_x + mx
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.align_and_expect_rst(rst_count)
                rst_count += 1
                preds = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                q = qtables[c["tq"]]
                dc_t = hufftables[(0, c["td"])]
                ac_t = hufftables[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0.0] * 64
                        t = _huff_decode(r, dc_t)
                        diff = _extend(r.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        zy, zx = _ZIGZAG[0]
                        coef[zy * 8 + zx] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zy, zx = _ZIGZAG[k]
                            coef[zy * 8 + zx] = _extend(
                                r.read_bits(size), size) * q[k]
                            k += 1
                        px = _idct_block(coef)
                        plane = planes[ci]
                        oy = (my * c["v"] + by) * 8
                        ox = (mx * c["h"] + bx) * 8
                        for y in range(8):
                            row = plane[oy + y]
                            for x in range(8):
                                row[ox + x] = px[y][x] + 128

    if len(scan_comps) == 1:
        out = bytearray(width * height)
        plane, c = planes[0], scan_comps[0]
        for y in range(height):
            base = y * width
            row = plane[y * c["v"] // vmax]
            for x in range(width):
                out[base + x] = _clamp(row[x * c["h"] // hmax] + 0.5)
        return width, height, 1, out

    out = bytearray(width * height * 3)
    cs = scan_comps
    for y in range(height):
        rows = [planes[i][y * cs[i]["v"] // vmax] for i in range(3)]
        base = y * width * 3
        for x in range(width):
            yy = rows[0][x * cs[0]["h"] // hmax]
            cb = rows[1][x * cs[1]["h"] // hmax] - 128
            cr = rows[2][x * cs[2]["h"] // hmax] - 128
            o = base + x * 3
            out[o] = _clamp(yy + 1.402 * cr + 0.5)
            out[o + 1] = _clamp(yy - 0.344136 * cb - 0.714136 * cr + 0.5)
            out[o + 2] = _clamp(yy + 1.772 * cb + 0.5)
    return width, height, 3, out


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


# Flat-length canonical tables: every DC category is a 4-bit code,
# every AC (run, size) symbol an 8-bit code. Valid (incomplete)
# Huffman trees with zero memorized constants; the DHT segments fully
# describe them, so any baseline decoder reads the output.
_DC_VALUES = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_VALUES = [0x00, 0xF0] + [(r << 4) | s
                             for r in range(16) for s in range(1, 11)]
_AC_BITS = [0] * 7 + [len(_AC_VALUES)] + [0] * 8
_DC_CODE = {v: (i, 4) for i, v in enumerate(_DC_VALUES)}
_AC_CODE = {v: (i, 8) for i, v in enumerate(_AC_VALUES)}


def _quant_table(quality: int, chroma: bool) -> list[int]:
    """Frequency-ramp table in zigzag order: low frequencies quantize
    finely, high coarsely; quality=100 gives all ones (near-lossless)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in 1..100, got {quality}")
    scale = (100 - quality) / 25.0  # 0.0 at q=100 .. 3.96 at q=1
    base = 2.0 if chroma else 1.0
    return [max(1, min(255, int(1 + base * scale * (zy + zx))))
            for zy, zx in _ZIGZAG]


def _fdct_quant(block: list[list[float]], q: list[int]) -> list[int]:
    """Forward DCT + quantize -> zigzag-ordered coefficient list."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for y in range(8):
            tmp[u][y] = sum(block[y][x] * _COS[u][x] for x in range(8))
    out = []
    for k, (zy, zx) in enumerate(_ZIGZAG):
        v, u = zy, zx
        s = sum(tmp[u][y] * _COS[v][y] for y in range(8))
        s *= _C[u] * _C[v] / 4
        out.append(int(round(s / q[k])))
    return out


def _encode_block(w: _BitWriter, coef: list[int], pred: int) -> int:
    diff = coef[0] - pred
    size = diff.bit_length() if diff else 0
    code, nbits = _DC_CODE[size]
    w.write(code, nbits)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last = max((k for k in range(1, 64) if coef[k]), default=0)
    for k in range(1, last + 1):
        if coef[k] == 0:
            run += 1
            continue
        while run > 15:
            code, nbits = _AC_CODE[0xF0]
            w.write(code, nbits)
            run -= 16
        v = coef[k]
        size = abs(v).bit_length()
        code, nbits = _AC_CODE[(run << 4) | size]
        w.write(code, nbits)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, nbits = _AC_CODE[0x00]
        w.write(code, nbits)
    return coef[0]


def _plane_block(plane: list[list[float]], ox: int, oy: int
                 ) -> list[list[float]]:
    h, w = len(plane), len(plane[0])
    return [[plane[min(oy + y, h - 1)][min(ox + x, w - 1)] - 128.0
             for x in range(8)] for y in range(8)]


def encode_jpeg(width: int, height: int, channels: int, pixels: bytes,
                quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode raw pixels (row-major, interleaved, 8-bit; 1=gray, 3=RGB)
    as a baseline JFIF JPEG. ``subsample=True`` writes 4:2:0 (RGB only);
    default is 4:4:4. ``restart_interval`` > 0 writes a DRI segment and
    emits RSTn markers every that many MCUs (exercises the decoder's
    resync path). See module docstring for the table strategy."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if subsample and channels == 1:
        raise ValueError("subsample applies to RGB input only")

    if channels == 1:
        planes = [[[float(pixels[y * width + x]) for x in range(width)]
                   for y in range(height)]]
    else:
        yp = [[0.0] * width for _ in range(height)]
        cbp = [[0.0] * width for _ in range(height)]
        crp = [[0.0] * width for _ in range(height)]
        for y in range(height):
            for x in range(width):
                o = (y * width + x) * 3
                r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
                yp[y][x] = 0.299 * r + 0.587 * g + 0.114 * b
                cbp[y][x] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
                crp[y][x] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            cw, ch_ = (width + 1) // 2, (height + 1) // 2
            def down(p):
                out = [[0.0] * cw for _ in range(ch_)]
                for y in range(ch_):
                    for x in range(cw):
                        vals = [p[min(2 * y + dy, height - 1)]
                                 [min(2 * x + dx, width - 1)]
                                for dy in range(2) for dx in range(2)]
                        out[y][x] = sum(vals) / 4.0
                return out
            planes = [yp, down(cbp), down(crp)]
        else:
            planes = [yp, cbp, crp]

    luma_q = _quant_table(quality, chroma=False)
    chroma_q = _quant_table(quality, chroma=True)
    if channels == 1:
        comp_spec = [{"id": 1, "h": 1, "v": 1, "tq": 0, "q": luma_q}]
    elif subsample:
        comp_spec = [{"id": 1, "h": 2, "v": 2, "tq": 0, "q": luma_q},
                     {"id": 2, "h": 1, "v": 1, "tq": 1, "q": chroma_q},
                     {"id": 3, "h": 1, "v": 1, "tq": 1, "q": chroma_q}]
    else:
        comp_spec = [{"id": 1, "h": 1, "v": 1, "tq": 0, "q": luma_q},
                     {"id": 2, "h": 1, "v": 1, "tq": 1, "q": chroma_q},
                     {"id": 3, "h": 1, "v": 1, "tq": 1, "q": chroma_q}]
    hmax = max(c["h"] for c in comp_spec)
    vmax = max(c["v"] for c in comp_spec)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # APP0 JFIF, no thumbnail
    for tid, q in ((0, luma_q), (1, chroma_q)) if channels == 3 else \
            ((0, luma_q),):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(q)
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(comp_spec), 8, height, width, len(comp_spec))
    for c in comp_spec:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    for tc_th in ((0x00,), (0x10,)) if channels == 1 else \
            ((0x00,), (0x10,), (0x01,), (0x11,)):
        tc = tc_th[0]
        bits, values = (_DC_BITS, _DC_VALUES) if tc < 0x10 else \
            (_AC_BITS, _AC_VALUES)
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_spec),
                                     len(comp_spec))
    for i, c in enumerate(comp_spec):
        tbl = 0x00 if i == 0 or channels == 1 else 0x11
        out += bytes([c["id"], tbl])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    w = _BitWriter()
    preds = [0] * len(comp_spec)
    rst_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            n_mcu = my * mcus_x + mx
            if (restart_interval and n_mcu
                    and n_mcu % restart_interval == 0):
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (rst_count % 8)])
                rst_count += 1
                preds = [0] * len(comp_spec)
            for ci, c in enumerate(comp_spec):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _plane_block(
                            planes[ci],
                            (mx * c["h"] + bx) * 8, (my * c["v"] + by) * 8)
                        coef = _fdct_quant(block, c["q"])
                        preds[ci] = _encode_block(w, coef, preds[ci])
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
