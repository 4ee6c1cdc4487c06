"""Pure-stdlib MPEG audio (MP3/MP2/MP1) FRAME parser.

The lossy-audio rung of the codec family (``functions.png`` /
``functions.jpeg`` / ``functions.wav`` / ``functions.mp4``): the
container ships no ffmpeg/librosa, but the MPEG audio FRAMING layer —
the part a 100 TB ingest pipeline actually needs to profile, dedup-key
and duration-weight audio corpora — is fully specified by ISO/IEC
11172-3 / 13818-3 header tables, so it parses exactly with stdlib
``struct``:

- 4-byte frame header: sync, version (MPEG1/2/2.5), layer (I/II/III),
  bitrate index, sample-rate index, padding, channel mode, CRC flag
- per-frame byte length and per-frame PCM sample count, hence exact
  stream duration from a full frame walk (not a byte-size estimate)
- ID3v2 prefix (syncsafe size, optional footer) and ID3v1 trailer skip
- Xing/Info VBR header (frame/byte counts) in the first frame
- resync: garbage between frames is skipped byte-by-byte, like every
  robust MPEG parser

Every table below is pinned against the published spec values by
``tests/test_mp3.py`` (the JPEG zigzag lesson: codec tables are
verified against spec constants, not just round-trips).

SCOPE / HONEST SEAM: this module does NOT decode PCM. Full Layer III
synthesis needs the ISO polyphase window (11172-3 Table 3-B.3) and 34
Huffman code tables — numeric constants that must be transcribed from
the spec, not derived; shipping approximations would decode real files
WRONG silently. ``decode_frames`` raises ``NotImplementedError`` at
that seam; everything frame-structural above it is real.

Reference parity: the reference repo has no audio path at all — this
backs the multimodal extension surface
(``operators/multimodal.py`` audio kernels).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# ISO/IEC 11172-3 Table B.1 (MPEG1) and ISO/IEC 13818-3 (MPEG2; 2.5 is
# the de-facto extension using the same table) — bitrate in kbit/s by
# header index 1..14; index 0 is "free format", 15 is forbidden.
BITRATES_KBPS = {
    # (version_key, layer): index 1..14
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
               384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160),
}

# sample rate (Hz) by header index 0..2; index 3 reserved
SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}

# PCM samples carried per frame (drives both frame length and duration)
def samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    # Layer III: 1152 for MPEG1, 576 for MPEG2/2.5 (LSF)
    return 1152 if version == "1" else 576


# header version field (2 bits): 00=MPEG2.5, 01=reserved, 10=MPEG2, 11=MPEG1
_VERSIONS = {0b00: "2.5", 0b10: "2", 0b11: "1"}
# header layer field (2 bits): 01=III, 10=II, 11=I
_LAYERS = {0b01: 3, 0b10: 2, 0b11: 1}
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


@dataclass(frozen=True)
class FrameHeader:
    version: str          # "1" | "2" | "2.5"
    layer: int            # 1 | 2 | 3
    crc_protected: bool
    bitrate_kbps: int
    sample_rate: int
    padding: int          # 0/1
    mode: str
    channels: int
    frame_bytes: int      # total frame length including the header
    n_samples: int        # PCM samples this frame decodes to


def parse_frame_header(data: bytes, pos: int = 0) -> FrameHeader | None:
    """Parse the 4-byte MPEG audio header at ``pos``; None if the bytes
    are not a valid frame header (bad sync / reserved fields / free
    format, which carries no computable frame length)."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:     # 11-bit sync
        return None
    version = _VERSIONS.get((b1 >> 3) & 0x3)
    layer = _LAYERS.get((b1 >> 1) & 0x3)
    if version is None or layer is None:
        return None
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    vkey = "1" if version == "1" else "2"
    bitrate = BITRATES_KBPS[(vkey, layer)][bitrate_idx - 1] * 1000
    rate = SAMPLE_RATES[version][rate_idx]
    padding = (b2 >> 1) & 0x1
    mode = _MODES[(b3 >> 6) & 0x3]
    nsamp = samples_per_frame(version, layer)
    # ISO frame-length formulas: Layer I counts 4-byte slots
    # (384 samples / 8 bits / 4 bytes-per-slot = the canonical 12);
    # Layers II/III count bytes (nsamp/8 = 144 for MPEG1 L3, 72 LSF).
    if layer == 1:
        frame_bytes = (nsamp // 32 * bitrate // rate + padding) * 4
    else:
        frame_bytes = nsamp // 8 * bitrate // rate + padding
    return FrameHeader(
        version=version, layer=layer,
        crc_protected=(b1 & 0x1) == 0,
        bitrate_kbps=bitrate // 1000, sample_rate=rate,
        padding=padding, mode=mode,
        channels=1 if mode == "mono" else 2,
        frame_bytes=frame_bytes, n_samples=nsamp)


def skip_id3v2(data: bytes) -> int:
    """Byte offset of the first post-ID3v2 byte (0 if no ID3v2 tag).
    Size is 4 syncsafe bytes; flag 0x10 adds a 10-byte footer. A
    corrupt syncsafe size still skips the 10-byte tag header (never 0:
    resyncing through raw tag content — which often embeds album art
    full of spurious 0xFF sync patterns — would count phantom
    frames)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    flags = data[5]
    if any(b & 0x80 for b in data[6:10]):
        return 10                             # corrupt syncsafe size
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size + (10 if flags & 0x10 else 0)


def _id3v1_start(data: bytes) -> int:
    """Offset where an ID3v1 trailer begins, else len(data)."""
    if len(data) >= 128 and data[-128:-125] == b"TAG":
        return len(data) - 128
    return len(data)


def walk_frames(data: bytes) -> list[tuple[int, FrameHeader]]:
    """Walk every MPEG audio frame: returns [(byte_offset, header)].
    Skips a leading ID3v2 tag and a trailing ID3v1 tag, resyncs over
    garbage bytes, and requires each frame to FIT (a truncated final
    frame is dropped, matching stream-copy tooling)."""
    end = _id3v1_start(data)
    pos = skip_id3v2(data)
    out: list[tuple[int, FrameHeader]] = []
    while pos + 4 <= end:
        h = parse_frame_header(data, pos)
        if h is None or pos + h.frame_bytes > end:
            pos += 1                          # resync
            continue
        out.append((pos, h))
        pos += h.frame_bytes
    return out


def parse_xing(data: bytes, offset: int, h: FrameHeader) -> dict | None:
    """Xing/Info VBR header inside the frame at ``offset``: sits right
    after the side info (MPEG1: 17 bytes mono / 32 otherwise; MPEG2/2.5:
    9 / 17). Returns {"tag", "frames", "bytes"} with absent fields None."""
    if h.version == "1":
        side = 17 if h.channels == 1 else 32
    else:
        side = 9 if h.channels == 1 else 17
    p = offset + 4 + (2 if h.crc_protected else 0) + side
    tag = data[p:p + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    if len(data) < p + 8:
        return None                # tag at end-of-buffer, flags cut off
    (flags,) = struct.unpack(">I", data[p + 4:p + 8])
    p += 8
    # each flagged field is bounds-checked: a truncated buffer yields
    # a partial dict (field stays None), never a raw struct.error
    out = {"tag": tag.decode(), "frames": None, "bytes": None}
    if flags & 0x1:
        if len(data) < p + 4:
            return out
        (out["frames"],) = struct.unpack(">I", data[p:p + 4])
        p += 4
    if flags & 0x2:
        if len(data) < p + 4:
            return out
        (out["bytes"],) = struct.unpack(">I", data[p:p + 4])
        p += 4
    return out


def looks_like_mpeg_audio(data: bytes) -> bool:
    """Signature dispatch, tightened against random-bytes false
    positives (any 4-byte window has ~2^-14 odds of parsing as a lone
    header, so 'any header in 4 KiB' matched arbitrary binary): an
    ID3v2 prefix, or a valid frame header within the first 4 KiB that
    is CHAINED — the next header sits exactly ``frame_bytes`` later,
    or the frame ends the stream (single-frame clip). A random blob
    passing BOTH independent header checks at spec-linked offsets is
    ~2^-28 per position."""
    if data[:3] == b"ID3":
        return True
    end = _id3v1_start(data)
    horizon = min(end, 4096)
    for pos in range(horizon - 3):
        if data[pos] != 0xFF:
            continue
        h = parse_frame_header(data, pos)
        if h is None or pos + h.frame_bytes > end:
            continue
        nxt = pos + h.frame_bytes
        if nxt == end or parse_frame_header(data, nxt) is not None:
            return True
    return False


def mp3_stats(data: bytes) -> dict:
    """Real frame-level stream statistics from a FULL frame walk:

    n_frames, duration_ms (exact: sum of per-frame samples / rate),
    sample_rate, channels, layer, version, bitrate_kbps (mean over
    frames, rounded), vbr (True iff bitrate varies or a Xing tag with
    a frame count is present), xing_frames (tag value, for
    cross-checking against the walked count), and coverage — the
    fraction of the audio span (first frame to stream end, tags
    excluded) the walked frames actually occupy. Callers should
    distrust stats with low coverage: it means the walk mostly
    resynced over non-frame bytes, the signature of a false-positive
    dispatch or a badly corrupt stream.

    Raises ValueError if no complete frame is found.
    """
    frames = walk_frames(data)
    if not frames:
        raise ValueError("no MPEG audio frames found")
    first_off, first = frames[0]
    dur_ms = 0.0
    bitrates = []
    walked_bytes = 0
    for _, h in frames:
        dur_ms += h.n_samples * 1000.0 / h.sample_rate
        bitrates.append(h.bitrate_kbps)
        walked_bytes += h.frame_bytes
    span = _id3v1_start(data) - first_off
    xing = parse_xing(data, first_off, first)
    return {
        "coverage": round(walked_bytes / span, 6) if span > 0 else 0.0,
        "n_frames": len(frames),
        "duration_ms": int(round(dur_ms)),
        "sample_rate": first.sample_rate,
        "channels": first.channels,
        "layer": first.layer,
        "version": first.version,
        "bitrate_kbps": int(round(sum(bitrates) / len(bitrates))),
        "vbr": len(set(bitrates)) > 1 or (
            xing is not None and xing["tag"] == "Xing"
            and xing["frames"] is not None),
        "xing_frames": None if xing is None else xing["frames"],
    }


def decode_frames(data: bytes):  # pragma: no cover - documented seam
    """PCM synthesis seam. Layer III decode requires the ISO polyphase
    window (11172-3 Table 3-B.3, 512 transcribed constants) and the 34
    Huffman tables; shipping derived approximations would decode real
    files wrong SILENTLY, the exact failure mode the JPEG zigzag
    lesson guards against. Frame structure above this line is real."""
    raise NotImplementedError(
        "MPEG audio PCM synthesis requires the ISO filterbank window "
        "and Huffman tables — plug a real decoder in here")


def encode_cbr_stream(
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    n_frames: int = 10,
    mode: str = "mono",
    pad_pattern: tuple[int, ...] = (0,),
) -> bytes:
    """Test vehicle (the ``encode_wav`` discipline): emit a structurally
    valid CBR stream — correct headers and exact frame lengths, zeroed
    audio payload (decodes as digital silence in Layer I/II semantics).
    ``pad_pattern`` cycles the padding bit so tests exercise both
    frame-length branches."""
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    lbits = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    vkey = "1" if version == "1" else "2"
    bidx = BITRATES_KBPS[(vkey, layer)].index(bitrate_kbps) + 1
    ridx = SAMPLE_RATES[version].index(sample_rate)
    mbits = _MODES.index(mode)
    out = bytearray()
    for i in range(n_frames):
        pad = pad_pattern[i % len(pad_pattern)]
        b0 = 0xFF
        b1 = 0xE0 | (vbits << 3) | (lbits << 1) | 0x1   # no CRC
        b2 = (bidx << 4) | (ridx << 2) | (pad << 1)
        b3 = mbits << 6
        hdr = bytes((b0, b1, b2, b3))
        h = parse_frame_header(hdr)
        assert h is not None and h.frame_bytes >= 4
        out += hdr + b"\x00" * (h.frame_bytes - 4)
    return bytes(out)
