"""Minimal pure-stdlib MP4 (ISO BMFF, ISO/IEC 14496-12) structure parser.

Walks the box tree to the video track's sample tables and computes the
byte range and timestamp of every sample — which makes frame
EXTRACTION from real MP4 files exact (operators.multimodal.
sample_frames) while H.264/H.265 DECODE stays behind the
optional-codec seam (no ffmpeg in this container).

Boxes read: moov/trak/mdia/{mdhd,hdlr}/minf/stbl/{stts,stsc,stsz,
stco|co64,stss}. Everything else is skipped structurally, so files
with edit lists, multiple tracks, or unknown vendor boxes still parse.
Fragmented MP4 (moof) is NOT supported — sample tables live in the
fragments there; the parser raises so the caller sees the seam, not a
silent empty result.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, box_end) for each box in a range.
    Handles 64-bit largesize (size==1) and to-end-of-file (size==0);
    stops — rather than loops — on a malformed size."""
    end = len(data) if end is None else end
    off = start
    while off + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, off)
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", data, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            return
        yield btype, off + hdr, off + size
        off += size


def _children(data: bytes, start: int, end: int, name: bytes):
    return [(s, e) for t, s, e in iter_boxes(data, start, end) if t == name]


def _child(data: bytes, start: int, end: int, name: bytes):
    boxes = _children(data, start, end, name)
    return boxes[0] if boxes else None


def _u32s(data: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", data, off))


@dataclass(frozen=True)
class Mp4Sample:
    """One video sample (frame): where its bytes live and when it shows."""
    index: int        # 1-based sample number (ISO BMFF convention)
    offset: int       # absolute byte offset of the sample in the file
    size: int         # sample byte length
    ts_ms: int        # decode timestamp, milliseconds
    is_sync: bool     # keyframe (listed in stss, or no stss box at all)


def is_mp4(data: bytes) -> bool:
    """ISO BMFF sniff: first box is ftyp (the practical invariant for
    .mp4/.mov files in the wild)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def video_sample_index(data: bytes) -> list[Mp4Sample]:
    """Byte ranges + timestamps of every sample in the first video
    track, reconstructed from the stbl tables:

    - stsc runs say how many samples each chunk holds,
    - stco/co64 give each chunk's file offset,
    - stsz gives per-sample sizes (samples pack back-to-back in a
      chunk, so intra-chunk offsets are running sums),
    - stts deltas accumulate into decode timestamps (mdhd timescale),
    - stss marks sync samples (absent -> every sample is sync).
    """
    moov = _child(data, 0, len(data), b"moov")
    if moov is None:
        if _child(data, 0, len(data), b"moof") is not None:
            raise ValueError("fragmented MP4 (moof) is not supported")
        raise ValueError("no moov box — not a (complete) MP4 file")

    for trak_s, trak_e in _children(data, moov[0], moov[1], b"trak"):
        mdia = _child(data, trak_s, trak_e, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _child(data, mdia[0], mdia[1], b"mdhd")
        if mdhd is None:
            continue
        version = data[mdhd[0]]
        timescale = struct.unpack_from(
            ">I", data, mdhd[0] + (20 if version == 1 else 12))[0]
        minf = _child(data, mdia[0], mdia[1], b"minf")
        stbl = minf and _child(data, minf[0], minf[1], b"stbl")
        if not stbl:
            continue

        def table(name: bytes):
            return _child(data, stbl[0], stbl[1], name)

        stsz, stsc, stts = table(b"stsz"), table(b"stsc"), table(b"stts")
        if not (stsz and stsc and stts):
            continue
        # stsz: fixed sample_size or per-sample list
        fixed_size, n_samples = struct.unpack_from(">II", data, stsz[0] + 4)
        try:
            sizes = ([fixed_size] * n_samples if fixed_size
                     else _u32s(data, stsz[0] + 12, n_samples))
        except struct.error as e:
            raise ValueError(
                f"stsz table shorter than its declared sample_count "
                f"({n_samples}) — truncated MP4") from e
        # chunk offsets: stco (32-bit) or co64
        stco = table(b"stco")
        if stco:
            n_chunks = struct.unpack_from(">I", data, stco[0] + 4)[0]
            chunk_offsets = _u32s(data, stco[0] + 8, n_chunks)
        else:
            co64 = table(b"co64")
            if not co64:
                continue
            n_chunks = struct.unpack_from(">I", data, co64[0] + 4)[0]
            chunk_offsets = list(struct.unpack_from(
                f">{n_chunks}Q", data, co64[0] + 8))
        # stsc runs -> samples-per-chunk for every chunk
        n_runs = struct.unpack_from(">I", data, stsc[0] + 4)[0]
        runs = [struct.unpack_from(">III", data, stsc[0] + 8 + 12 * i)
                for i in range(n_runs)]
        spc = []
        for i, (first_chunk, samples_per_chunk, _sdi) in enumerate(runs):
            last = (runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks)
            spc.extend([samples_per_chunk] * (last - first_chunk + 1))
        # stts deltas -> per-sample decode timestamps
        n_tts = struct.unpack_from(">I", data, stts[0] + 4)[0]
        ts, t = [], 0
        for i in range(n_tts):
            count, delta = struct.unpack_from(
                ">II", data, stts[0] + 8 + 8 * i)
            for _ in range(count):
                ts.append(t)
                t += delta
        if len(ts) < n_samples:
            # common truncated/re-muxed inconsistency: keep the error at
            # the documented ValueError seam, not a raw IndexError deep
            # inside a Spark task
            raise ValueError(
                f"stts covers {len(ts)} samples but stsz declares "
                f"{n_samples} — inconsistent MP4 sample tables")
        # stss -> sync sample set (absent means all-sync)
        stss = table(b"stss")
        if stss:
            n_sync = struct.unpack_from(">I", data, stss[0] + 4)[0]
            sync = set(_u32s(data, stss[0] + 8, n_sync))
        else:
            sync = None

        samples, si = [], 0
        for chunk_i, chunk_off in enumerate(chunk_offsets):
            off = chunk_off
            for _ in range(spc[chunk_i] if chunk_i < len(spc) else 0):
                if si >= n_samples:
                    break
                samples.append(Mp4Sample(
                    index=si + 1,
                    offset=off,
                    size=sizes[si],
                    ts_ms=ts[si] * 1000 // timescale if timescale else 0,
                    is_sync=(sync is None or (si + 1) in sync),
                ))
                off += sizes[si]
                si += 1
        return samples
    raise ValueError("no video (vide) track with sample tables found")


def sync_frame_plan(
    samples: list[Mp4Sample], every_ms: int, max_frames: int,
) -> list[Mp4Sample]:
    """Greedy keyframe schedule: walk sync samples in time order, keep
    the first whose timestamp reaches the next ``every_ms`` target, up
    to ``max_frames`` — the standard "one keyframe per N seconds"
    training-data sampling policy."""
    plan, next_target = [], 0
    for s in samples:
        if not s.is_sync:
            continue
        if s.ts_ms >= next_target:
            plan.append(s)
            next_target = s.ts_ms + every_ms
            if len(plan) >= max_frames:
                break
    return plan
