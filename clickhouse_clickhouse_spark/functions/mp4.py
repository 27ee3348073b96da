"""ISO-BMFF (MP4/MOV) container demux — pure-Python structure parsing
from the PUBLIC ISO/IEC 14496-12 box layout. No codec and no ffmpeg:
this walks boxes, reads track metadata (mvhd/tkhd/mdhd/hdlr/stsd), and
resolves the sample tables (stsc x stsz x stco/co64) into per-sample
byte ranges — exactly what a large-scale video pipeline needs to
frame-SAMPLE: select every k-th encoded sample's bytes and hand them to
a downstream GPU decode stage. Motion-JPEG samples decode fully in-repo
(``functions/jpeg.py`` + ``pipeline/multimodal.decode_frames``; the
``build_mp4`` muxer below produces such files); H.264/HEVC frame DECODE
genuinely needs codec libraries and stays env-gated.

Reference parity: the upstream engine treats media as opaque strings and
leaves demux to UDFs; this module is the 100 TB-shaped version — all
parsing is per-row bytes work inside Arrow batches, nothing driver-side.
"""

from __future__ import annotations

import struct

_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for sibling boxes in
    [start, end) — 32-bit, 64-bit (size==1) and to-end (size==0) forms."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated 64-bit box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4: bad box size {size} at {pos}")
        yield btype.decode("latin1"), pos + hdr, pos + size
        pos += size


def _u32s(data: bytes, pos: int, n: int):
    import numpy as np
    return np.frombuffer(data, dtype=">u4", count=n, offset=pos) \
        .astype(np.int64)


def parse_mp4(data: bytes) -> dict:
    """Parse container structure: movie timescale/duration and one dict
    per track (handler, codec fourcc, dimensions, sample tables)."""
    out = {"major_brand": None, "timescale": None, "duration": None,
           "tracks": []}
    track = None

    def rec(s: int, e: int):
        nonlocal track
        for t, bs, be in _walk(data, s, e):
            if t == "ftyp":
                out["major_brand"] = data[bs:bs + 4].decode("latin1")
            elif t == "mvhd":
                v = data[bs]
                base = bs + (20 if v == 1 else 12)
                out["timescale"] = struct.unpack_from(">I", data, base)[0]
                out["duration"] = (
                    struct.unpack_from(">Q", data, base + 4)[0] if v == 1
                    else struct.unpack_from(">I", data, base + 4)[0])
            elif t == "trak":
                track = {"handler": None, "codec": None, "width": None,
                         "height": None, "timescale": None,
                         "duration": None, "sizes": None, "offsets": None,
                         "stsc": None, "n_samples": 0}
                rec(bs, be)
                out["tracks"].append(track)
                track = None
                continue
            elif t == "tkhd" and track is not None:
                v = data[bs]
                wpos = bs + (88 if v == 1 else 76)
                track["width"] = struct.unpack_from(
                    ">I", data, wpos)[0] >> 16        # 16.16 fixed point
                track["height"] = struct.unpack_from(
                    ">I", data, wpos + 4)[0] >> 16
            elif t == "mdhd" and track is not None:
                v = data[bs]
                base = bs + (20 if v == 1 else 12)
                track["timescale"] = struct.unpack_from(
                    ">I", data, base)[0]
                track["duration"] = (
                    struct.unpack_from(">Q", data, base + 4)[0] if v == 1
                    else struct.unpack_from(">I", data, base + 4)[0])
            elif t == "hdlr" and track is not None:
                track["handler"] = data[bs + 8:bs + 12].decode("latin1")
            elif t == "stsd" and track is not None:
                if struct.unpack_from(">I", data, bs + 4)[0] >= 1:
                    track["codec"] = data[bs + 12:bs + 16].decode("latin1")
            elif t == "stsz" and track is not None:
                import numpy as np
                fixed = struct.unpack_from(">I", data, bs + 4)[0]
                n = struct.unpack_from(">I", data, bs + 8)[0]
                track["n_samples"] = n
                track["sizes"] = (np.full(n, fixed, dtype=np.int64)
                                  if fixed else _u32s(data, bs + 12, n))
            elif t == "stco" and track is not None:
                n = struct.unpack_from(">I", data, bs + 4)[0]
                track["offsets"] = _u32s(data, bs + 8, n)
            elif t == "co64" and track is not None:
                import numpy as np
                n = struct.unpack_from(">I", data, bs + 4)[0]
                track["offsets"] = np.frombuffer(
                    data, dtype=">u8", count=n, offset=bs + 8
                ).astype(np.int64)
            elif t == "stsc" and track is not None:
                n = struct.unpack_from(">I", data, bs + 4)[0]
                track["stsc"] = _u32s(data, bs + 8, 3 * n).reshape(n, 3)
            if t in _CONTAINERS:
                rec(bs, be)

    rec(0, len(data))
    return out


def sample_ranges(track: dict):
    """Resolve (offset, size) for every sample of a parsed track —
    vectorized expansion of the stsc run-length chunk map against the
    chunk offsets and sample sizes (ISO 14496-12 §8.7)."""
    import numpy as np
    sizes, offsets, stsc = track["sizes"], track["offsets"], track["stsc"]
    if sizes is None or offsets is None or stsc is None:
        raise ValueError("mp4: track missing sample tables")
    n_chunks = offsets.size
    # samples-per-chunk for every chunk: stsc rows are (first_chunk,
    # samples_per_chunk, _), runs ending at the next row's first_chunk
    firsts = stsc[:, 0]
    spc_runs = stsc[:, 1]
    ends = np.append(firsts[1:], n_chunks + 1)
    spc = np.repeat(spc_runs, (ends - firsts))[:n_chunks]
    if spc.sum() != sizes.size:
        raise ValueError("mp4: stsc/stsz sample count mismatch")
    chunk_of_sample = np.repeat(np.arange(n_chunks), spc)
    # offset within chunk = cumsum of this chunk's preceding sizes
    cum = np.cumsum(sizes) - sizes
    chunk_first_sample = np.cumsum(spc) - spc
    within = cum - cum[chunk_first_sample][chunk_of_sample]
    return offsets[chunk_of_sample] + within, sizes


def probe_mp4(data: bytes) -> dict:
    """Flat metadata summary for the first video track (plus movie-level
    duration) — the probe_media analog for MP4 payloads."""
    p = parse_mp4(data)
    vid = next((t for t in p["tracks"] if t["handler"] == "vide"), None)
    dur = (p["duration"] / p["timescale"]
           if p["timescale"] else None)
    return {
        "format": "mp4", "major_brand": p["major_brand"],
        "duration_s": dur, "n_tracks": len(p["tracks"]),
        "video_codec": vid and vid["codec"],
        "width": vid and vid["width"], "height": vid and vid["height"],
        "n_samples": vid["n_samples"] if vid else 0,
    }


# --------------------------------------------------------------- mux

def _mkbox(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def build_mp4(samples: list, *, codec: str = "jpeg", width: int,
              height: int, timescale: int = 600,
              sample_duration: int = 100) -> bytes:
    """Minimal valid ISO-BMFF mux (public ISO/IEC 14496-12 layout): one
    video track, all samples in one chunk, fourcc ``codec``. With
    ``codec='jpeg'`` and baseline-JPEG sample payloads
    (``functions/jpeg.jpeg_encode``) this produces a Motion-JPEG file
    this repo can demux AND pixel-decode end-to-end — the first fully
    in-repo video path; other fourccs mux fine but decode stays gated."""
    if not samples:
        raise ValueError("build_mp4 needs at least one sample")
    if len(codec) != 4:
        raise ValueError(f"fourcc must be 4 chars, got {codec!r}")
    sizes = [len(s) for s in samples]
    n = len(samples)
    ftyp = _mkbox(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isomiso2")
    chunk_off = len(ftyp) + 8                 # sole chunk starts in mdat
    mdat = _mkbox(b"mdat", b"".join(samples))
    stsd = _mkbox(b"stsd", struct.pack(">II", 0, 1)
                  + _mkbox(codec.encode("latin1"), b"\x00" * 16))
    stts = _mkbox(b"stts", struct.pack(">IIII", 0, 1, n, sample_duration))
    stsc = _mkbox(b"stsc", struct.pack(">II", 0, 1)
                  + struct.pack(">III", 1, n, 1))
    stsz = _mkbox(b"stsz", struct.pack(">III", 0, 0, n)
                  + struct.pack(f">{n}I", *sizes))
    stco = _mkbox(b"stco", struct.pack(">II", 0, 1)
                  + struct.pack(">I", chunk_off))
    stbl = _mkbox(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _mkbox(b"minf", stbl)
    duration = n * sample_duration
    mdhd = _mkbox(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                       duration)
                  + struct.pack(">HH", 0x55C4, 0))
    hdlr = _mkbox(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                  + b"\x00" * 12 + b"v\x00")
    mdia = _mkbox(b"mdia", mdhd + hdlr + minf)
    tkhd = _mkbox(b"tkhd", struct.pack(">IIIIII", 0, 0, 0, 1, 0, duration)
                  + b"\x00" * 52
                  + struct.pack(">II", width << 16, height << 16))
    trak = _mkbox(b"trak", tkhd + mdia)
    mvhd = _mkbox(b"mvhd", struct.pack(">III", 0, 0, 0)
                  + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    moov = _mkbox(b"moov", mvhd + trak)
    return ftyp + mdat + moov
