"""Minimal PNG codec — pure stdlib (zlib/struct) + numpy.

The container has no media libraries, but PNG needs none: the format is
zlib-compressed filtered scanlines (public W3C PNG spec / RFC 2083).
This gives the multimodal pipeline a REAL decode/transform/encode kernel
for one concrete format; JPEG/video stay gated on external libs.

Scope: 8-bit RGB / RGBA / greyscale, non-interlaced. Decode handles all
five scanline filters (None/Sub/Up/Average/Paeth); encode writes filter
0 (None) — valid PNG, just uncompressed-friendly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray) -> bytes:
    """Encode (H, W) greyscale or (H, W, 3|4) uint8 array as a valid PNG
    (filter 0 scanlines, one zlib stream)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, channels = 2, 3
        h, w = arr.shape[:2]
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, channels = 6, 4
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines, 6))
            + _chunk(b"IEND", b""))


def png_meta(data: bytes) -> dict:
    """Parse IHDR without decompressing pixel data (the cheap probe)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("corrupt PNG (IHDR not first chunk)")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29])
    return {"width": int(w), "height": int(h), "bit_depth": int(depth),
            "color_type": int(color), "interlaced": bool(interlace)}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (H, W[, C]) uint8, applying
    all five scanline filters."""
    meta = png_meta(data)
    if meta["bit_depth"] != 8 or meta["interlaced"]:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = _CHANNELS.get(meta["color_type"])
    if channels is None:
        raise ValueError(f"unsupported color type {meta['color_type']}")
    w, h = meta["width"], meta["height"]
    # walk chunks, concatenate IDAT
    pos, idat = 8, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need left-to-right recurrence
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    cur[x] = (line[x] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad filter {ftype}")
        out[y] = cur.astype(np.uint8)
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def png_resize_nearest(data: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode. The real kernel
    behind ``multimodal.resize_images`` for PNG payloads."""
    img = png_decode(data)
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return png_encode(img[ys][:, xs])


# --------------------------------------------------- header-only probing

def sniff_media(data: bytes) -> dict | None:
    """Header-level metadata for common containers without full decode:
    PNG (IHDR), JPEG (SOF marker scan), GIF (logical screen descriptor),
    WAV (RIFF fmt chunk). Returns None when unrecognized."""
    if data[:8] == _SIG:
        m = png_meta(data)
        return {"format": "png", "width": m["width"], "height": m["height"],
                "extra": float(m["bit_depth"])}
    if data[:2] == b"\xff\xd8":  # JPEG SOI; scan for SOFn
        pos = 2
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
                return {"format": "jpeg", "width": int(w), "height": int(h),
                        "extra": float(data[pos + 4])}
            (seg,) = struct.unpack(">H", data[pos + 2:pos + 4])
            pos += 2 + seg
        return {"format": "jpeg", "width": None, "height": None,
                "extra": None}
    if len(data) >= 12 and data[4:8] == b"ftyp":
        # ISO-BMFF (MP4/MOV): defer to the real demuxer for dimensions
        from clickhouse_clickhouse_spark.functions.mp4 import probe_mp4
        try:
            p = probe_mp4(data)
            return {"format": "mp4", "width": p["width"],
                    "height": p["height"],
                    "extra": p["duration_s"]}
        except Exception:
            return {"format": "mp4", "width": None, "height": None,
                    "extra": None}
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": int(w), "height": int(h),
                "extra": None}
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        # fmt chunk: channels @22, sample rate @24, data size → seconds
        channels, rate = struct.unpack("<HI", data[22:28])
        bits = struct.unpack("<H", data[34:36])[0]
        duration = None
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if tag == b"data" and rate and channels and bits:
                duration = ln / (rate * channels * (bits // 8))
                break
            pos += 8 + ln + (ln & 1)
        return {"format": "wav", "width": int(channels), "height": int(rate),
                "extra": duration}
    return None
