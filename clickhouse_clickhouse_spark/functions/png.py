"""Minimal PNG codec — pure stdlib (zlib/struct) + numpy.

The container has no media libraries, but PNG needs none: the format is
zlib-compressed filtered scanlines (public W3C PNG spec / RFC 2083).
This gives the multimodal pipeline a REAL decode/transform/encode kernel
for one concrete format; baseline JPEG lives in functions/jpeg.py and
registers in _RASTER below; video frame decode stays gated on external
libs.

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
    if data[:2] == b"BM" and len(data) >= 32:
        w, h = struct.unpack("<ii", data[18:26])
        bpp = struct.unpack("<H", data[28:30])[0]
        return {"format": "bmp", "width": int(w), "height": abs(int(h)),
                "extra": float(bpp)}
    if data[:2] in (b"P6", b"P5") and len(data) > 2 \
            and data[2:3].isspace():
        try:
            img = ppm_decode(data)
            return {"format": "ppm", "width": img.shape[1],
                    "height": img.shape[0],
                    "extra": float(3 if img.ndim == 3 else 1)}
        except Exception:
            return {"format": "ppm", "width": None, "height": None,
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


# ------------------------------------------------ BMP (BI_RGB) codec

def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) or (H, W) uint8 as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding) —
    the second lib-free raster format (public BMP file format docs)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"bmp_encode: need (H, W[, 3]), got {arr.shape}")
    h, w = arr.shape[:2]
    bgr = arr[::-1, :, ::-1]                      # bottom-up, BGR
    pad = (-(w * 3)) % 4
    rows = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                       2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    return head + info + rows


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (H, W, 3) uint8 RGB (handles
    bottom-up and top-down row order)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (offset,) = struct.unpack("<I", data[10:14])
    size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported "
                         f"(bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(data, np.uint8,
                       count=stride * h, offset=offset)
    rows = px.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb.copy()


# ------------------------------------------------ PPM/PGM (binary) codec

def ppm_encode(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) as binary PPM (P6) or (H, W) as PGM (P5),
    maxval 255 (netpbm spec)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"ppm_encode: need (H, W[, 3]), got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) → (H, W, 3) / PGM (P5) → (H, W); handles
    whitespace and '#' comments in the header."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM (P6/P5)")
    channels = 3 if data[:2] == b"P6" else 1
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1                                   # single whitespace after maxval
    px = np.frombuffer(data, np.uint8, count=w * h * channels, offset=pos)
    return px.reshape(h, w, 3) if channels == 3 else px.reshape(h, w)


# ------------------------------------------------ format-generic raster

from clickhouse_clickhouse_spark.functions.jpeg import (  # noqa: E402
    jpeg_decode,
    jpeg_encode,
)

_RASTER = {
    "png": (png_decode, png_encode),
    "bmp": (bmp_decode, bmp_encode),
    "ppm": (ppm_decode, ppm_encode),
    # decode-only: re-encoding arbitrary RGB needs palette quantization
    # (gif_encode covers greyscale); see raster_resize_nearest
    "gif": (lambda d: gif_decode(d), None),
    # baseline sequential codec (ITU-T T.81), functions/jpeg.py
    "jpeg": (jpeg_decode, jpeg_encode),
}


def raster_decode(data: bytes) -> tuple[str, np.ndarray]:
    """Sniff + decode any supported lib-free raster (png/bmp/ppm/gif)."""
    s = sniff_media(data)
    if not s or s["format"] not in _RASTER:
        raise ValueError(f"not a decodable raster: "
                         f"{s and s['format']!r}")
    return s["format"], _RASTER[s["format"]][0](data)


def raster_resize_nearest(data: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode in the SAME
    format. The kernel behind multimodal.resize_images for every
    lib-free raster format with an encoder (GIF resizes re-encode as
    PNG — lossless, no palette re-quantization)."""
    fmt, img = raster_decode(data)
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    enc = _RASTER[fmt][1] or png_encode
    return enc(img[ys][:, xs])


# ------------------------------------------------ GIF (LZW) codec

def _lzw_decode(min_code_size: int, data: bytes) -> list:
    """GIF-variant LZW (public GIF89a spec appendix F): variable code
    width starting at min+1 bits, LSB-first bit packing, clear/end
    codes, dictionary grows to 4095 then waits for clear."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    width = min_code_size + 1
    out, prev = [], None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + [entry[0]])
            else:                       # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, indices) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    next_code = end + 1
    width = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    out = bytearray()
    acc = nbits = 0

    def emit(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    cur = ()
    for idx in indices:
        nxt = cur + (int(idx),)
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = (int(idx),)
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(arr: np.ndarray) -> bytes:
    """Encode (H, W) uint8 GREYSCALE as a GIF89a with a 256-entry grey
    palette (single frame, no interlace, LZW-compressed). Color images
    would need palette quantization — out of scope; decode handles any
    palette."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("gif_encode: greyscale (H, W) only")
    h, w = arr.shape
    gct = bytes(v for g in range(256) for v in (g, g, g))
    lzw = _lzw_encode(8, arr.reshape(-1))
    subs = b"".join(bytes([min(255, len(lzw) - i)])
                    + lzw[i:i + 255]
                    for i in range(0, len(lzw), 255)) + b"\x00"
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + gct
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([8]) + subs + b"\x3B")


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (H, W, 3) uint8 RGB
    (global/local palettes, interlace supported)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:                      # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:                    # image descriptor
            _, _, iw, ih, iflags = struct.unpack("<HHHHB",
                                                 data[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(data, np.uint8, count=3 * n,
                                   offset=pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image without a color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(_lzw_decode(mcs, bytes(lzw))[:iw * ih],
                           dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:              # de-interlace (4 passes)
                rows = ([*range(0, ih, 8)] + [*range(4, ih, 8)]
                        + [*range(2, ih, 4)] + [*range(1, ih, 2)])
                tmp = np.empty_like(idx)
                tmp[rows] = idx[:len(rows)]
                idx = tmp
            return ct[np.clip(idx, 0, len(ct) - 1)]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"corrupt GIF (block 0x{b:02x})")
    raise ValueError("GIF contains no image block")
