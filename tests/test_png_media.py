"""In-repo PNG codec + multimodal kernels (functions/png.py)."""

import struct
import zlib

import numpy as np
import pytest

from clickhouse_clickhouse_spark.functions import png as P


def test_rgb_rgba_grey_roundtrip():
    rng = np.random.default_rng(3)
    for shape in [(7, 9, 3), (4, 4, 4), (5, 8)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (P.png_decode(P.png_encode(img)) == img).all()


def test_decode_all_filter_types():
    """Hand-filter scanlines with Sub/Up/Average/Paeth and verify the
    decoder reconstructs the original pixels."""
    rng = np.random.default_rng(11)
    w, h, ch = 4, 4, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

    def filt(y, ftype):
        line = img[y].reshape(-1).astype(int)
        prev = img[y - 1].reshape(-1).astype(int) if y else \
            np.zeros(w * ch, int)
        res = []
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 1:
                res.append((line[x] - a) & 0xFF)
            elif ftype == 2:
                res.append((line[x] - b) & 0xFF)
            elif ftype == 3:
                res.append((line[x] - (a + b) // 2) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                res.append((line[x] - pred) & 0xFF)
        return bytes([ftype] + res)

    scan = b"".join(filt(y, ft) for y, ft in enumerate([1, 2, 3, 4]))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    assert (P.png_decode(data) == img).all()


def test_sniff_gif_wav_jpeg():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert P.sniff_media(gif)["width"] == 320
    wav = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
           + b"data" + struct.pack("<I", 44100 * 2 * 2))
    m = P.sniff_media(wav)
    assert m["format"] == "wav" and abs(m["extra"] - 1.0) < 1e-9
    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x00" * 10 + b"\xff\xc0" + struct.pack(">H", 17)
            + bytes([8]) + struct.pack(">HH", 480, 640) + b"\x03"
            + b"\x00" * 12 + b"\xff\xd9")
    assert P.sniff_media(jpeg) == {"format": "jpeg", "width": 640,
                                   "height": 480, "extra": 8.0}
    assert P.sniff_media(b"garbage-bytes") is None


def test_resize_images_spark_end_to_end(spark):
    from clickhouse_clickhouse_spark.pipeline.multimodal import (
        probe_media,
        resize_images,
        synthetic_png_media,
    )

    media = synthetic_png_media(spark, 6)
    out = resize_images(media, 3, 2)
    rows = {r.media_id: r for r in probe_media(out).collect()}
    assert len(rows) == 6
    assert all(r.width == 3 and r.height == 2 and r.format == "png"
               for r in rows.values())


def test_resize_rejects_non_png(spark):
    from clickhouse_clickhouse_spark.pipeline.multimodal import (
        resize_images,
        synthetic_media,
    )

    with pytest.raises(Exception):
        resize_images(synthetic_media(spark, 4), 3, 2).collect()
