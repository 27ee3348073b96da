"""Baseline JPEG codec — pure stdlib + numpy (ITU-T T.81 / ISO 10918-1).

The container has no media libraries, but baseline JPEG needs none: the
format is Huffman-coded quantized 8x8 DCT blocks (public ITU-T T.81
spec; tables from its Annex K). This upgrades the multimodal pipeline's
JPEG path from header-probe-only (``png.sniff_media``) to a REAL
decode/transform/encode kernel, the same contract the PNG/GIF/BMP/PPM
codecs already meet. Mirrors the reference's image-metadata/row-decode
surface (upstream reads media as opaque String/binary columns; the
pixel work lives in this engine's curation pipeline).

Scope — honest and loud:
* decode: baseline sequential DCT (SOF0), 8-bit, Huffman, single
  interleaved scan, grayscale or YCbCr 3-component with any h/v
  sampling factors in {1,2} (covers 4:4:4, 4:2:2, 4:4:0, 4:2:0),
  restart intervals. Progressive (SOF2), arithmetic coding, 12-bit,
  hierarchical and CMYK raise ``ValueError`` naming the gate.
* encode: baseline sequential, grayscale or RGB, 4:4:4 or 4:2:0,
  Annex K quantization tables scaled by libjpeg's public quality
  formula, Annex K Huffman tables.

Hot loops (per-block Huffman symbol walk) are Python — a codec runs
inside an Arrow-batched ``mapInPandas`` over binary columns, one call
per image, so the per-row cost is the image, not the framework (same
stance as the GIF LZW codec). DCT/IDCT/quantize/color transforms are
whole-image numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec constants)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)
_UNZIGZAG = np.argsort(_ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# (bits[1..16], values) per Annex K
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])

# Orthonormal 8x8 DCT-II basis: dct = C @ block @ C.T, idct = C.T @ co @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125 if _u == 0 else 0.25)
                      * np.cos((2 * _x + 1) * _u * np.pi / 16))


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scale mapping (quality 1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, from (bits, values))
# ---------------------------------------------------------------------------

def _build_codes(bits, values):
    """symbol -> (code, length) per T.81 C.2 canonical ordering."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits, values):
    """(code << 8 | length) -> symbol flat dict for the scan walker."""
    out = {}
    for sym, (code, length) in _build_codes(bits, values).items():
        out[(code << 5) | length] = sym
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _dct_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H,W) float plane (already level-shifted) -> (n_blocks, 64) int32
    quantized zigzagged coefficients. Whole-image numpy."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    co = np.einsum("ux,nmxy,vy->nmuv", _C, blocks, _C)
    q = np.round(co / qtab.reshape(8, 8)).astype(np.int32)
    return q.reshape(bh * bw, 64)[:, _ZIGZAG]


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    H = (h + mh - 1) // mh * mh
    W = (w + mw - 1) // mw * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def jpeg_encode(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (H,W) grayscale or (H,W,3) RGB uint8 as baseline JFIF.

    ``subsampling``: '444' (none), '422' (horizontal 2:1) or '420';
    ``restart_interval``: emit RSTn every N MCUs (0 = none).
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # pad to even, then 2x2 box average
            ye = _pad_edge(y, 2, 2)
            cb = (cb if cb.shape == ye.shape else _pad_edge(cb, 2, 2))
            cr = (cr if cr.shape == ye.shape else _pad_edge(cr, 2, 2))
            cb = cb.reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2)
            cb = cb.mean(axis=(1, 3))
            cr = cr.reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2)
            cr = cr.mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "422":
            # horizontal 2:1 box average
            cb = _pad_edge(cb, 1, 2)
            cr = _pad_edge(cr, 1, 2)
            cb = cb.reshape(cb.shape[0], cb.shape[1] // 2, 2).mean(axis=2)
            cr = cr.reshape(cr.shape[0], cr.shape[1] // 2, 2).mean(axis=2)
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane so the MCU grid tiles it exactly
    mcw, mch = 8 * hmax, 8 * vmax
    mcus_x = (w + mcw - 1) // mcw
    mcus_y = (h + mch - 1) // mch
    coeffs = []       # per component: (n_blocks_x, n_blocks_y, (n,64) array)
    for p, (sh, sv), qs in zip(planes, samp, qsel):
        bx, by = mcus_x * sh, mcus_y * sv
        padded = np.pad(p, ((0, by * 8 - p.shape[0]), (0, bx * 8 - p.shape[1])),
                        mode="edge")
        coeffs.append((bx, by, _dct_blocks(padded, qy if qs == 0 else qc)))

    dc_tabs = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_tabs = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]

    bw_ = _BitWriter()
    pred = [0] * len(planes)
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n \
                    and mcu_n % restart_interval == 0:
                bw_.flush()
                bw_.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_n += 1
            for ci, (sh, sv) in enumerate(samp):
                bx, by, cf = coeffs[ci]
                tsel = 0 if (gray or ci == 0) else 1
                dct_, act_ = dc_tabs[tsel], ac_tabs[tsel]
                for v in range(sv):
                    for u in range(sh):
                        blk = cf[(my * sv + v) * bx + (mx * sh + u)]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        cat, bits = _magnitude(diff)
                        code, ln = dct_[cat]
                        bw_.put(code, ln)
                        if cat:
                            bw_.put(bits, cat)
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            coef = int(blk[k])
                            if coef == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act_[0xF0]   # ZRL
                                bw_.put(code, ln)
                                run -= 16
                            cat, bits = _magnitude(coef)
                            code, ln = act_[(run << 4) | cat]
                            bw_.put(code, ln)
                            bw_.put(bits, cat)
                            run = 0
                        if last < 63:
                            code, ln = act_[0x00]       # EOB
                            bw_.put(code, ln)
    bw_.flush()

    # --- assemble markers ---
    out = bytearray(b"\xff\xd8")                         # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"         # APP0
    def dqt(tid, tab):
        return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(x) for x in tab[_ZIGZAG]))
    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    def dht(cls, tid, spec):
        bits, values = spec
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if (gray or ci == 0) else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw_.buf
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffed marker (caller handles RSTn)."""
    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2
            else:
                self.marker = d[p + 1] if p + 1 < len(d) else None
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial byte; consume an RSTn marker if next. Returns
        the marker byte consumed (or None)."""
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00:
                m = d[p + 1]
                if 0xD0 <= m <= 0xD7:
                    self.pos = p + 2
                    self.marker = None
                    return m
                return None
            p += 1
        return None


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code << 5) | length)
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits >> (cat - 1):
        return bits
    return bits - (1 << cat) + 1


_SOF_UNSUPPORTED = {
    0xC1: "extended sequential", 0xC2: "progressive", 0xC3: "lossless",
    0xC5: "differential sequential", 0xC6: "differential progressive",
    0xC7: "differential lossless", 0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive", 0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic", 0xCE: "differential arithmetic",
    0xCF: "differential arithmetic",
}


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG to (H,W) grayscale or (H,W,3) RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG (expected marker at {pos})")
        marker = data[pos + 1]
        if marker == 0xD9:                                  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                                  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec:
                    tab = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    tab = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                qtabs[tid] = tab.astype(np.int32)[_UNZIGZAG]
        elif marker == 0xC4:                                # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                cnt = sum(bits)
                values = list(seg[i + 17:i + 17 + cnt])
                i += 17 + cnt
                tab = _build_decode_table(bits, values)
                (dc_tables if cls == 0 else ac_tables)[tid] = tab
        elif marker == 0xC0:                                # SOF0 baseline
            prec, fh, fw, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported (8-bit "
                                 "baseline only)")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported "
                                 "(grayscale/YCbCr only — CMYK gated)")
            comps = []
            for c in range(ncomp):
                cid, sf, qid = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F,
                              "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in _SOF_UNSUPPORTED:
            raise ValueError(
                f"{_SOF_UNSUPPORTED[marker]} JPEG (SOF{marker - 0xC0}) "
                "unsupported — baseline sequential (SOF0) only; "
                "re-encode baseline or install a codec library")
        elif marker == 0xDD:                                # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                                # SOS
            if frame is None:
                raise ValueError("corrupt JPEG (SOS before SOF)")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel.append((cid, tt >> 4, tt & 0x0F))
            return _decode_scan(data, pos + 2 + seglen, frame, scan_sel,
                                qtabs, dc_tables, ac_tables,
                                restart_interval)
        pos += 2 + seglen
        # skip fill bytes
        while pos < n and data[pos] == 0xFF and pos + 1 < n \
                and data[pos + 1] == 0xFF:
            pos += 1
    raise ValueError("corrupt JPEG (no scan data)")


def _decode_scan(data, pos, frame, scan_sel, qtabs, dc_tables, ac_tables,
                 restart_interval):
    comps = frame["comps"]
    if len(scan_sel) != len(comps):
        raise ValueError("non-interleaved multi-scan JPEG unsupported "
                         "(baseline single interleaved scan only)")
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError(f"sampling factors {hmax}x{vmax} unsupported "
                         "(1-2 only: 4:4:4/4:2:2/4:4:0/4:2:0)")
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    sel_by_id = {cid: (dct, act) for cid, dct, act in scan_sel}
    per_comp = []
    for c in comps:
        dct_id, act_id = sel_by_id[c["id"]]
        bx, by = mcus_x * c["h"], mcus_y * c["v"]
        per_comp.append({
            "c": c, "bx": bx, "by": by,
            "dc": dc_tables[dct_id], "ac": ac_tables[act_id],
            "q": qtabs[c["q"]],
            "coef": np.zeros((by * bx, 64), dtype=np.int32),
        })

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if m is None:
                    raise ValueError("missing JPEG restart marker")
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, pc in enumerate(per_comp):
                cc = pc["c"]
                for v in range(cc["v"]):
                    for u in range(cc["h"]):
                        blk = pc["coef"][(my * cc["v"] + v) * pc["bx"]
                                         + (mx * cc["h"] + u)]
                        cat = _huff_decode(br, pc["dc"])
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            rs = _huff_decode(br, pc["ac"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break                       # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1

    # --- inverse transform (whole-image numpy per component) ---
    planes = []
    for pc in per_comp:
        cc = pc["c"]
        bx, by = pc["bx"], pc["by"]
        co = (pc["coef"][:, _UNZIGZAG].astype(np.float64)
              * pc["q"][np.newaxis, :].astype(np.float64))
        co = co.reshape(by, bx, 8, 8)
        px = np.einsum("xu,nmuv,yv->nmxy", _C.T, co, _C.T)
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to full-res grid by sample repetition
        ry, rx = vmax // cc["v"], hmax // cc["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
