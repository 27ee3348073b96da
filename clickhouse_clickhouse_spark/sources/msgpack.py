"""MessagePack — from-scratch vectorized codec per the PUBLIC msgpack
spec (msgpack.org/spec; no msgpack package). The reference reads and
writes rows as consecutive MessagePack values, one per column
([U] src/Processors/Formats/Impl/MsgPackRowInputFormat.cpp /
MsgPackRowOutputFormat.cpp); here each ROW is one binary cell holding
its column values back-to-back — the same per-row framing the Protobuf
codec uses, so cells round-trip through any msgpack implementation.

Wire subset:
- encode emits the spec's signed canonical forms: positive/negative
  fixint, int8/16/32/64 (big-endian), float64 (0xcb) / float32 (0xca),
  nil (0xc0), bool (0xc2/0xc3), fixstr/str8/16/32, bin8/16/32,
  fixarray/array16/array32 (element types: int64, double, string);
- decode additionally accepts the UNSIGNED int forms (0xcc-0xcf) that
  size-optimizing encoders (e.g. msgpack-python) emit for positive
  values, so externally-produced bytes parse.
NULL encodes as nil for every type and decodes back to NULL. Maps,
nested arrays, ext types refuse loudly.

Scale shape: encode is pure numpy segment assembly — per-class masked
header fills plus one repeat/cumsum gather per column to interleave
column chunks into row cells; decode keeps a per-row cursor vector and
walks the schema's columns with masked gathers (array elements iterate
to the BATCH max element count, each iteration vectorized across rows).
No per-row Python on either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SUPPORTED_ELEM = (T.LongType, T.IntegerType, T.DoubleType, T.StringType)


def _check_schema(schema: T.StructType) -> None:
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, T.ArrayType):
            if not isinstance(t.elementType, _SUPPORTED_ELEM):
                raise ValueError(
                    f"msgpack: array element type {t.elementType} for "
                    f"{f.name!r} not supported (int/long/double/string)")
            continue
        if isinstance(t, T.DecimalType):
            # the UInt64 full-range opt-in (types_map uint64_as_decimal):
            # Decimal(20,0) carries 0..2^64-1 and wires as msgpack uint
            if (t.precision, t.scale) != (20, 0):
                raise ValueError(
                    f"msgpack: decimal column {f.name!r} must be "
                    "DECIMAL(20,0) (the UInt64 opt-in); other decimals "
                    "are unsupported")
            continue
        if not isinstance(t, (T.LongType, T.IntegerType, T.ShortType,
                              T.ByteType, T.DoubleType, T.FloatType,
                              T.BooleanType, T.StringType, T.BinaryType)):
            raise ValueError(f"msgpack: column {f.name!r} type {t} not "
                             "supported (maps/structs/ext refuse)")


# ---------------------------------------------------------------- encode

def _enc_int_flat(v, valid):
    """Canonical signed encodings for an int64 vector -> (buf, lens).
    nil for invalid entries."""
    import numpy as np

    v = v.astype(np.int64, copy=False)
    m_nil = ~valid
    m_fix = valid & (v >= -32) & (v <= 127)
    m_i8 = valid & ~m_fix & (v >= -128) & (v <= 127)
    m_i16 = valid & ~m_fix & ~m_i8 & (v >= -(1 << 15)) & (v < (1 << 15))
    m_i32 = valid & ~m_fix & ~m_i8 & ~m_i16 & \
        (v >= -(1 << 31)) & (v < (1 << 31))
    m_i64 = valid & ~m_fix & ~m_i8 & ~m_i16 & ~m_i32
    lens = np.select([m_nil, m_fix, m_i8, m_i16, m_i32, m_i64],
                     [1, 1, 2, 3, 5, 9]).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    buf = np.zeros(int(lens.sum()), dtype=np.uint8)
    buf[starts[m_nil]] = 0xC0
    buf[starts[m_fix]] = (v[m_fix] & 0xFF).astype(np.uint8)

    def _wide(mask, code, dt, k):
        s = starts[mask]
        if not s.size:
            return
        buf[s] = code
        payload = v[mask].astype(dt).view(np.uint8).reshape(-1, k)
        buf[s[:, None] + 1 + np.arange(k)] = payload

    _wide(m_i8, 0xD0, ">i1", 1)
    _wide(m_i16, 0xD1, ">i2", 2)
    _wide(m_i32, 0xD2, ">i4", 4)
    _wide(m_i64, 0xD3, ">i8", 8)
    return buf, lens


def _enc_uint_flat(u, valid):
    """Canonical UNSIGNED encodings for a uint64 vector (the UInt64
    opt-in): positive fixint, uint8/16/32/64 (0xCC-0xCF) — the spec's
    smallest unsigned form per value; nil for invalid entries."""
    import numpy as np

    u = u.astype(np.uint64, copy=False)
    m_nil = ~valid
    m_fix = valid & (u <= 127)
    m_u8 = valid & ~m_fix & (u <= 0xFF)
    m_u16 = valid & ~m_fix & ~m_u8 & (u <= 0xFFFF)
    m_u32 = valid & ~m_fix & ~m_u8 & ~m_u16 & (u <= 0xFFFFFFFF)
    m_u64 = valid & ~m_fix & ~m_u8 & ~m_u16 & ~m_u32
    lens = np.select([m_nil, m_fix, m_u8, m_u16, m_u32, m_u64],
                     [1, 1, 2, 3, 5, 9]).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    buf = np.zeros(int(lens.sum()), dtype=np.uint8)
    buf[starts[m_nil]] = 0xC0
    buf[starts[m_fix]] = (u[m_fix] & np.uint64(0xFF)).astype(np.uint8)

    def _wide(mask, code, dt, k):
        s = starts[mask]
        if not s.size:
            return
        buf[s] = code
        payload = u[mask].astype(dt).view(np.uint8).reshape(-1, k)
        buf[s[:, None] + 1 + np.arange(k)] = payload

    _wide(m_u8, 0xCC, ">u1", 1)
    _wide(m_u16, 0xCD, ">u2", 2)
    _wide(m_u32, 0xCE, ">u4", 4)
    _wide(m_u64, 0xCF, ">u8", 8)
    return buf, lens


def _dec128_to_u64(arr, valid):
    """Arrow decimal128(20,0) -> uint64 vector (vectorized: the low
    128-bit word IS the value for 0 <= v < 2^64; anything outside
    refuses loudly)."""
    import numpy as np

    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint64)
    words = buf[arr.offset * 2:(arr.offset + n) * 2].reshape(-1, 2)
    lo, hi = words[:, 0], words[:, 1]   # little-endian 128-bit
    bad = valid & (hi != 0) & ~((hi == np.uint64(2**64 - 1)))
    neg = valid & (hi == np.uint64(2**64 - 1))   # two's-complement sign
    if bool(bad.any()) or bool(neg.any()):
        raise ValueError("msgpack: DECIMAL(20,0) value outside the "
                         "UInt64 range 0..2^64-1")
    return lo


def _enc_float_flat(v, valid, single=False):
    import numpy as np

    n = len(v)
    lens = np.where(valid, 5 if single else 9, 1).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    buf = np.zeros(int(lens.sum()), dtype=np.uint8)
    buf[starts[~valid]] = 0xC0
    s = starts[valid]
    if s.size:
        if single:
            buf[s] = 0xCA
            payload = v[valid].astype(">f4").view(np.uint8).reshape(-1, 4)
            buf[s[:, None] + 1 + np.arange(4)] = payload
        else:
            buf[s] = 0xCB
            payload = v[valid].astype(">f8").view(np.uint8).reshape(-1, 8)
            buf[s[:, None] + 1 + np.arange(8)] = payload
    return buf, lens


def _gather_chunks(dst, dst_starts, src, src_starts, lens):
    """Scatter variable-length chunks: dst[dst_starts[i]:+lens[i]] =
    src[src_starts[i]:+lens[i]], one vectorized gather."""
    import numpy as np

    total = int(lens.sum())
    if total == 0:
        return
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)))[:-1], lens)
    dst[np.repeat(dst_starts, lens) + within] = \
        src[np.repeat(src_starts, lens) + within]


def _enc_strbin_flat(offsets, data, valid, is_str):
    """(buf, lens) for a large_string/large_binary arrow column given
    its offsets/data buffers."""
    import numpy as np

    plens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    plens = np.where(valid, plens, 0)
    if is_str:
        hl = np.select(
            [~valid, plens <= 31, plens <= 0xFF, plens <= 0xFFFF],
            [1, 1, 2, 3], default=5).astype(np.int64)
    else:
        hl = np.select([~valid, plens <= 0xFF, plens <= 0xFFFF],
                       [1, 2, 3], default=5).astype(np.int64)
    lens = hl + plens
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    buf = np.zeros(int(lens.sum()), dtype=np.uint8)
    buf[starts[~valid]] = 0xC0
    if is_str:
        m = valid & (hl == 1)
        buf[starts[m]] = (0xA0 | plens[m]).astype(np.uint8)
        m = valid & (hl == 2)
        buf[starts[m]] = 0xD9
        buf[starts[m] + 1] = plens[m].astype(np.uint8)
        code16, code32 = 0xDA, 0xDB
    else:
        m = valid & (hl == 2)
        buf[starts[m]] = 0xC4
        buf[starts[m] + 1] = plens[m].astype(np.uint8)
        code16, code32 = 0xC5, 0xC6
    m = valid & (hl == 3)
    if m.any():
        buf[starts[m]] = code16
        pl = plens[m].astype(">u2").view(np.uint8).reshape(-1, 2)
        buf[starts[m][:, None] + 1 + np.arange(2)] = pl
    m = valid & (hl == 5)
    if m.any():
        buf[starts[m]] = code32
        pl = plens[m].astype(">u4").view(np.uint8).reshape(-1, 4)
        buf[starts[m][:, None] + 1 + np.arange(4)] = pl
    _gather_chunks(buf, starts + hl, data,
                   offsets[:-1].astype(np.int64), plens)
    return buf, lens


def _arr_header(counts, valid):
    """Array headers (fixarray/array16/array32) -> (buf, lens, starts)."""
    import numpy as np

    hl = np.select([~valid, counts <= 15, counts <= 0xFFFF],
                   [1, 1, 3], default=5).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(hl)))[:-1]
    buf = np.zeros(int(hl.sum()), dtype=np.uint8)
    buf[starts[~valid]] = 0xC0
    m = valid & (hl == 1)
    buf[starts[m]] = (0x90 | counts[m]).astype(np.uint8)
    m = valid & (hl == 3)
    if m.any():
        buf[starts[m]] = 0xDC
        pl = counts[m].astype(">u2").view(np.uint8).reshape(-1, 2)
        buf[starts[m][:, None] + 1 + np.arange(2)] = pl
    m = valid & (hl == 5)
    if m.any():
        buf[starts[m]] = 0xDD
        pl = counts[m].astype(">u4").view(np.uint8).reshape(-1, 4)
        buf[starts[m][:, None] + 1 + np.arange(4)] = pl
    return buf, hl


def _pa_col(batch, name, pa_type):
    """Column `name` of an arrow RecordBatch, cast to pa_type, plus its
    validity mask. Arrow-native: NO pandas round-trip anywhere — pandas
    would convert int64-with-nulls through float64 and silently round
    values past 2^53 (hypothesis-found with 9007199254740993)."""
    import numpy as np
    import pyarrow as pa  # noqa: F401

    arr = batch.column(batch.schema.get_field_index(name))
    if arr.type != pa_type:
        arr = arr.cast(pa_type)

    n = len(arr)
    if arr.buffers()[0] is None:
        valid = np.ones(n, dtype=bool)
    else:
        bits = np.frombuffer(arr.buffers()[0], dtype=np.uint8)
        valid = np.unpackbits(bits, bitorder="little")[
            arr.offset:arr.offset + n].astype(bool)
    return arr, valid


def _encode_column(batch, f):
    """One column -> (buf, per-row lens)."""
    import numpy as np
    import pyarrow as pa

    t = f.dataType
    if isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        arr, valid = _pa_col(batch, f.name, pa.int64())
        v = np.asarray(arr.fill_null(0), dtype=np.int64)
        return _enc_int_flat(v, valid)
    if isinstance(t, T.DecimalType):
        arr, valid = _pa_col(batch, f.name, pa.decimal128(20, 0))
        return _enc_uint_flat(_dec128_to_u64(arr, valid), valid)
    if isinstance(t, (T.DoubleType, T.FloatType)):
        arr, valid = _pa_col(batch, f.name, pa.float64())
        v = np.asarray(arr.fill_null(0.0), dtype=np.float64)
        return _enc_float_flat(v, valid,
                               single=isinstance(t, T.FloatType))
    if isinstance(t, T.BooleanType):
        arr, valid = _pa_col(batch, f.name, pa.bool_())
        v = np.asarray(arr.fill_null(False), dtype=bool)
        buf = np.where(valid, np.where(v, 0xC3, 0xC2), 0xC0) \
            .astype(np.uint8)
        return buf, np.ones(len(v), dtype=np.int64)
    if isinstance(t, (T.StringType, T.BinaryType)):
        is_str = isinstance(t, T.StringType)
        arr, valid = _pa_col(
            batch, f.name,
            pa.large_string() if is_str else pa.large_binary())
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) \
            if arr.buffers()[2] is not None else np.zeros(0, np.uint8)
        return _enc_strbin_flat(offs - offs[0], data[offs[0]:], valid,
                                is_str)
    if isinstance(t, T.ArrayType):
        et = t.elementType
        pa_elem = {T.LongType: pa.int64(), T.IntegerType: pa.int64(),
                   T.DoubleType: pa.float64(),
                   T.StringType: pa.large_string()}[type(et)]
        arr, valid = _pa_col(batch, f.name, pa.large_list(pa_elem))
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        counts = np.where(valid, offs[1:] - offs[:-1], 0).astype(np.int64)
        hbuf, hlens = _arr_header(counts, valid)
        flat = arr.flatten()
        ne = len(flat)
        evalid = np.ones(ne, dtype=bool)
        if flat.null_count:
            bits = np.frombuffer(flat.buffers()[0], dtype=np.uint8)
            evalid = np.unpackbits(bits, bitorder="little")[
                flat.offset:flat.offset + ne].astype(bool)
        if isinstance(et, (T.LongType, T.IntegerType)):
            ev = np.asarray(flat.fill_null(0), dtype=np.int64)
            ebuf, elens = _enc_int_flat(ev, evalid)
        elif isinstance(et, T.DoubleType):
            ev = np.asarray(flat.fill_null(0.0), dtype=np.float64)
            ebuf, elens = _enc_float_flat(ev, evalid)
        else:
            eoffs = np.frombuffer(flat.buffers()[1], dtype=np.int64)[
                flat.offset:flat.offset + ne + 1]
            edata = np.frombuffer(flat.buffers()[2], dtype=np.uint8) \
                if flat.buffers()[2] is not None else np.zeros(0, np.uint8)
            ebuf, elens = _enc_strbin_flat(eoffs - eoffs[0],
                                           edata[eoffs[0]:], evalid, True)
        # per-row element-bytes total (reduceat over the list offsets)
        ecum = np.concatenate(([0], np.cumsum(elens)))
        row_elem_lens = ecum[offs - offs[0]][1:] - ecum[offs - offs[0]][:-1]
        row_elem_lens = np.where(valid, row_elem_lens, 0)
        lens = hlens + row_elem_lens
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        buf = np.zeros(int(lens.sum()), dtype=np.uint8)
        hstarts = np.concatenate(([0], np.cumsum(hlens)))[:-1]
        _gather_chunks(buf, starts, hbuf, hstarts, hlens)
        _gather_chunks(buf, starts + hlens, ebuf,
                       ecum[offs[:-1] - offs[0]], row_elem_lens)
        return buf, lens
    raise ValueError(f"msgpack: unsupported type {t}")


def msgpack_encode(df: DataFrame, out_col: str = "mp") -> DataFrame:
    """Encode rows to MessagePack cells: each row's columns serialize as
    consecutive msgpack values into one binary cell (the reference's
    MsgPack row format, framed per row)."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    _check_schema(df.schema)
    fields = df.schema.fields

    def enc(batches):
        import numpy as np
        import pyarrow as pa
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cols = [_encode_column(batch, f) for f in fields]
            row_lens = np.zeros(n, dtype=np.int64)
            for _, lens in cols:
                row_lens += lens
            out = np.zeros(int(row_lens.sum()), dtype=np.uint8)
            row_starts = np.concatenate(([0], np.cumsum(row_lens)))[:-1]
            at = row_starts.copy()
            for buf, lens in cols:
                _gather_chunks(out, at, buf,
                               np.concatenate(([0], np.cumsum(lens)))[:-1],
                               lens)
                at += lens
            offs = np.concatenate(([0], np.cumsum(row_lens)))
            arr = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(out.tobytes())])
            yield pa.RecordBatch.from_arrays([arr.cast(pa.binary())],
                                             [out_col])

    return df.mapInArrow(enc, f"{out_col} binary")


# ---------------------------------------------------------------- decode

def _be(buf, pos, k, dt):
    """Gather k big-endian bytes at each pos -> numpy dt values."""
    import numpy as np

    if not pos.size:
        return np.zeros(0, dtype=dt)
    g = buf[pos[:, None] + np.arange(k)].astype(np.uint8)
    return g.reshape(-1, k).copy().view(">" + dt).reshape(-1).astype(dt)


def _dec_int_at(buf, cur, active):
    """Decode one msgpack int (or nil) per active row at cur. Returns
    (values float-free int64, valid, consumed lengths)."""
    import numpy as np

    n = len(cur)
    vals = np.zeros(n, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    lens = np.zeros(n, dtype=np.int64)
    if not active.any():
        return vals, valid, lens
    t = np.zeros(n, dtype=np.uint8)
    t[active] = buf[cur[active]]
    a = active
    m = a & (t <= 0x7F)
    vals[m], valid[m], lens[m] = t[m].astype(np.int64), True, 1
    m = a & (t >= 0xE0)
    vals[m] = t[m].astype(np.int64) - 256
    valid[m], lens[m] = True, 1
    m = a & (t == 0xC0)
    lens[m] = 1
    for code, k, dt, signed in ((0xCC, 1, "u1", False), (0xCD, 2, "u2", False),
                                (0xCE, 4, "u4", False), (0xCF, 8, "u8", False),
                                (0xD0, 1, "i1", True), (0xD1, 2, "i2", True),
                                (0xD2, 4, "i4", True), (0xD3, 8, "i8", True)):
        m = a & (t == code)
        if m.any():
            raw = _be(buf, cur[m] + 1, k, dt)
            if code == 0xCF and bool((raw > np.uint64(2**63 - 1)).any()):
                # silent wrap to negative would corrupt data downstream —
                # refuse loudly (Spark LongType has no unsigned 64-bit;
                # SURVEY §1.2 documents the UInt64 range loss)
                raise ValueError(
                    "msgpack: uint64 value >= 2^63 does not fit Int64; "
                    "decode this column as DECIMAL(20,0) via the "
                    "uint64_as_decimal path or re-encode as int64")
            vals[m] = raw.astype(np.int64)
            valid[m], lens[m] = True, 1 + k
    bad = a & (lens == 0)
    if bad.any():
        raise ValueError(f"msgpack: unexpected type byte 0x{int(t[bad][0]):02x} "
                         "while decoding an integer")
    return vals, valid, lens


def _dec_uint_at(buf, cur, active):
    """Decode one msgpack UNSIGNED int (or nil) per active row — the
    DECIMAL(20,0)/UInt64 opt-in target, so 0xCF takes the full 64-bit
    range. Signed forms (0xD0-0xD3) are accepted when non-negative;
    negative values refuse loudly (UInt64 has no negatives)."""
    import numpy as np

    n = len(cur)
    vals = np.zeros(n, dtype=np.uint64)
    valid = np.zeros(n, dtype=bool)
    lens = np.zeros(n, dtype=np.int64)
    if not active.any():
        return vals, valid, lens
    t = np.zeros(n, dtype=np.uint8)
    t[active] = buf[cur[active]]
    a = active
    m = a & (t <= 0x7F)
    vals[m], valid[m], lens[m] = t[m].astype(np.uint64), True, 1
    m = a & (t == 0xC0)
    lens[m] = 1
    for code, k, dt in ((0xCC, 1, "u1"), (0xCD, 2, "u2"),
                        (0xCE, 4, "u4"), (0xCF, 8, "u8")):
        m = a & (t == code)
        if m.any():
            vals[m] = _be(buf, cur[m] + 1, k, dt).astype(np.uint64)
            valid[m], lens[m] = True, 1 + k
    for code, k, dt in ((0xD0, 1, "i1"), (0xD1, 2, "i2"),
                        (0xD2, 4, "i4"), (0xD3, 8, "i8")):
        m = a & (t == code)
        if m.any():
            sv = _be(buf, cur[m] + 1, k, dt).astype(np.int64)
            if bool((sv < 0).any()):
                raise ValueError("msgpack: negative value while decoding "
                                 "an unsigned (DECIMAL(20,0)) column")
            vals[m] = sv.astype(np.uint64)
            valid[m], lens[m] = True, 1 + k
    bad = a & (t >= 0xE0)          # negative fixint
    if bad.any():
        raise ValueError("msgpack: negative value while decoding an "
                         "unsigned (DECIMAL(20,0)) column")
    bad = a & (lens == 0)
    if bad.any():
        raise ValueError(
            f"msgpack: unexpected type byte 0x{int(t[bad][0]):02x} "
            "while decoding an unsigned integer")
    return vals, valid, lens


def _dec_float_at(buf, cur, active):
    import numpy as np

    n = len(cur)
    vals = np.zeros(n, dtype=np.float64)
    valid = np.zeros(n, dtype=bool)
    lens = np.zeros(n, dtype=np.int64)
    if not active.any():
        return vals, valid, lens
    t = np.zeros(n, dtype=np.uint8)
    t[active] = buf[cur[active]]
    m = active & (t == 0xCB)
    if m.any():
        vals[m] = _be(buf, cur[m] + 1, 8, "f8")
        valid[m], lens[m] = True, 9
    m = active & (t == 0xCA)
    if m.any():
        vals[m] = _be(buf, cur[m] + 1, 4, "f4").astype(np.float64)
        valid[m], lens[m] = True, 5
    m = active & (t == 0xC0)
    lens[m] = 1
    # integer forms promote (reference casts ints into Float columns)
    m = active & (lens == 0)
    if m.any():
        iv, ivalid, ilens = _dec_int_at(buf, cur, m)
        vals[m] = iv[m].astype(np.float64)
        valid[m] = ivalid[m]
        lens[m] = ilens[m]
    return vals, valid, lens


def _dec_strbin_lens_at(buf, cur, active, is_str):
    """Header parse for str/bin: returns (hlens, plens, valid)."""
    import numpy as np

    n = len(cur)
    hl = np.zeros(n, dtype=np.int64)
    pl = np.zeros(n, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    if not active.any():
        return hl, pl, valid
    t = np.zeros(n, dtype=np.uint8)
    t[active] = buf[cur[active]]
    m = active & (t == 0xC0)
    hl[m] = 1
    if is_str:
        m = active & (t >= 0xA0) & (t <= 0xBF)
        hl[m], pl[m], valid[m] = 1, (t[m] & 0x1F).astype(np.int64), True
        one, two, four = 0xD9, 0xDA, 0xDB
    else:
        one, two, four = 0xC4, 0xC5, 0xC6
    m = active & (t == one)
    if m.any():
        hl[m], pl[m], valid[m] = 2, _be(buf, cur[m] + 1, 1, "u1"), True
    m = active & (t == two)
    if m.any():
        hl[m], pl[m], valid[m] = 3, _be(buf, cur[m] + 1, 2, "u2"), True
    m = active & (t == four)
    if m.any():
        hl[m], pl[m], valid[m] = 5, _be(buf, cur[m] + 1, 4, "u4"), True
    bad = active & (hl == 0)
    if bad.any():
        raise ValueError(f"msgpack: unexpected type byte 0x{int(t[bad][0]):02x}"
                         f" while decoding a {'string' if is_str else 'binary'}")
    return hl, pl, valid


def _collect_strbin(buf, cur, hl, pl, valid):
    """Gather payload segments into a contiguous arrow large buffer."""
    import numpy as np
    import pyarrow as pa

    seg = np.zeros(int(pl[valid].sum()), dtype=np.uint8)
    lens = np.where(valid, pl, 0)
    _gather_chunks(seg, np.concatenate(([0], np.cumsum(lens)))[:-1][valid],
                   buf, (cur + hl)[valid], lens[valid])
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    return seg, offs


def _spark_arrow_type(t):
    """The arrow type Spark expects for a schema field (mapInArrow
    output contract — large_* variants cast down here)."""
    import pyarrow as pa

    if isinstance(t, T.LongType):
        return pa.int64()
    if isinstance(t, T.IntegerType):
        return pa.int32()
    if isinstance(t, T.DoubleType):
        return pa.float64()
    if isinstance(t, T.FloatType):
        return pa.float32()
    if isinstance(t, T.BooleanType):
        return pa.bool_()
    if isinstance(t, T.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    if isinstance(t, T.StringType):
        return pa.string()
    if isinstance(t, T.BinaryType):
        return pa.binary()
    if isinstance(t, T.ArrayType):
        return pa.list_(_spark_arrow_type(t.elementType))
    raise ValueError(f"msgpack: unsupported type {t}")


def msgpack_decode(df: DataFrame, schema: T.StructType | str,
                   col: str = "mp") -> DataFrame:
    """Decode MessagePack cells (one row of consecutive column values per
    cell) into typed columns; the schema is the contract, exactly like
    the reference's MsgPack input format."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    _check_schema(schema)
    fields = schema.fields

    def dec(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute  # noqa: F401  (pa.compute below)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cells = [b if b is not None else b"" for b in
                     batch.column(batch.schema.get_field_index(col))
                     .to_pylist()]
            lens = np.array([len(c) for c in cells], dtype=np.int64)
            buf = np.frombuffer(b"".join(cells), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            cur = starts.copy()
            alive = lens > 0
            out = {}
            for f in fields:
                t = f.dataType
                if isinstance(t, (T.LongType, T.IntegerType)):
                    v, valid, cl = _dec_int_at(buf, cur, alive)
                    pa_t = pa.int64() if isinstance(t, T.LongType) \
                        else pa.int32()
                    out[f.name] = pa.array(
                        [int(x) if ok else None
                         for x, ok in zip(v, valid)], type=pa_t)
                    cur = cur + cl
                elif isinstance(t, T.DecimalType):
                    v, valid, cl = _dec_uint_at(buf, cur, alive)
                    out[f.name] = pa.array(
                        [int(x) if ok else None
                         for x, ok in zip(v, valid)],
                        type=pa.decimal128(20, 0))
                    cur = cur + cl
                elif isinstance(t, (T.DoubleType, T.FloatType)):
                    v, valid, cl = _dec_float_at(buf, cur, alive)
                    pa_t = pa.float64() if isinstance(t, T.DoubleType) \
                        else pa.float32()
                    out[f.name] = pa.array(
                        [float(x) if ok else None
                         for x, ok in zip(v, valid)], type=pa_t)
                    cur = cur + cl
                elif isinstance(t, T.BooleanType):
                    tb = np.zeros(n, dtype=np.uint8)
                    tb[alive] = buf[cur[alive]]
                    known = alive & ((tb == 0xC2) | (tb == 0xC3)
                                     | (tb == 0xC0))
                    if bool((alive & ~known).any()):
                        raise ValueError("msgpack: unexpected type byte "
                                         "decoding a bool")
                    out[f.name] = pa.array(
                        [bool(x == 0xC3) if (a and x != 0xC0) else None
                         for a, x in zip(alive, tb)], type=pa.bool_())
                    cur = cur + np.where(alive, 1, 0)
                elif isinstance(t, (T.StringType, T.BinaryType)):
                    is_str = isinstance(t, T.StringType)
                    hl, pl, valid = _dec_strbin_lens_at(buf, cur, alive,
                                                        is_str)
                    seg, offs = _collect_strbin(buf, cur, hl, pl, valid)
                    vmask = pa.array([bool(x) for x in valid],
                                     type=pa.bool_())
                    arr = pa.Array.from_buffers(
                        pa.large_string() if is_str else pa.large_binary(),
                        n, [None, pa.py_buffer(offs.tobytes()),
                            pa.py_buffer(seg.tobytes())])
                    arr = pa.compute.if_else(vmask, arr, pa.nulls(
                        n, arr.type))
                    out[f.name] = arr
                    cur = cur + hl + np.where(valid, pl, 0)
                elif isinstance(t, T.ArrayType):
                    cur, out[f.name] = _dec_array(buf, cur, alive, t, n)
                else:
                    raise ValueError(f"msgpack: unsupported type {t}")
            # every cell's value stream must tile the cell exactly — a
            # short/truncated cell would otherwise let the cursor run
            # into the NEXT row's concatenated bytes and silently
            # mis-decode later columns (same guard as the stream
            # reader's p != B check)
            overrun = alive & (cur != starts + lens)
            if bool(overrun.any()):
                i = int(np.nonzero(overrun)[0][0])
                raise ValueError(
                    f"msgpack: cell {i} decoded {int(cur[i] - starts[i])} "
                    f"of {int(lens[i])} bytes — truncated or trailing "
                    "garbage in the cell")
            yield pa.RecordBatch.from_arrays(
                [out[f.name].cast(_spark_arrow_type(f.dataType))
                 for f in fields], [f.name for f in fields])

    return df.mapInArrow(dec, schema)


def _dec_array(buf, cur, alive, t, n):
    import numpy as np
    import pyarrow as pa

    # header: count per row
    tb = np.zeros(n, dtype=np.uint8)
    tb[alive] = buf[cur[alive]]
    counts = np.zeros(n, dtype=np.int64)
    hl = np.zeros(n, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    m = alive & (tb >= 0x90) & (tb <= 0x9F)
    counts[m], hl[m], valid[m] = (tb[m] & 0x0F).astype(np.int64), 1, True
    m = alive & (tb == 0xDC)
    if m.any():
        counts[m], hl[m], valid[m] = _be(buf, cur[m] + 1, 2, "u2"), 3, True
    m = alive & (tb == 0xDD)
    if m.any():
        counts[m], hl[m], valid[m] = _be(buf, cur[m] + 1, 4, "u4"), 5, True
    m = alive & (tb == 0xC0)
    hl[m] = 1
    bad = alive & (hl == 0)
    if bad.any():
        raise ValueError("msgpack: unexpected type byte decoding an array")
    cur = cur + hl
    remaining = counts.copy()
    et = t.elementType
    numeric = isinstance(et, (T.LongType, T.IntegerType, T.DoubleType))
    it_vals, it_ok, it_act = [], [], []      # per-iteration matrices
    str_elems: list = [[] if ok else None for ok in valid]
    # iterate to the batch max count; each pass is vectorized across rows
    while bool((remaining > 0).any()):
        act = remaining > 0
        if isinstance(et, (T.LongType, T.IntegerType)):
            v, ev, cl = _dec_int_at(buf, cur, act)
        elif isinstance(et, T.DoubleType):
            v, ev, cl = _dec_float_at(buf, cur, act)
        else:
            h2, p2, ev = _dec_strbin_lens_at(buf, cur, act, True)
            seg, offs = _collect_strbin(buf, cur, h2, p2, ev)
            sarr = pa.Array.from_buffers(
                pa.large_string(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(seg.tobytes())]).to_pylist()
            # strings stay a per-row assembly (python string objects
            # anyway); numeric elements below assemble with one
            # row-major boolean gather, no per-element python
            for i in np.nonzero(act)[0]:
                str_elems[i].append(sarr[i] if ev[i] else None)
            cl = h2 + np.where(ev, p2, 0)
            cur = cur + np.where(act, cl, 0)
            remaining = remaining - act.astype(np.int64)
            continue
        it_vals.append(v)
        it_ok.append(ev)
        it_act.append(act)
        cur = cur + np.where(act, cl, 0)
        remaining = remaining - act.astype(np.int64)
    pa_elem = {T.LongType: pa.int64(), T.IntegerType: pa.int32(),
               T.DoubleType: pa.float64(),
               T.StringType: pa.large_string()}[type(et)]
    if not numeric:
        return cur, pa.array(str_elems, type=pa.large_list(pa_elem))
    import pyarrow.compute as pc

    ecounts = np.where(valid, counts, 0).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(ecounts)))
    if it_vals:
        AT = np.stack(it_act).T              # [rows, iters], row-major
        flat = np.stack(it_vals).T[AT]
        okf = np.stack(it_ok).T[AT]
        values = pa.array(flat, type=pa_elem, mask=~okf)
    else:
        values = pa.array([], type=pa_elem)
    lst = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), values)
    vmask = pa.array([bool(x) for x in valid], type=pa.bool_())
    return cur, pc.if_else(vmask, lst, pa.nulls(n, lst.type))


# ------------------------------------------------- stream file format
# The reference's on-disk/on-wire MsgPack format is a bare stream of
# values, row-major (no framing). write_msgpack emits exactly that (one
# .msgpack file per partition — any msgpack reader can consume it);
# read_msgpack re-discovers value boundaries from the TYPE BYTES alone:
# a vectorized value-length table gives next[p] for every byte position,
# and a single jump walk (the only sequential step, ~0.2s per million
# values) enumerates the starts, which then reshape row-major so every
# column decodes with the same masked-gather decoders as the cell path.
# Scalar schemas only: a nested value's length isn't position-computable
# without a stack, so arrays refuse here (cells support them).

def _value_lens(buf):
    """Length of the (scalar) msgpack value starting at each position.
    0 marks container/ext types (unsupported in the stream reader)."""
    import numpy as np

    B = buf.size
    t = buf
    lens = np.zeros(B, dtype=np.int64)
    one = ((t <= 0x7F) | (t >= 0xE0) | (t == 0xC0) | (t == 0xC2)
           | (t == 0xC3))
    lens[one] = 1
    for code, k in ((0xCC, 2), (0xCD, 3), (0xCE, 5), (0xCF, 9),
                    (0xD0, 2), (0xD1, 3), (0xD2, 5), (0xD3, 9),
                    (0xCA, 5), (0xCB, 9)):
        lens[t == code] = k
    m = (t >= 0xA0) & (t <= 0xBF)
    lens[m] = 1 + (t[m] & 0x1F)
    idx = np.arange(B)

    def _at(off, k, dt):
        p = np.minimum(idx + off, max(B - k, 0))
        return _be(buf, p, k, dt).astype(np.int64)

    if B:
        m = (t == 0xD9) | (t == 0xC4)
        lens[m] = 2 + _at(1, 1, "u1")[m]
        m = (t == 0xDA) | (t == 0xC5)
        lens[m] = 3 + _at(1, 2, "u2")[m]
        m = (t == 0xDB) | (t == 0xC6)
        lens[m] = 5 + _at(1, 4, "u4")[m]
    return lens


def write_msgpack(df: DataFrame, path: str,
                  suffix: str = ".msgpack") -> DataFrame:
    """Write a bare MessagePack value stream, one file per partition
    (the reference's MsgPack output format). Returns a (file, rows)
    manifest DataFrame (collect() to force the write)."""
    import os
    import sys
    import uuid

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    _check_schema(df.schema)
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            raise ValueError("msgpack stream files are scalar-only "
                             "(nested value boundaries aren't "
                             "position-computable on read); keep arrays "
                             "in the cell codec msgpack_encode")
    os.makedirs(path, exist_ok=True)
    cells = msgpack_encode(df, out_col="mp")

    def dump(batches):
        import pandas as pd
        chunks, rows = [], 0
        for pdf in batches:
            if len(pdf):
                chunks.append(b"".join(bytes(b) for b in pdf["mp"]))
                rows += len(pdf)
        if not rows:
            return
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}{suffix}")
        with open(fname, "wb") as fh:
            fh.write(b"".join(chunks))
        yield pd.DataFrame({"file": [fname], "rows": [rows]})

    return cells.mapInPandas(dump, "file string, rows long")


def read_msgpack(spark, path: str, schema: T.StructType | str,
                 col_glob: str = "*.msgpack") -> DataFrame:
    """Read bare MessagePack value streams written by write_msgpack (or
    any msgpack writer emitting row-major scalar values matching the
    schema)."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    _check_schema(schema)
    ncol = len(schema.fields)
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            raise ValueError("msgpack stream files are scalar-only")

    files = spark.read.format("binaryFile").load(f"{path}/{col_glob}") \
        .select("content")

    def dec(batches):
        import numpy as np
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("content"))
            for blob in col.to_pylist():
                buf = np.frombuffer(blob or b"", dtype=np.uint8)
                B = buf.size
                if B == 0:
                    continue
                vlens = _value_lens(buf)
                starts = []
                p = 0
                while p < B:                     # one jump per value
                    starts.append(p)
                    step = int(vlens[p])
                    if step == 0:
                        raise ValueError(
                            "msgpack stream: container/ext type byte "
                            f"0x{int(buf[p]):02x} at offset {p}")
                    p += step
                if p != B or len(starts) % ncol:
                    raise ValueError(
                        "msgpack stream: value count does not tile the "
                        f"schema ({len(starts)} values, {ncol} columns)")
                grid = np.asarray(starts, dtype=np.int64) \
                    .reshape(-1, ncol)
                # reuse the cell decoders with per-column cursors
                yield _decode_grid(buf, grid, schema, grid.shape[0])

    return files.mapInArrow(dec, schema)


def _decode_grid(buf, grid, schema, n):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute  # noqa: F401

    alive = np.ones(n, dtype=bool)
    out = {}
    for j, f in enumerate(schema.fields):
        cur = grid[:, j]
        t = f.dataType
        if isinstance(t, (T.LongType, T.IntegerType)):
            v, valid, _ = _dec_int_at(buf, cur, alive)
            pa_t = pa.int64() if isinstance(t, T.LongType) else pa.int32()
            out[f.name] = pa.array(
                [int(x) if ok else None for x, ok in zip(v, valid)],
                type=pa_t)
        elif isinstance(t, (T.DoubleType, T.FloatType)):
            v, valid, _ = _dec_float_at(buf, cur, alive)
            pa_t = pa.float64() if isinstance(t, T.DoubleType) \
                else pa.float32()
            out[f.name] = pa.array(
                [float(x) if ok else None for x, ok in zip(v, valid)],
                type=pa_t)
        elif isinstance(t, T.BooleanType):
            tb = buf[cur]
            known = (tb == 0xC2) | (tb == 0xC3) | (tb == 0xC0)
            if not bool(known.all()):
                # refuse loudly like the cell decoder — a silent False
                # for a foreign type byte is wrong data
                bad = tb[~known][0]
                raise ValueError(f"msgpack stream: unexpected type byte "
                                 f"0x{int(bad):02x} decoding a bool")
            out[f.name] = pa.array(
                [bool(x == 0xC3) if x != 0xC0 else None for x in tb],
                type=pa.bool_())
        elif isinstance(t, (T.StringType, T.BinaryType)):
            is_str = isinstance(t, T.StringType)
            hl, pl, valid = _dec_strbin_lens_at(buf, cur, alive, is_str)
            seg, offs = _collect_strbin(buf, cur, hl, pl, valid)
            vmask = pa.array([bool(x) for x in valid], type=pa.bool_())
            arr = pa.Array.from_buffers(
                pa.large_string() if is_str else pa.large_binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(seg.tobytes())])
            out[f.name] = pa.compute.if_else(vmask, arr,
                                             pa.nulls(n, arr.type))
        else:
            raise ValueError(f"msgpack stream: unsupported type {t}")
    return pa.RecordBatch.from_arrays(
        [out[f.name].cast(_spark_arrow_type(f.dataType))
         for f in schema.fields], [f.name for f in schema.fields])
