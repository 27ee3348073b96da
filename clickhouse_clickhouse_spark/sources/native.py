"""The reference's ``Native`` wire/file format (upstream
``src/Formats/NativeWriter.cpp`` / ``NativeReader.cpp``): self-describing
COLUMNAR blocks — per block a varint column count and row count, then per
column its name, its type name, and the column data laid out column-wise
(the same cell encodings as RowBinary: little-endian fixed-width
numerics, varint-length-prefixed strings, Date as UInt16 days, DateTime
as UInt32 epoch seconds; ``Nullable(T)`` prepends one null-mask byte per
row). This is the classic block layout (no custom-serialization flag) —
the form ``clickhouse-client --format Native`` files and inter-server
exchange use at the base protocol revision.

Spark-first shape: one Native block per Arrow batch via ``mapInPandas``
(binary exchange is the documented Python path); encode stays columnar —
numpy buffer assembly per column, never per row. Decode is the
interesting half: a String column's values are varint+payload
INTERLEAVED, a sequentially-dependent chain. The decoder stays fully
vectorized via pointer doubling: parse a speculative varint at EVERY
byte offset once (<=10 masked passes), derive ``next[o]`` = where the
following value would start if one started at ``o``, then resolve all
``count`` chain positions with log2(count) composed gathers — O(bytes
log rows) numpy, zero per-value Python. That keeps a 100 TB Native
export/import on the same footing as the vectorized RowBinary path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FIXED_CH = {
    "Int8": ("<i1", 1), "Int16": ("<i2", 2), "Int32": ("<i4", 4),
    "Int64": ("<i8", 8), "Float32": ("<f4", 4), "Float64": ("<f8", 8),
}
_SPARK_FIXED = {
    T.ByteType: "Int8", T.ShortType: "Int16", T.IntegerType: "Int32",
    T.LongType: "Int64", T.FloatType: "Float32", T.DoubleType: "Float64",
}


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _read_varint(buf, pos: int) -> tuple[int, int]:
    val, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _leb128_block(lens):
    """Vectorized LEB128 prefixes for an int64 length vector: returns
    (concatenated prefix bytes, per-value prefix byte counts)."""
    import numpy as np
    n = lens.size
    nb = np.ones(n, dtype=np.int64)
    for k, bound in enumerate((1 << 7, 1 << 14, 1 << 21, 1 << 28)):
        nb[lens >= bound] = k + 2
    pstart = np.concatenate(([0], np.cumsum(nb)))[:-1]
    prefix = np.zeros(int(nb.sum()), dtype=np.uint8)
    for k in range(int(nb.max()) if n else 0):
        m = nb > k
        byte = (lens[m] >> (7 * k)) & 0x7F
        byte = np.where(nb[m] > k + 1, byte | 0x80, byte)
        prefix[pstart[m] + k] = byte
    return prefix, nb


def _scatter(out, tgt_starts, chunk, chunk_lens):
    """Copy per-value variable-length chunks to per-value target offsets
    in one gather/scatter (no Python per value)."""
    import numpy as np
    tot = int(chunk_lens.sum())
    if not tot:
        return
    src_start = np.concatenate(([0], np.cumsum(chunk_lens)))[:-1]
    within = np.arange(tot) - np.repeat(np.cumsum(chunk_lens) - chunk_lens,
                                        chunk_lens)
    out[np.repeat(tgt_starts, chunk_lens) + within] = \
        chunk[np.repeat(src_start, chunk_lens) + within]


def _string_column_bytes(series):
    """String column -> Native column data (varint len + utf8 payload per
    value, interleaved), columnar numpy assembly."""
    import numpy as np
    import pyarrow as pa
    a = pa.array(series.astype(str), type=pa.large_utf8())
    offs = np.frombuffer(a.buffers()[1], dtype=np.int64)
    payload = np.frombuffer(a.buffers()[2] or b"",
                            dtype=np.uint8)[:offs[-1]]
    lens = np.diff(offs)
    prefix, nb = _leb128_block(lens)
    starts = np.concatenate(([0], np.cumsum(nb + lens)))[:-1]
    out = np.empty(int((nb + lens).sum()), dtype=np.uint8)
    _scatter(out, starts, prefix, nb)
    _scatter(out, starts + nb, payload, lens)
    return out.tobytes()


def _varint_chain(buf, start: int, count: int):
    """Decode COUNT varint-length-prefixed values laid back-to-back from
    ``start`` — WITHOUT a sequential per-value walk. Phase 1 parses a
    speculative varint at every byte offset (masked passes). Phase 2
    resolves the value-start chain by pointer doubling: positions[i] =
    next^i(start), computed for all i at once from the binary digits of
    i with composed gathers. Returns (value_payload_starts, lens)."""
    import numpy as np
    B = buf.size
    val = np.zeros(B, dtype=np.int64)
    nb = np.zeros(B, dtype=np.int64)
    still = np.ones(B, dtype=bool)
    for k in range(10):
        idx = np.minimum(np.arange(B) + k, B - 1)
        byte = buf[idx].astype(np.int64)
        val = np.where(still, val | ((byte & 0x7F) << (7 * k)), val)
        stop = still & ((byte & 0x80) == 0)
        nb = np.where(stop, k + 1, nb)
        still &= (byte & 0x80) != 0
    nxt = np.minimum(np.arange(B) + nb + np.maximum(val, 0), B)
    nxt = np.append(nxt, B).astype(np.int64)
    pos = np.full(count, start, dtype=np.int64)
    cur = nxt
    i = np.arange(count)
    bit = 1
    while bit <= count:
        m = (i & bit) != 0
        if m.any():
            pos[m] = cur[pos[m]]
        cur = cur[cur]
        bit <<= 1
    if count and int(pos[-1]) >= B:
        raise ValueError("Native: truncated string column")
    return pos + nb[pos], val[pos]


def _varint_chain_windowed(buf, count: int):
    """_varint_chain over a GROWING window. The former whole-remainder
    call re-scanned every byte to END OF FILE (10 masked passes) once
    per string column per block — O(file_bytes x blocks) on multi-block
    exports (round-14 review). The window doubles until the chain fits
    strictly inside it (or hits the real end), so total work tracks the
    bytes actually consumed."""
    B = buf.size
    win = int(min(B, max(64, count * 16)))
    while True:
        try:
            starts, lens = _varint_chain(buf[:win], 0, count)
            consumed = int(starts[-1] + lens[-1]) if count else 0
            # accept only with a full varint width (10 bytes) of
            # margin: a varint straddling the window edge reads
            # clipped bytes and can parse to a zero-advance fixed
            # point that would falsely accept; the margin guarantees
            # every varint on the chain saw its bytes unclipped. At
            # win == B the parse equals the unwindowed original.
            if win >= B or consumed <= win - 10:
                return starts, lens
        except ValueError:
            # chain overran the window: only a real truncation if the
            # window already covers the whole buffer
            if win >= B:
                raise
        win = int(min(B, win * 2))


def _gather_strings(buf, starts, lens):
    import numpy as np
    import pyarrow as pa
    tot = int(lens.sum())
    within = np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
    payload = buf[np.repeat(starts, lens) + within]
    offs = np.concatenate(([0], np.cumsum(lens)))
    return pa.LargeStringArray.from_buffers(
        lens.size, pa.py_buffer(offs.tobytes()),
        pa.py_buffer(payload.tobytes())).to_pandas()


def native_encode(df: DataFrame, block_col: str = "block") -> DataFrame:
    """Encode to Native blocks: one self-describing columnar block per
    Arrow batch (column ``block``). Column types come from the Spark
    schema via the DESCRIBE mapping; nullable fields become
    ``Nullable(T)`` with the reference's null-mask-then-data layout."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    from clickhouse_clickhouse_spark.types_map import spark_type_to_ch

    fields = [(f.name, type(f.dataType),
               spark_type_to_ch(f.dataType, f.nullable), f.nullable)
              for f in df.schema.fields]
    for name, ftype, ch, _ in fields:
        if ftype not in _SPARK_FIXED and ftype not in (
                T.StringType, T.DateType, T.TimestampType,
                T.TimestampNTZType):
            raise TypeError(f"Native: unsupported column {name}: {ch}")

    def encode(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            parts = [_varint(len(fields)), _varint(n)]
            for name, ftype, ch, nullable in fields:
                parts.append(_varint(len(name.encode())))
                parts.append(name.encode())
                parts.append(_varint(len(ch.encode())))
                parts.append(ch.encode())
                s = pdf[name]
                if nullable:
                    mask = s.isna().to_numpy()
                    parts.append(mask.astype(np.uint8).tobytes())
                if ftype in _SPARK_FIXED:
                    dt, _w = _FIXED_CH[_SPARK_FIXED[ftype]]
                    vals = pd.to_numeric(s, errors="coerce") \
                        .fillna(0).to_numpy().astype(dt)
                    parts.append(vals.tobytes())
                elif ftype is T.StringType:
                    parts.append(_string_column_bytes(s.fillna("")))
                elif ftype is T.DateType:
                    days = (pd.to_datetime(s)
                            .to_numpy().astype("datetime64[D]")
                            .astype("int64"))
                    days = np.where(np.isnat(pd.to_datetime(s).to_numpy()),
                                    0, days)
                    parts.append(days.astype("<u2").tobytes())
                else:
                    ts = pd.to_datetime(s).to_numpy()
                    secs = np.where(np.isnat(ts), np.int64(0),
                                    ts.astype("datetime64[s]")
                                    .astype("int64"))
                    parts.append(secs.astype("<u4").tobytes())
            yield pd.DataFrame({block_col: [b"".join(parts)]})

    return df.mapInPandas(encode, f"{block_col} binary")


def _decode_blocks(buf, schema: T.StructType):
    """All blocks in one byte buffer -> list of pandas DataFrames."""
    import numpy as np
    import pandas as pd
    u8 = np.frombuffer(buf, dtype=np.uint8)
    pos, frames = 0, []
    expect = {f.name: f for f in schema.fields}
    while pos < u8.size:
        ncols, pos = _read_varint(u8, pos)
        nrows, pos = _read_varint(u8, pos)
        cols = {}
        for _ in range(ncols):
            ln, pos = _read_varint(u8, pos)
            name = bytes(u8[pos:pos + ln]).decode()
            pos += ln
            ln, pos = _read_varint(u8, pos)
            ch = bytes(u8[pos:pos + ln]).decode()
            pos += ln
            f = expect.get(name)
            if f is None:
                raise ValueError(f"Native: unexpected column {name!r}")
            nullable = ch.startswith("Nullable(")
            base = ch[9:-1] if nullable else ch
            mask = None
            if nullable:
                mask = u8[pos:pos + nrows].astype(bool)
                pos += nrows
            if base in _FIXED_CH:
                dt, w = _FIXED_CH[base]
                vals = np.ascontiguousarray(
                    u8[pos:pos + nrows * w]).view(dt).copy()
                pos += nrows * w
                col = pd.Series(vals)
            elif base == "String":
                starts, lens = _varint_chain_windowed(u8[pos:], nrows)
                col = pd.Series(_gather_strings(u8[pos:], starts, lens))
                if nrows:
                    pos += int(starts[-1] + lens[-1])
            elif base == "Date":
                days = np.ascontiguousarray(
                    u8[pos:pos + nrows * 2]).view("<u2").astype("int64")
                pos += nrows * 2
                col = pd.Series(pd.to_datetime(days, unit="D")).dt.date
            elif base == "DateTime":
                secs = np.ascontiguousarray(
                    u8[pos:pos + nrows * 4]).view("<u4").astype("int64")
                pos += nrows * 4
                col = pd.Series(pd.to_datetime(secs, unit="s"))
            else:
                raise TypeError(f"Native: unsupported type {ch}")
            if mask is not None and mask.any():
                col = col.astype(object)
                col[mask] = None
            cols[name] = col
        frames.append(pd.DataFrame(cols))
    return frames


def native_decode(df: DataFrame, schema: T.StructType,
                  block_col: str = "block") -> DataFrame:
    """Inverse of :func:`native_encode`: parse self-describing blocks
    back to typed rows (schema names must match the block headers —
    mismatches error loudly, never coerce silently)."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    def decode(batches):
        for pdf in batches:
            for blob in pdf[block_col]:
                yield from _decode_blocks(bytes(blob), schema)

    return df.mapInPandas(decode, schema)


def write_native(df: DataFrame, path: str) -> DataFrame:
    """Native file sink: each partition appends its blocks to one
    ``.native`` part file under ``path`` (concatenated blocks IS the
    Native file layout). Returns the (file, rows) manifest."""
    import os
    import sys
    import uuid

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    os.makedirs(path, exist_ok=True)
    blocks = native_encode(df)

    def dump(batches):
        import pandas as pd
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.native")
        n = 0
        with open(fname, "wb") as fh:
            for pdf in batches:
                for blob in pdf["block"]:
                    fh.write(blob)
                    n += 1
        if n:
            yield pd.DataFrame({"file": [fname], "blocks": [n]})

    return blocks.mapInPandas(dump, "file string, blocks long")


def read_native(spark: SparkSession, path: str,
                schema: T.StructType) -> DataFrame:
    """Native file source: every ``.native`` part file decodes
    executor-side via the binaryFile source — files parallelize across
    the cluster, blocks within a file stream through the vectorized
    decoder."""
    files = spark.read.format("binaryFile").load(f"{path}/*.native")
    return native_decode(files.select("content"), schema,
                         block_col="content")
