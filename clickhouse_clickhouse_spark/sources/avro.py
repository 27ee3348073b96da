"""Apache Avro Object Container Files — from-scratch reader/writer per
the PUBLIC Avro 1.11 specification (no avro jar, no avro-python): magic
``Obj\\x01``, metadata map (``avro.schema`` JSON, ``avro.codec``),
16-byte sync marker, then blocks of ``zigzag(count) zigzag(bytes)
records sync``. Supported type subset (the tabular shapes the reference
reads/writes through its Avro format): null, boolean, int, long, float,
double, string, bytes, union [null, T], and the logical types date
(int) / timestamp-micros (long). Codecs: null, deflate (raw zlib).

Scale shape mirrors ``sources/native.py``:

* **encode** — per Arrow batch, each field contributes byte SEGMENTS
  (per-record chunk + per-record lengths); one gather/scatter assembles
  the interleaved record stream. No per-record Python.
* **decode** — records are varint-interleaved with no length index, a
  sequentially-dependent chain. Kept vectorized in three phases:
  (1) parse a speculative unsigned varint at EVERY offset (<=10 masked
  passes); (2) compose a per-offset whole-record advance field by field
  and pointer-double it to resolve all record starts; (3) replay the
  advance over the record-start vector, gathering each field's values.
  O(block_bytes x fields) numpy, zero per-record Python.
"""

from __future__ import annotations

import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))          # deterministic sync marker for our files

# (avro primitive, logical) per supported Spark type
_SPARK_AVRO = {
    T.BooleanType: ("boolean", None), T.IntegerType: ("int", None),
    T.LongType: ("long", None), T.FloatType: ("float", None),
    T.DoubleType: ("double", None), T.StringType: ("string", None),
    T.BinaryType: ("bytes", None), T.DateType: ("int", "date"),
    T.TimestampType: ("long", "timestamp-micros"),
    T.TimestampNTZType: ("long", "timestamp-micros"),
}


def spark_schema_to_avro_json(schema: T.StructType,
                              name: str = "row") -> str:
    fields = []
    for f in schema.fields:
        if type(f.dataType) not in _SPARK_AVRO:
            raise TypeError(f"avro: unsupported column {f.name}: "
                            f"{f.dataType}")
        prim, logical = _SPARK_AVRO[type(f.dataType)]
        t = {"type": prim, "logicalType": logical} if logical else prim
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t})
    return json.dumps({"type": "record", "name": name, "fields": fields})


def _avro_json_fields(schema_json: str):
    """Parse the subset back: [(name, primitive, logical, nullable)]."""
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise TypeError("avro: only record top-level schemas supported")
    out = []
    for f in sch["fields"]:
        t = f["type"]
        nullable = 0
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise TypeError(f"avro: unsupported union {t!r}")
            # branch ORDER matters on the wire: the union index byte is
            # zigzag(branch) — 1 = null-first (["null",T], our writer's
            # convention: present byte 0x02), 2 = null-last (["T",null]
            # from foreign writers: present byte 0x00). The decoder
            # previously hardcoded null-first and silently corrupted
            # null-last files (round-14 review).
            nullable = 1 if t[0] == "null" else 2
            t = t[1] if t[0] == "null" else t[0]
        logical = None
        if isinstance(t, dict):
            logical = t.get("logicalType")
            t = t["type"]
        if t not in ("boolean", "int", "long", "float", "double",
                     "string", "bytes"):
            raise TypeError(f"avro: unsupported field type {t!r}")
        out.append((f["name"], t, logical, nullable))
    return out


def _fields_to_spark(fields) -> T.StructType:
    m = {"boolean": T.BooleanType(), "int": T.IntegerType(),
         "long": T.LongType(), "float": T.FloatType(),
         "double": T.DoubleType(), "string": T.StringType(),
         "bytes": T.BinaryType()}
    out = []
    for name, prim, logical, nullable in fields:
        dt = m[prim]
        if logical == "date":
            dt = T.DateType()
        elif logical in ("timestamp-micros", "timestamp-millis"):
            dt = T.TimestampType()
        # nullable is the union-order code (0/1/2) — StructField wants
        # a real bool (a bare int corrupts the schema JSON)
        out.append(T.StructField(name, dt, bool(nullable)))
    return T.StructType(out)


# ------------------------------------------------------------ varints

def _zigzag_chunks(vals):
    """int64 vector -> (concatenated zigzag-varint bytes, per-value byte
    counts). <=10 masked passes — the 64-bit LEB128 of the Avro spec."""
    import numpy as np
    u = ((vals.astype(np.int64) << 1)
         ^ (vals.astype(np.int64) >> 63)).astype(np.uint64)
    n = u.size
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb[u >= (np.uint64(1) << np.uint64(7 * k))] = k + 1
    pstart = np.concatenate(([0], np.cumsum(nb)))[:-1]
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for k in range(int(nb.max()) if n else 0):
        m = nb > k
        byte = (u[m] >> np.uint64(7 * k)) & np.uint64(0x7F)
        byte = np.where(nb[m] > k + 1,
                        byte | np.uint64(0x80), byte).astype(np.uint8)
        out[pstart[m] + k] = byte
    return out, nb


def _scalar_zigzag(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            return bytes(out)


def _read_scalar_varint(buf, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1), pos
        shift += 7


def _uvarint_all(buf):
    """Speculative UNSIGNED varint parse at every offset: (value, nbytes)
    int64/uint64 arrays. Same machinery as sources/native.py, 64-bit."""
    import numpy as np
    B = buf.size
    val = np.zeros(B, dtype=np.uint64)
    nb = np.zeros(B, dtype=np.int64)
    still = np.ones(B, dtype=bool)
    for k in range(10):
        idx = np.minimum(np.arange(B) + k, B - 1)
        byte = buf[idx].astype(np.uint64)
        val = np.where(still,
                       val | ((byte & np.uint64(0x7F)) << np.uint64(7 * k)),
                       val)
        stop = still & ((byte & np.uint64(0x80)) == 0)
        nb = np.where(stop, k + 1, nb)
        still &= (byte & np.uint64(0x80)) != 0
    return val, nb



def _exact_int64(s):
    """int64 vector from a pandas series WITHOUT float round-tripping:
    object-dtype input (how exact large ints arrive) converts per value,
    numeric dtypes stay vectorized. Values beyond 2^53 survive — the
    pd.to_numeric float64 path would round them."""
    import numpy as np
    import pandas as pd
    arr = s.to_numpy()
    if arr.dtype == object:
        return np.array([0 if x is None or x != x else int(x)
                         for x in arr], dtype=np.int64)
    return (pd.to_numeric(s, errors="coerce").fillna(0)
            .to_numpy().astype("int64"))


# ------------------------------------------------------------- encode

def _segments_for_batch(pdf, fields):
    """Per-field byte segments in record order — each a (chunk,
    slot_widths, emit_lens) triple: ``chunk`` holds every row's bytes at
    ``slot_widths`` spacing; ``emit_lens`` (0 for null rows) says how
    many of that slot's bytes the record stream takes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    n = len(pdf)
    segs = []

    def add(chunk, slots, mask):
        segs.append((chunk, slots.astype(np.int64),
                     np.where(mask, 0, slots).astype(np.int64)))

    for name, prim, logical, nullable in fields:
        s = pdf[name]
        mask = s.isna().to_numpy() if nullable else np.zeros(n, dtype=bool)
        if nullable:
            # union index: zigzag(0)=0x00 for null, zigzag(1)=0x02 —
            # ALWAYS emitted (1 byte per record)
            ones = np.ones(n, dtype=np.int64)
            segs.append((np.where(mask, 0, 2).astype(np.uint8),
                         ones, ones))
        if prim == "boolean":
            # object-dtype compare avoids pandas' fillna downcast warning
            v = (s.to_numpy(dtype=object) == True).astype(np.uint8)  # noqa: E712
            add(v, np.ones(n, dtype=np.int64), mask)
        elif prim in ("int", "long"):
            if logical == "date":
                v = (pd.to_datetime(s).to_numpy()
                     .astype("datetime64[D]").astype("int64"))
                v = np.where(mask, 0, v)
            elif logical == "timestamp-micros":
                ts = pd.to_datetime(s).to_numpy()
                v = np.where(mask, np.int64(0),
                             ts.astype("datetime64[us]").astype("int64"))
            else:
                v = _exact_int64(s)
            chunk, nb = _zigzag_chunks(v)
            add(chunk, nb, mask)
        elif prim in ("float", "double"):
            w = 4 if prim == "float" else 8
            v = (pd.to_numeric(s, errors="coerce").fillna(0.0)
                 .to_numpy().astype("<f4" if w == 4 else "<f8"))
            add(v.view(np.uint8), np.full(n, w, dtype=np.int64), mask)
        elif prim in ("string", "bytes"):
            if prim == "string":
                a = pa.array(s.fillna("").astype(str),
                             type=pa.large_utf8())
                offs = np.frombuffer(a.buffers()[1], dtype=np.int64)
                payload = np.frombuffer(
                    a.buffers()[2] or b"", dtype=np.uint8)[:offs[-1]]
                lens = np.diff(offs)
            else:
                raw = [b"" if x is None else bytes(x) for x in s]
                lens = np.array([len(x) for x in raw], dtype=np.int64)
                payload = np.frombuffer(b"".join(raw), dtype=np.uint8)
            chunk, nb = _zigzag_chunks(lens)
            add(chunk, nb, mask)
            add(payload, lens, mask)
        else:
            raise TypeError(f"avro: unsupported primitive {prim!r}")
    return segs


def _assemble(segs, n: int) -> bytes:
    """Interleave per-field segments into the record stream — one
    O(total bytes) gather per segment (sources/render.py pattern).
    Source offsets come from slot widths (all rows occupy their slot in
    the chunk), target lengths from emit_lens (null rows emit 0)."""
    import numpy as np
    out_lens = np.stack([e for _, _, e in segs], axis=1)
    row_len = out_lens.sum(axis=1)
    row_start = np.concatenate(([0], np.cumsum(row_len)))
    within = np.cumsum(out_lens, axis=1) - out_lens
    out = np.empty(int(row_start[-1]), dtype=np.uint8)
    for j, (chunk, slots, L) in enumerate(segs):
        chunk = np.ascontiguousarray(chunk).view(np.uint8).ravel()
        tot = int(L.sum())
        if tot == 0:
            continue
        src_start = np.concatenate(([0], np.cumsum(slots)))[:-1]
        tgt = row_start[:-1] + within[:, j]
        wi = np.arange(tot) - np.repeat(np.cumsum(L) - L, L)
        out[np.repeat(tgt, L) + wi] = chunk[np.repeat(src_start, L) + wi]
    return out.tobytes()


def avro_encode_blocks(df: DataFrame, codec: str = "null") -> DataFrame:
    """One Avro data block (count, size, records[, deflated]) per Arrow
    batch, plus the fields/schema carried driver-side by the writer."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    fields = _avro_json_fields(spark_schema_to_avro_json(df.schema))

    def enc(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            body = _assemble(_segments_for_batch(pdf, fields), n)
            if codec == "deflate":
                body = zlib.compress(body, 6)[2:-4]   # raw deflate
            block = (_scalar_zigzag(n) + _scalar_zigzag(len(body))
                     + body + SYNC)
            yield pd.DataFrame({"block": [block]})

    return df.mapInPandas(enc, "block binary")


def write_avro(df: DataFrame, path: str, codec: str = "null") -> DataFrame:
    """Avro OCF sink: header + this partition's blocks per part file.
    Returns the (file, blocks) manifest."""
    import os
    import sys
    import uuid

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    os.makedirs(path, exist_ok=True)
    schema_json = spark_schema_to_avro_json(df.schema)
    header = _file_header(schema_json, codec)
    blocks = avro_encode_blocks(df, codec=codec)

    def dump(batches):
        import pandas as pd
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        nb = 0
        with open(fname, "wb") as fh:
            fh.write(header)
            for pdf in batches:
                for blob in pdf["block"]:
                    fh.write(blob)
                    nb += 1
        if nb:
            yield pd.DataFrame({"file": [fname], "blocks": [nb]})

    return blocks.mapInPandas(dump, "file string, blocks long")


def _file_header(schema_json: str, codec: str) -> bytes:
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    out = [MAGIC, _scalar_zigzag(len(meta))]
    for k, v in meta.items():
        out.append(_scalar_zigzag(len(k)) + k.encode())
        out.append(_scalar_zigzag(len(v)) + v)
    out.append(_scalar_zigzag(0))
    out.append(SYNC)
    return b"".join(out)


# ------------------------------------------------------------- decode

def _advance_all(buf, fields):
    """next[o] for every offset o: where the FOLLOWING record starts if a
    record begins at o — composed per field, fully vectorized."""
    import numpy as np
    B = buf.size
    uval, unb = _uvarint_all(buf)
    # lengths are zigzag longs: non-negative, so decode = u >> 1
    len_c = np.minimum(uval >> np.uint64(1),
                       np.uint64(B)).astype(np.int64)

    def clip(x):
        return np.minimum(x, B)

    cur = np.arange(B + 1, dtype=np.int64)
    cur = cur[:B]
    for name, prim, logical, nullable in fields:
        if nullable:
            idx = buf[np.minimum(cur, B - 1)]
            present_byte = 2 if nullable == 1 else 0
            present = (idx == present_byte) & (cur < B)
            cur = clip(cur + 1)
        else:
            present = cur < B
        c = np.minimum(cur, B - 1)
        if prim == "boolean":
            adv = np.ones(B, dtype=np.int64)
        elif prim in ("int", "long"):
            adv = unb[c]
        elif prim == "float":
            adv = np.full(B, 4, dtype=np.int64)
        elif prim == "double":
            adv = np.full(B, 8, dtype=np.int64)
        else:                                  # string / bytes
            adv = unb[c] + len_c[c]
        cur = clip(np.where(present, cur + adv, cur))
    nxt = np.append(cur, B)
    return nxt, uval, unb


def _decode_block(buf, fields, count: int):
    """All records of one (decompressed) block -> dict of numpy/pandas
    columns. Pointer-doubled record starts, then a per-field replay."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    B = buf.size
    nxt, uval, unb = _advance_all(buf, fields)
    pos = np.zeros(count, dtype=np.int64)
    cur = nxt
    i = np.arange(count)
    bit = 1
    while bit <= count:
        m = (i & bit) != 0
        if m.any():
            pos[m] = cur[np.minimum(pos[m], B)]
        cur = cur[np.minimum(cur, B)]
        bit <<= 1
    # >= B, not B+1: pos is CLIPPED to B, so the old B+1 comparison was
    # unreachable and truncated blocks decoded to clipped garbage
    # (round-14 review; native.py uses the same bound)
    if count and int(pos[-1]) >= B:
        raise ValueError("avro: truncated block")
    out = {}
    for name, prim, logical, nullable in fields:
        if nullable:
            null_byte = 0 if nullable == 1 else 2
            mask = buf[np.minimum(pos, B - 1)] == null_byte
            pos = pos + 1
        else:
            mask = np.zeros(count, dtype=bool)
        p = np.minimum(pos, B - 1)
        if prim == "boolean":
            vals = buf[p].astype(bool)
            adv = np.where(mask, 0, 1)
        elif prim in ("int", "long"):
            u = uval[p]
            vals = ((u >> np.uint64(1)).astype(np.int64)
                    ^ -(u & np.uint64(1)).astype(np.int64))
            adv = np.where(mask, 0, unb[p])
        elif prim in ("float", "double"):
            w = 4 if prim == "float" else 8
            block = buf[np.minimum(p[:, None] + np.arange(w), B - 1)]
            vals = np.ascontiguousarray(block).view(
                "<f4" if w == 4 else "<f8").ravel()
            adv = np.where(mask, 0, w)
        else:
            lens = np.where(mask, 0,
                            np.minimum(uval[p] >> np.uint64(1),
                                       np.uint64(B)).astype(np.int64))
            starts = p + unb[p]
            tot = int(lens.sum())
            wi = np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
            payload = buf[np.minimum(np.repeat(starts, lens) + wi, B - 1)]
            offs = np.concatenate(([0], np.cumsum(lens)))
            if prim == "string":
                arr = pa.LargeStringArray.from_buffers(
                    count, pa.py_buffer(offs.tobytes()),
                    pa.py_buffer(payload.tobytes()))
                vals = arr.to_pandas().to_numpy(dtype=object)
            else:
                pb = payload.tobytes()
                vals = np.array(
                    [pb[offs[k]:offs[k + 1]] for k in range(count)],
                    dtype=object)
            adv = np.where(mask, 0, unb[p] + lens)
        # logical types — zero the masked rows FIRST: their vals are
        # speculative-varint garbage from the next field's bytes, and
        # to_datetime on them raised OutOfBoundsDatetime on valid
        # files (round-14 review); the mask overwrites with None below
        if logical and mask.any():
            vals = np.where(mask, 0, np.asarray(vals, dtype="int64"))
        if logical == "date":
            vals = pd.Series(
                pd.to_datetime(np.asarray(vals, dtype="int64"),
                               unit="D")).dt.date.to_numpy(dtype=object)
        elif logical == "timestamp-micros":
            vals = pd.to_datetime(np.asarray(vals, dtype="int64"),
                                  unit="us").to_numpy()
        elif logical == "timestamp-millis":
            vals = pd.to_datetime(np.asarray(vals, dtype="int64"),
                                  unit="ms").to_numpy()
        if mask.any():
            vals = np.asarray(vals, dtype=object)
            vals[mask] = None
        out[name] = vals
        pos = pos + adv
    return out


def _decode_file(data: bytes):
    """Header + blocks of one OCF -> (fields, iterator of column dicts)."""
    import numpy as np
    if data[:4] != MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_scalar_varint(data, pos)
        if cnt == 0:
            break
        if cnt < 0:           # negative count form: abs count + size
            cnt, pos = -cnt, _read_scalar_varint(data, pos)[1]
        for _ in range(cnt):
            klen, pos = _read_scalar_varint(data, pos)
            key = data[pos:pos + klen].decode()
            pos += klen
            vlen, pos = _read_scalar_varint(data, pos)
            meta[key] = data[pos:pos + vlen]
            pos += vlen
    sync = data[pos:pos + 16]
    pos += 16
    fields = _avro_json_fields(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    frames = []
    while pos < len(data):
        count, pos = _read_scalar_varint(data, pos)
        size, pos = _read_scalar_varint(data, pos)
        body = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        frames.append(_decode_block(
            np.frombuffer(body, dtype=np.uint8), fields, count))
    return fields, frames


def read_avro(spark: SparkSession, path: str,
              schema: T.StructType | None = None) -> DataFrame:
    """Avro OCF source over binaryFile: files parallelize across the
    cluster, each decodes executor-side through the vectorized chain
    decoder. Schema defaults to the embedded writer schema (read driver-
    side from one file's header)."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    files = spark.read.format("binaryFile").load(f"{path}/*.avro")
    if schema is None:
        one = files.select("content").limit(1).collect()[0].content
        fields, _ = _decode_file(bytes(one))
        schema = _fields_to_spark(fields)

    def parse(batches):
        import pandas as pd
        for pdf in batches:
            for blob in pdf["content"]:
                _, frames = _decode_file(bytes(blob))
                for cols in frames:
                    yield pd.DataFrame(cols)

    return files.select("content").mapInPandas(parse, schema)


def avro_decode_blocks(df: DataFrame, schema: T.StructType,
                       block_col: str = "block",
                       codec: str = "null") -> DataFrame:
    """Inverse of :func:`avro_encode_blocks` — the in-plan (no file)
    round trip used by the oracle query; ``read_avro`` is the file
    path."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    fields = _avro_json_fields(spark_schema_to_avro_json(schema))

    def dec(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            for blob in pdf[block_col]:
                data = bytes(blob)
                count, pos = _read_scalar_varint(data, 0)
                size, pos = _read_scalar_varint(data, pos)
                body = data[pos:pos + size]
                if codec == "deflate":
                    body = zlib.decompress(body, -15)
                yield pd.DataFrame(_decode_block(
                    np.frombuffer(body, dtype=np.uint8), fields, count))

    return df.mapInPandas(dec, schema)
