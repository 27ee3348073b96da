"""Protocol Buffers wire format — from-scratch codec per the PUBLIC
protobuf encoding spec (no protoc, no protobuf package): varint tags
``(field_number << 3) | wire_type``, wire types 0 (varint), 1 (64-bit
LE), 2 (length-delimited), 5 (32-bit LE). Two framings, matching the
reference's formats: ``Protobuf`` (each row varint-length-delimited)
and ``ProtobufSingle`` (one bare message per cell).

Schema comes from a flat ``.proto`` message text (the reference's
user-supplied schema contract) or is derived from the Spark schema.
Supported field types: bool, int32/int64/uint32/uint64 (plain varint),
sint32/sint64 (zigzag), float, double, string, bytes. proto3 semantics:
a NULL (or absent) field is omitted on the wire and decodes to the
default — the same NULL<->default collapse the reference documents for
its Protobuf format. Repeated/nested messages refuse loudly.

Scale shape: encode is the segment-assembly pattern (tag/varint/payload
segments, one gather each); decode reuses the speculative-varint parse
and resolves frame boundaries with the pointer-doubling chain, then
walks the schema's fields IN CANONICAL ASCENDING ORDER with per-message
presence masks — all numpy, no per-row Python. Non-canonical field
order or unknown trailing fields raise rather than misparse.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from clickhouse_clickhouse_spark.sources.avro import (
    _exact_int64,
    _uvarint_all,
    _zigzag_chunks,
)

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5

_PB_TYPES = {
    "bool": _VARINT, "int32": _VARINT, "int64": _VARINT,
    "uint32": _VARINT, "uint64": _VARINT, "sint32": _VARINT,
    "sint64": _VARINT, "float": _I32, "double": _I64,
    "string": _LEN, "bytes": _LEN,
}

_SPARK_PB = {
    T.BooleanType: "bool", T.IntegerType: "int32", T.LongType: "int64",
    T.FloatType: "float", T.DoubleType: "double", T.StringType: "string",
    T.BinaryType: "bytes",
}


def parse_proto(text: str) -> list[tuple[str, str, int]]:
    """Flat ``message { type name = N; }`` subset -> [(name, ptype,
    field_number)] sorted by field number (wire-canonical order)."""
    body = re.search(r"message\s+\w+\s*\{([^}]*)\}", text, re.DOTALL)
    if not body:
        raise ValueError("protobuf: no flat `message X { ... }` found")
    fields = []
    for line in body.group(1).split(";"):
        line = re.sub(r"//.*", "", line).strip()
        if not line:
            continue
        mm = re.match(r"(?:optional\s+)?(\w+)\s+(\w+)\s*=\s*(\d+)$", line)
        if not mm:
            raise ValueError(
                f"protobuf: unsupported field declaration {line!r} — "
                "flat scalar fields only (no repeated/map/nested)")
        ptype, name, num = mm.group(1), mm.group(2), int(mm.group(3))
        if ptype not in _PB_TYPES:
            raise ValueError(f"protobuf: unsupported type {ptype!r}; "
                             f"supported: {sorted(_PB_TYPES)}")
        fields.append((name, ptype, num))
    return sorted(fields, key=lambda f: f[2])


def spark_schema_to_proto(schema: T.StructType,
                          name: str = "Row") -> str:
    lines = []
    for i, f in enumerate(schema.fields):
        if type(f.dataType) not in _SPARK_PB:
            raise TypeError(f"protobuf: unsupported column {f.name}: "
                            f"{f.dataType}")
        lines.append(f"  {_SPARK_PB[type(f.dataType)]} {f.name}"
                     f" = {i + 1};")
    return "message " + name + " {\n" + "\n".join(lines) + "\n}"


def _fields_to_spark(fields) -> T.StructType:
    m = {"bool": T.BooleanType(), "int32": T.IntegerType(),
         "sint32": T.IntegerType(), "uint32": T.LongType(),
         "int64": T.LongType(), "sint64": T.LongType(),
         "uint64": T.LongType(), "float": T.FloatType(),
         "double": T.DoubleType(), "string": T.StringType(),
         "bytes": T.BinaryType()}
    return T.StructType(
        [T.StructField(n, m[t], True) for n, t, _ in fields])


def _tag_bytes(num: int, wt: int) -> bytes:
    u = (num << 3) | wt
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            return bytes(out)


def _plain_varint_chunks(vals):
    """Plain (two's-complement) protobuf varints for an int64 vector —
    negatives take 10 bytes, per the spec."""
    import numpy as np
    u = vals.astype(np.int64).astype(np.uint64)
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


def _message_segments(pdf, fields):
    """(chunk, slot_widths, emit_lens) triples for one batch's messages
    (no frame prefix) — NULL fields emit nothing (proto3 omission)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    n = len(pdf)
    segs = []

    def add(chunk, slots, emit):
        segs.append((chunk, slots.astype(np.int64),
                     emit.astype(np.int64)))

    for name, ptype, num in fields:
        s = pdf[name]
        mask = s.isna().to_numpy()
        tag = np.frombuffer(_tag_bytes(num, _PB_TYPES[ptype]) * n,
                            dtype=np.uint8)
        tw = len(_tag_bytes(num, _PB_TYPES[ptype]))
        tag_slots = np.full(n, tw, dtype=np.int64)
        add(tag, tag_slots, np.where(mask, 0, tag_slots))
        if ptype == "bool":
            v = (s.to_numpy(dtype=object) == True).astype(np.uint8)  # noqa: E712
            ones = np.ones(n, dtype=np.int64)
            add(v, ones, np.where(mask, 0, ones))
        elif ptype in ("int32", "int64", "uint32", "uint64"):
            v = _exact_int64(s)
            chunk, nb = _plain_varint_chunks(v)
            add(chunk, nb, np.where(mask, 0, nb))
        elif ptype in ("sint32", "sint64"):
            v = _exact_int64(s)
            chunk, nb = _zigzag_chunks(v)
            add(chunk, nb, np.where(mask, 0, nb))
        elif ptype in ("float", "double"):
            w = 4 if ptype == "float" else 8
            v = (pd.to_numeric(s, errors="coerce").fillna(0.0)
                 .to_numpy().astype("<f4" if w == 4 else "<f8"))
            slots = np.full(n, w, dtype=np.int64)
            add(v.view(np.uint8), slots, np.where(mask, 0, slots))
        else:                                     # string / bytes
            if ptype == "string":
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
            chunk, nb = _plain_varint_chunks(lens)
            add(chunk, nb, np.where(mask, 0, nb))
            add(payload, lens, np.where(mask, 0, lens))
    return segs


def _assemble_framed(segs, n: int, framed: bool) -> "tuple":
    """Interleave segments into per-row messages; with ``framed``, each
    message gains its varint length prefix (the Protobuf row format).
    Returns (bytes, per-row cell lengths) so callers can emit one binary
    cell per row."""
    import numpy as np
    emit = np.stack([e for _, _, e in segs], axis=1)
    msg_len = emit.sum(axis=1)
    if framed:
        prefix, pnb = _plain_varint_chunks(msg_len)
        row_len = pnb + msg_len
    else:
        prefix, pnb = None, np.zeros(n, dtype=np.int64)
        row_len = msg_len
    row_start = np.concatenate(([0], np.cumsum(row_len)))
    out = np.empty(int(row_start[-1]), dtype=np.uint8)
    if framed and prefix.size:
        src = np.concatenate(([0], np.cumsum(pnb)))[:-1]
        wi = np.arange(int(pnb.sum())) - np.repeat(np.cumsum(pnb) - pnb,
                                                   pnb)
        out[np.repeat(row_start[:-1], pnb) + wi] = \
            prefix[np.repeat(src, pnb) + wi]
    within = np.cumsum(emit, axis=1) - emit
    for j, (chunk, slots, L) in enumerate(segs):
        chunk = np.ascontiguousarray(chunk).view(np.uint8).ravel()
        tot = int(L.sum())
        if tot == 0:
            continue
        src_start = np.concatenate(([0], np.cumsum(slots)))[:-1]
        tgt = row_start[:-1] + pnb + within[:, j]
        wi = np.arange(tot) - np.repeat(np.cumsum(L) - L, L)
        out[np.repeat(tgt, L) + wi] = chunk[np.repeat(src_start, L) + wi]
    return out.tobytes(), row_len


def protobuf_encode(df: DataFrame, proto: str | None = None,
                    framed: bool = True,
                    out_col: str = "pb") -> DataFrame:
    """Encode rows to protobuf messages (one binary cell per row):
    ``framed=True`` = the reference's ``Protobuf`` length-delimited row
    format, ``False`` = ``ProtobufSingle``."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    fields = parse_proto(proto or spark_schema_to_proto(df.schema))
    names = {n for n, _, _ in fields}
    missing = [c for c in df.columns if c not in names]
    if missing:
        raise ValueError(f"protobuf: columns {missing} absent from the "
                         "message definition")

    def enc(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            body, row_len = _assemble_framed(
                _message_segments(pdf, fields), n, framed)
            offs = np.concatenate(
                ([0], np.cumsum(row_len))).astype(np.int64)
            arr = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(body)])
            yield pd.DataFrame({out_col: arr.to_pandas()})

    return df.mapInPandas(enc, f"{out_col} binary")


def protobuf_decode(df: DataFrame, proto: str,
                    col: str = "pb", framed: bool = True) -> DataFrame:
    """Decode protobuf message cells back to rows; pass the SAME
    ``framed`` flag the cells were encoded with (a tag byte can
    masquerade as a frame length, so framing is declared, not sniffed).
    Fields missing on the wire become NULL (the reference's Nullable
    mapping; defaults collapse). Canonical ascending field order is
    required — anything else raises rather than misparses."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    fields = parse_proto(proto)
    schema = _fields_to_spark(fields)

    def dec(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # NULL cells decode to an all-null row like the msgpack
            # decoder, instead of a bare TypeError in the executor
            # (round-14 review)
            cells = [bytes(b) if b is not None else b"" for b in pdf[col]]
            lens = np.array([len(c) for c in cells], dtype=np.int64)
            buf = np.frombuffer(b"".join(cells), dtype=np.uint8)
            if buf.size == 0:
                # a batch of only NULL/empty cells: one zero pad byte
                # keeps the vector gathers in-bounds; `present` is
                # all-False (cur == ends), so every field nulls out
                buf = np.zeros(1, dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            ends = starts + lens
            uval, unb = _uvarint_all(buf) if buf.size else (
                np.zeros(0, np.uint64), np.zeros(0, np.int64))
            B = buf.size

            def clip(x):
                return np.minimum(x, B - 1) if B else x

            cur = starts.copy()
            if framed and B:
                # frame length + its prefix must span the whole cell
                ok = (unb[clip(starts)]
                      + np.minimum(uval[clip(starts)],
                                   np.uint64(B)).astype(np.int64)
                      == lens) | (lens == 0)
                if not bool(np.all(ok)):
                    raise ValueError("protobuf: frame length does not "
                                     "match cell size (wrong framing?)")
                # empty (NULL) cells have no frame prefix to skip —
                # an ungated advance overshot their zero-length end
                # and tripped the trailing-bytes check
                cur = np.where(lens > 0,
                               starts + unb[clip(starts)], starts)
            out = {}
            for name, ptype, num in fields:
                tagv = 0
                for i, byt in enumerate(_tag_bytes(num,
                                                   _PB_TYPES[ptype])):
                    tagv |= (byt & 0x7F) << (7 * i)
                present = (cur < ends) & (uval[clip(cur)]
                                          == np.uint64(tagv))
                tw = len(_tag_bytes(num, _PB_TYPES[ptype]))
                p = clip(np.where(present, cur + tw, cur))
                if ptype == "bool":
                    vals = buf[p].astype(bool)
                    adv = tw + 1
                    cur = np.where(present, cur + adv, cur)
                elif ptype in ("int32", "int64", "uint32", "uint64",
                               "sint32", "sint64"):
                    u = uval[p]
                    if ptype.startswith("sint"):
                        vals = ((u >> np.uint64(1)).astype(np.int64)
                                ^ -(u & np.uint64(1)).astype(np.int64))
                    else:
                        # UNSIGNED types refuse like the msgpack
                        # decoder instead of two's-complement-wrapping
                        # to negative (round-14 review); for signed
                        # int32/int64 the high-bit varint IS the
                        # legitimate negative encoding
                        if ptype.startswith("uint"):
                            big = present & (
                                u >= np.uint64(1) << np.uint64(63))
                            if bool(big.any()):
                                raise ValueError(
                                    f"protobuf: {name} uint64 value >= "
                                    "2^63 does not fit Spark's Int64")
                        vals = u.astype(np.int64)
                    if ptype in ("int32", "sint32"):
                        vals = vals.astype(np.int32)
                    cur = np.where(present, cur + tw + unb[p], cur)
                elif ptype in ("float", "double"):
                    w = 4 if ptype == "float" else 8
                    block = buf[np.minimum(p[:, None] + np.arange(w),
                                           max(B - 1, 0))]
                    vals = np.ascontiguousarray(block).view(
                        "<f4" if w == 4 else "<f8").ravel()
                    cur = np.where(present, cur + tw + w, cur)
                else:
                    flens = np.where(
                        present,
                        np.minimum(uval[p], np.uint64(B))
                        .astype(np.int64), 0)
                    vstarts = p + unb[p]
                    tot = int(flens.sum())
                    wi = np.arange(tot) - np.repeat(
                        np.cumsum(flens) - flens, flens)
                    payload = buf[clip(np.repeat(vstarts, flens) + wi)]
                    offs = np.concatenate(([0], np.cumsum(flens)))
                    if ptype == "string":
                        arr = pa.LargeStringArray.from_buffers(
                            n, pa.py_buffer(offs.tobytes()),
                            pa.py_buffer(payload.tobytes()))
                        vals = arr.to_pandas().to_numpy(dtype=object)
                    else:
                        arr = pa.Array.from_buffers(
                            pa.large_binary(), n,
                            [None, pa.py_buffer(offs.tobytes()),
                             pa.py_buffer(payload.tobytes())])
                        vals = arr.to_pandas().to_numpy(dtype=object)
                    cur = np.where(present, cur + tw + unb[p] + flens,
                                   cur)
                vals = np.asarray(vals, dtype=object)
                vals[~present] = None
                out[name] = vals
            if B and not bool(np.all(cur == ends)):
                bad = int(np.argmax(cur != ends))
                raise ValueError(
                    f"protobuf: message {bad} has unknown or "
                    "out-of-order fields (canonical ascending order "
                    "required)")
            yield pd.DataFrame(out)

    return df.mapInPandas(dec, schema)
