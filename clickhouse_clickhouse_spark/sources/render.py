"""Row-level FORMAT serialization — the reference's text output/input
formats as distributed column expressions.

The reference renders every result through a pluggable row format
(upstream ``src/Processors/Formats/Impl/*RowOutputFormat.cpp`` — ~70
formats; SURVEY.md §2.1). The widely used *line-oriented* ones map
cleanly onto Spark: one input row → one output string row, so the whole
serialization is a JVM-side projection (no driver involvement, scales
with the data):

===================  ==========================================
JSONEachRow          ``{"col":value,...}`` per line (upstream
                     JSONEachRowRowOutputFormat.cpp)
JSONCompactEachRow   ``[v1,v2,...]`` per line
CSV / CSVWithNames   comma-separated, strings always double-quoted,
                     NULL → ``\\N`` (CSVRowOutputFormat.cpp)
TSV / TSVWithNames / TabSeparated: ``\\t``-separated with backslash
TSVWithNamesAndTypes escapes, NULL → ``\\N``
Values               SQL literal tuples ``(1,'x',NULL)``
Markdown             ``| v | v |`` table rows
RowBinary            little-endian fixed-width numerics + LEB128
                     length-prefixed strings (RowBinary spec) —
                     Arrow-batched mapInPandas (binary exchange
                     format, the documented slow path)
===================  ==========================================

Presentation formats (Pretty*, Vertical) are rendered client-side by the
reference's CLI; ``render_pretty``/``render_vertical`` mirror that: the
*result* is computed distributed, the final box-drawing happens on the
driver over an explicitly limited row count (same contract as
``DataFrame.show``).

Header lines (``WithNames``/``WithNamesAndTypes``/Markdown) are
constants derived from the schema — emitted separately by
``header_lines`` so the data path stays one-row-in/one-row-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINE_FORMATS = (
    "JSONEachRow", "JSONCompactEachRow", "JSONStringsEachRow",
    "CSV", "CSVWithNames",
    "TSV", "TSVWithNames", "TSVWithNamesAndTypes", "TabSeparated",
    "TSVRaw", "Values", "Markdown",
)

# Spark type -> reference type name (for TSVWithNamesAndTypes headers).
_CH_TYPE = {
    "tinyint": "Int8", "smallint": "Int16", "int": "Int32",
    "bigint": "Int64", "float": "Float32", "double": "Float64",
    "string": "String", "date": "Date", "timestamp": "DateTime",
    "timestamp_ntz": "DateTime", "boolean": "Bool",
}


def _raw(c: Column, dt: T.DataType) -> Column:
    """Canonical text for one value, before per-format escaping/quoting.
    Dates/times use the reference's fixed renderings; numerics/bools use
    Spark's cast (identical to DuckDB's for ints/bools, which is why the
    oracle-compared formats stick to int/string/date columns)."""
    if isinstance(dt, T.DateType):
        return F.date_format(c, "yyyy-MM-dd")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def _esc(c: Column, pairs: list[tuple[str, str]]) -> Column:
    for a, b in pairs:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def _json_value(c: Column, name: str = "x") -> Column:
    """JSON rendering of a single value of any type: serialize a one-field
    struct and strip the fixed ``{"x":`` prefix / ``}`` suffix — reuses
    Spark's JSON writer (escaping, nested types) without a UDF."""
    j = F.to_json(F.struct(c.alias(name)), {"ignoreNullFields": "false"})
    return j.substr(F.lit(6), F.length(j) - 6)


def _field(df: DataFrame, name: str) -> tuple[Column, T.DataType]:
    return F.col(name), df.schema[name].dataType


def _rendered(df: DataFrame, fmt: str) -> list[Column]:
    """Per-column string renderings (nullable → format's NULL literal)."""
    cols = []
    for name in df.columns:
        c, dt = _field(df, name)
        is_str = isinstance(dt, T.StringType)
        if fmt in ("JSONEachRow",):
            raise ValueError("JSONEachRow renders whole-row, not per-column")
        if fmt == "JSONCompactEachRow":
            cols.append(_json_value(c))
            continue
        if fmt == "JSONStringsEachRow":
            # every value rendered as its text form, then JSON-quoted
            cols.append(_json_value(_raw(c, dt)))
            continue
        raw = _raw(c, dt)
        if fmt in ("CSV", "CSVWithNames"):
            if is_str or isinstance(dt, (T.DateType, T.TimestampType,
                                         T.TimestampNTZType)):
                # reference CSV always double-quotes strings/dates
                q = F.concat(F.lit('"'), _esc(raw, [('"', '""')]), F.lit('"'))
            else:
                q = raw
            cols.append(F.coalesce(q, F.lit("\\N")))
        elif fmt in ("TSV", "TSVWithNames", "TSVWithNamesAndTypes",
                     "TabSeparated"):
            e = _esc(raw, [("\\", "\\\\"), ("\t", "\\t"),
                           ("\n", "\\n"), ("\r", "\\r")]) if is_str else raw
            cols.append(F.coalesce(e, F.lit("\\N")))
        elif fmt == "TSVRaw":
            # no escaping at all (the format's documented property:
            # caller guarantees no tabs/newlines in the data)
            cols.append(F.coalesce(raw, F.lit("\\N")))
        elif fmt == "Values":
            if is_str or isinstance(dt, (T.DateType, T.TimestampType,
                                         T.TimestampNTZType)):
                q = F.concat(F.lit("'"),
                             _esc(raw, [("\\", "\\\\"), ("'", "\\'"),
                                        ("\n", "\\n"), ("\r", "\\r"),
                                        ("\t", "\\t")]),
                             F.lit("'"))
            else:
                q = raw
            cols.append(F.coalesce(q, F.lit("NULL")))
        elif fmt == "Markdown":
            e = _esc(raw, [("|", "\\|")]) if is_str else raw
            cols.append(F.coalesce(e, F.lit("\\N")))
        else:
            raise ValueError(f"unknown line format {fmt!r}")
    return cols


def serialize_lines(df: DataFrame, fmt: str) -> DataFrame:
    """Serialize every row of ``df`` to one formatted text line (column
    ``line``). Pure projection — runs inside whole-stage codegen, no
    shuffle, no driver data. Header lines (WithNames variants) are
    schema constants: see ``header_lines``."""
    if fmt == "JSONEachRow":
        line = F.to_json(F.struct(*[F.col(c) for c in df.columns]),
                         {"ignoreNullFields": "false"})
    elif fmt == "JSONStringsEachRow":
        pieces = []
        for name in df.columns:
            c, dt = _field(df, name)
            key = F.lit('"' + name.replace('"', '\\"') + '":')
            pieces.append(F.concat(key, _json_value(_raw(c, dt))))
        line = F.concat(F.lit("{"), F.concat_ws(",", *pieces), F.lit("}"))
    elif fmt == "JSONCompactEachRow":
        line = F.concat(F.lit("["),
                        F.concat_ws(",", *_rendered(df, fmt)), F.lit("]"))
    elif fmt in ("CSV", "CSVWithNames"):
        line = F.concat_ws(",", *_rendered(df, fmt))
    elif fmt in ("TSV", "TSVWithNames", "TSVWithNamesAndTypes",
                 "TabSeparated", "TSVRaw"):
        line = F.concat_ws("\t", *_rendered(df, fmt))
    elif fmt == "Values":
        line = F.concat(F.lit("("),
                        F.concat_ws(",", *_rendered(df, fmt)), F.lit(")"))
    elif fmt == "Markdown":
        line = F.concat(F.lit("| "),
                        F.concat_ws(" | ", *_rendered(df, fmt)),
                        F.lit(" |"))
    else:
        raise ValueError(f"unknown line format {fmt!r}")
    return df.select(line.alias("line"))


def header_lines(df: DataFrame, fmt: str) -> list[str]:
    """Constant header lines for the format (empty for headerless ones)."""
    names = df.columns
    if fmt in ("CSVWithNames",):
        return [",".join(f'"{n}"' for n in names)]
    if fmt in ("TSVWithNames",):
        return ["\t".join(names)]
    if fmt == "TSVWithNamesAndTypes":
        types = [_CH_TYPE.get(dict(df.dtypes)[n], "String") for n in names]
        return ["\t".join(names), "\t".join(types)]
    if fmt == "Markdown":
        return ["| " + " | ".join(names) + " |",
                "|" + "|".join("---" for _ in names) + "|"]
    return []


# reference binary format names -> write_any keys (INTO OUTFILE FORMAT)
_BINARY_OUTFILE = {"Parquet": "parquet", "ORC": "orc", "Native": "native",
                   "Avro": "avro", "Arrow": "arrow", "MsgPack": "msgpack"}


def into_outfile(df: DataFrame, path: str, fmt: str,
                 mode: str = "overwrite") -> None:
    """``SELECT ... INTO OUTFILE 'path' FORMAT fmt`` — writes the
    serialized lines as a text directory (distributed; at cluster scale
    each task writes its own part file, same as the reference's parallel
    formatting). Header-variant headers go to a ``_header`` sidecar since
    part files have no global first-row. Binary formats (Parquet / ORC /
    Native / Avro / Arrow / MsgPack) dispatch to the format layer."""
    if fmt in _BINARY_OUTFILE:
        from clickhouse_clickhouse_spark.sources.formats import write_any

        write_any(df, path, _BINARY_OUTFILE[fmt], mode=mode)
        return
    lines = serialize_lines(df, fmt)
    lines.write.mode(mode).text(path)
    hdr = header_lines(df, fmt)
    if hdr:
        import os
        with open(os.path.join(path, "_header"), "w") as f:
            f.write("\n".join(hdr) + "\n")


# ---------------------------------------------------------------- parsing

def parse_lines(lines: DataFrame, fmt: str, schema: T.StructType,
                col: str = "line") -> DataFrame:
    """Parse formatted text lines back into typed rows (the reference's
    *RowInputFormat side). Distributed: ``from_json``/``from_csv`` are
    JVM expressions. Supported: JSONEachRow, CSV, TSV/TabSeparated,
    Values."""
    c = F.col(col)
    if fmt == "JSONEachRow":
        parsed = lines.select(F.from_json(c, schema).alias("r"))
        return parsed.select("r.*")
    if fmt in ("CSV", "CSVWithNames"):
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in schema.fields)
        parsed = lines.select(
            F.from_csv(c, ddl, {"nullValue": "\\N", "escape": '"'})
            .alias("r"))
        return parsed.select("r.*")
    if fmt == "TSVRaw":
        fields = F.split(c, "\t", -1)
        out = []
        for i, f in enumerate(schema.fields):
            v = F.element_at(fields, i + 1)
            v = F.when(v == "\\N", F.lit(None)).otherwise(v)
            out.append(v.cast(f.dataType).alias(f.name))
        return lines.select(*out)
    if fmt in ("TSV", "TabSeparated", "TSVWithNames"):
        # exact split, NOT from_csv: TSV has no quoting (tabs in data are
        # escaped), and the CSV reader cannot distinguish an unquoted
        # empty field from NULL — split preserves "" vs \N exactly
        fields = F.split(c, "\t", -1)
        out = []
        for i, f in enumerate(schema.fields):
            v = F.element_at(fields, i + 1)
            v = F.when(v == "\\N", F.lit(None)).otherwise(v)
            if isinstance(f.dataType, T.StringType):
                # order-safe unescape: split on doubled backslashes so a
                # literal "\" next to an "n" can't be misread as "\n",
                # unescape \n/\r/\t inside each segment, rejoin with "\"
                segs = F.split(v, "\\\\\\\\", -1)
                un = F.transform(
                    segs, lambda s: _esc(s, [("\\n", "\n"), ("\\r", "\r"),
                                             ("\\t", "\t")]))
                v = F.when(v.isNull(), F.lit(None)) \
                     .otherwise(F.array_join(un, "\\"))
            out.append(v.cast(f.dataType).alias(f.name))
        return lines.select(*out)
    if fmt == "Values":
        # order-safe unescape around the quoted-field splitter: serialized
        # lines contain no raw \n/\r/\t (all escaped), so CR can serve as
        # a backslash sentinel. 1) collapse doubled backslashes to the
        # sentinel; 2) restore \n/\t (unambiguous now); 3) let the CSV
        # reader split quoted fields and eat \'; 4) per string field,
        # restore \r inside sentinel-delimited segments, then the
        # sentinel back to a literal backslash.
        inner = F.regexp_replace(c, r"^\(|\)$", "")
        inner = _esc(inner, [("\\\\", "\r"), ("\\n", "\n"),
                             ("\\t", "\t")])
        ddl = ", ".join(f"{f.name} string" for f in schema.fields)
        parsed = lines.select(
            F.from_csv(inner, ddl,
                       {"quote": "'", "escape": "\\", "nullValue": "NULL"})
            .alias("r")).select("r.*")
        out = []
        for f in schema.fields:
            v = F.col(f.name)
            if isinstance(f.dataType, T.StringType):
                segs = F.split(v, "\r", -1)
                un = F.transform(segs,
                                 lambda sgt: _esc(sgt, [("\\r", "\r")]))
                v = F.when(v.isNull(), F.lit(None)) \
                     .otherwise(F.array_join(un, "\\"))
            out.append(v.cast(f.dataType).alias(f.name))
        return parsed.select(*out)
    raise ValueError(f"unsupported input format {fmt!r}")


def parse_regexp(lines: DataFrame, pattern: str, schema,
                 col: str = "line") -> DataFrame:
    """The reference's ``Regexp`` input format: one regex with capture
    groups per line; group i (1-based) binds to schema field i. Rows not
    matching yield NULLs (the reference's skip-unmatched mode is a
    ``dropna`` away). Distributed ``regexp_extract`` expressions."""
    c = F.col(col)
    out = []
    for i, f in enumerate(schema.fields, start=1):
        v = F.regexp_extract(c, pattern, i)
        v = F.when(v == "", F.lit(None)).otherwise(v)
        out.append(v.cast(f.dataType).alias(f.name))
    return lines.select(*out)


def parse_line_as_string(lines: DataFrame, col: str = "line",
                         out: str = "line") -> DataFrame:
    """``LineAsString``: each input line is one row with a single string
    column — the identity parse (useful as the front of a Regexp/JSON
    post-parse chain)."""
    return lines.select(F.col(col).alias(out))


def serialize_template(df: DataFrame, template: str) -> DataFrame:
    """The reference's ``Template``/``CustomSeparated`` output family:
    ``${column}`` placeholders substituted per row, everything else
    literal. Pure format_string projection."""
    import re as _re

    parts = _re.split(r"\$\{(\w+)\}", template)
    cols, fmt = [], ""
    for i, p in enumerate(parts):
        if i % 2 == 0:
            fmt += p.replace("%", "%%")
        else:
            if p not in df.columns:
                raise KeyError(f"template references unknown column {p!r}")
            fmt += "%s"
            cols.append(F.coalesce(_raw(F.col(p), df.schema[p].dataType),
                                   F.lit("\\N")))
    return df.select(F.format_string(fmt, *cols).alias("line"))


# ------------------------------------------------------------- RowBinary

_FIXED = {
    T.IntegerType: ("<i", 4), T.LongType: ("<q", 8),
    T.ShortType: ("<h", 2), T.ByteType: ("<b", 1),
    T.FloatType: ("<f", 4), T.DoubleType: ("<d", 8),
}


def rowbinary_encode(df: DataFrame) -> DataFrame:
    """Encode rows to the reference's RowBinary wire format (one binary
    cell per row, column ``bin``): little-endian fixed-width numerics,
    LEB128-length-prefixed UTF-8 strings, Date as UInt16 days, DateTime
    as UInt32 epoch seconds. Arrow-batched ``mapInPandas`` — binary
    exchange is the documented Python path; per-partition, nothing on the
    driver. NULLs are not representable in plain RowBinary (the reference
    requires Nullable columns be wrapped); callers must pre-coalesce."""
    import sys

    # executor workers under an external driver session don't have the
    # repo on sys.path — ship this module by value in the closure
    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    for f in df.schema.fields:
        if isinstance(f.dataType, T.DecimalType) and \
                (f.dataType.precision, f.dataType.scale) != (20, 0):
            raise TypeError("RowBinary: decimal columns must be "
                            "DECIMAL(20,0) (the UInt64 opt-in)")
    fields = [(f.name, type(f.dataType)) for f in df.schema.fields]
    all_fixed = all(ft in _FIXED for _, ft in fields)

    def encode(batches):
        import numpy as np
        import pandas as pd
        if all_fixed:
            # vectorized fast path: one little-endian record array per
            # batch, sliced into per-row cells (no per-field struct.pack)
            dtype = np.dtype([(name, _FIXED[ft][0]) for name, ft in fields])
            for pdf in batches:
                arr = np.empty(len(pdf), dtype=dtype)
                for name, _ in fields:
                    arr[name] = pdf[name].to_numpy()
                buf = arr.tobytes()
                w = dtype.itemsize
                yield pd.DataFrame(
                    {"bin": [buf[i * w:(i + 1) * w]
                             for i in range(len(pdf))]})
            return
        # variable-width path, vectorized (round-5: was a per-row Python
        # pack loop, 5.2x wall at 10x rows in SCALE.md). Each column
        # becomes one or two SEGMENTS — (contiguous uint8 chunk, per-row
        # byte lengths); strings contribute a LEB128-prefix segment and a
        # payload segment cut from the Arrow values buffer. Row cells are
        # then assembled with one O(total-bytes) numpy gather/scatter per
        # segment — no per-row Python.
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            segments = []  # (chunk uint8[], lengths int64[n])
            for name, ftype in fields:
                if ftype in _FIXED:
                    fmt_s, width = _FIXED[ftype]
                    vals = pdf[name].to_numpy().astype(fmt_s)
                    segments.append((vals.view(np.uint8),
                                     np.full(n, width, dtype=np.int64)))
                elif ftype is T.StringType:
                    import pyarrow as pa
                    a = pa.array(pdf[name].astype(str),
                                 type=pa.large_utf8())
                    offs = np.frombuffer(a.buffers()[1], dtype=np.int64)
                    payload = np.frombuffer(
                        a.buffers()[2] or b"", dtype=np.uint8
                    )[:offs[-1]].copy()
                    lens = np.diff(offs)
                    # one LEB128 writer repo-wide (round 14 — this was
                    # a byte-for-byte copy of native._leb128_block)
                    from clickhouse_clickhouse_spark.sources.native \
                        import _leb128_block
                    prefix, nb = _leb128_block(lens)
                    segments.append((prefix, nb))
                    segments.append((payload, lens))
                elif ftype is T.DecimalType:
                    # UInt64 opt-in (DECIMAL(20,0)): little-endian u8,
                    # full 0..2^64-1 range. Decimal objects arrive as
                    # python objects in pandas — the int() walk is the
                    # one per-row step on this OPT-IN path (the default
                    # LongType column stays fully vectorized).
                    u = np.fromiter((int(x) for x in pdf[name]),
                                    dtype=np.uint64, count=n)
                    segments.append((u.astype("<u8").view(np.uint8),
                                     np.full(n, 8, dtype=np.int64)))
                elif ftype is T.DateType:
                    days = (pd.to_datetime(pdf[name])
                            .to_numpy().astype("datetime64[D]")
                            .astype("int64"))
                    segments.append((days.astype("<u2").view(np.uint8),
                                     np.full(n, 2, dtype=np.int64)))
                elif ftype in (T.TimestampType, T.TimestampNTZType):
                    secs = (pd.to_datetime(pdf[name])
                            .to_numpy().astype("datetime64[s]")
                            .astype("int64"))
                    segments.append((secs.astype("<u4").view(np.uint8),
                                     np.full(n, 4, dtype=np.int64)))
                else:
                    raise TypeError(f"RowBinary: unsupported {ftype}")
            seg_lens = np.stack([l for _, l in segments], axis=1)
            row_len = seg_lens.sum(axis=1)
            row_start = np.concatenate(([0], np.cumsum(row_len)))
            within_row = np.cumsum(seg_lens, axis=1) - seg_lens
            out = np.empty(int(row_start[-1]), dtype=np.uint8)
            for j, (chunk, L) in enumerate(segments):
                tot = int(L.sum())
                if tot == 0:
                    continue
                src_start = np.concatenate(([0], np.cumsum(L)))[:-1]
                tgt_start = row_start[:-1] + within_row[:, j]
                within = np.arange(tot) - np.repeat(np.cumsum(L) - L, L)
                out[np.repeat(tgt_start, L) + within] = \
                    chunk[np.repeat(src_start, L) + within]
            # row cells come back as an Arrow LargeBinary column built
            # straight from (offsets, values) — no per-row slicing
            import pyarrow as pa
            arr = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(row_start.tobytes()),
                 pa.py_buffer(out.tobytes())])
            yield pd.DataFrame({"bin": arr.to_pandas()})

    return df.mapInPandas(encode, "bin binary")


def rowbinary_decode(df: DataFrame, schema: T.StructType,
                     col: str = "bin") -> DataFrame:
    """Inverse of ``rowbinary_encode`` given the target schema."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    for f in schema.fields:
        if isinstance(f.dataType, T.DecimalType) and \
                (f.dataType.precision, f.dataType.scale) != (20, 0):
            raise TypeError("RowBinary: decimal columns must be "
                            "DECIMAL(20,0) (the UInt64 opt-in)")
    fields = [(f.name, type(f.dataType)) for f in schema.fields]
    all_fixed = all(ft in _FIXED for _, ft in fields)

    def decode(batches):
        import numpy as np
        import pandas as pd
        if all_fixed:
            dtype = np.dtype([(name, _FIXED[ft][0]) for name, ft in fields])
            for pdf in batches:
                buf = b"".join(bytes(b) for b in pdf[col])
                arr = np.frombuffer(buf, dtype=dtype)
                yield pd.DataFrame({name: arr[name]
                                    for name, _ in fields})
            return
        # variable-width path, vectorized (round-5, mirror of the encode
        # rewrite): all cells of a batch concatenate into one uint8
        # buffer; a per-row CURSOR array advances column by column.
        # Fixed-width columns gather (n, w) byte blocks; strings parse
        # their LEB128 prefixes in ≤5 masked passes, then one gather
        # builds an Arrow LargeString column straight from offsets —
        # no per-row Python anywhere.
        def _gather_fixed(buf, pos, width, np):
            block = buf[pos[:, None] + np.arange(width)]
            return np.ascontiguousarray(block)

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lens = np.fromiter((len(c) for c in pdf[col]),
                               dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(pdf[col]), dtype=np.uint8)
            pos = np.concatenate(([0], np.cumsum(lens)))[:-1]
            out = {}
            for name, ftype in fields:
                if ftype in _FIXED:
                    fmt_s, width = _FIXED[ftype]
                    block = _gather_fixed(buf, pos, width, np)
                    out[name] = block.view(fmt_s).ravel()
                    pos = pos + width
                elif ftype is T.StringType:
                    import pyarrow as pa
                    # masked LEB128 parse: pass k reads byte k of every
                    # still-continuing row's prefix (≤5 passes)
                    ln = np.zeros(n, dtype=np.int64)
                    nb = np.zeros(n, dtype=np.int64)
                    active = np.arange(n)
                    k = 0
                    while active.size:
                        b = buf[pos[active] + k].astype(np.int64)
                        ln[active] |= (b & 0x7F) << (7 * k)
                        done = (b & 0x80) == 0
                        nb[active[done]] = k + 1
                        active = active[~done]
                        k += 1
                    pos = pos + nb
                    tot = int(ln.sum())
                    within = np.arange(tot) - np.repeat(
                        np.cumsum(ln) - ln, ln)
                    payload = buf[np.repeat(pos, ln) + within]
                    offs = np.concatenate(([0], np.cumsum(ln)))
                    arr = pa.LargeStringArray.from_buffers(
                        n, pa.py_buffer(offs.tobytes()),
                        pa.py_buffer(payload.tobytes()))
                    out[name] = arr.to_pandas()
                    pos = pos + ln
                elif ftype is T.DecimalType:
                    import decimal
                    block = _gather_fixed(buf, pos, 8, np)
                    u = block.view("<u8").ravel()
                    out[name] = pd.Series(
                        [decimal.Decimal(int(x)) for x in u],
                        dtype=object)
                    pos = pos + 8
                elif ftype is T.DateType:
                    block = _gather_fixed(buf, pos, 2, np)
                    days = block.view("<u2").ravel().astype("int64")
                    out[name] = pd.Series(
                        pd.to_datetime(days, unit="D")).dt.date
                    pos = pos + 2
                elif ftype in (T.TimestampType, T.TimestampNTZType):
                    block = _gather_fixed(buf, pos, 4, np)
                    secs = block.view("<u4").ravel().astype("int64")
                    out[name] = pd.Series(pd.to_datetime(secs, unit="s"))
                    pos = pos + 4
                else:
                    raise TypeError(f"RowBinary: unsupported {ftype}")
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema)


# --------------------------------------------------- presentation formats

def render_vertical(df: DataFrame, limit: int = 20) -> str:
    """The reference CLI's ``Vertical`` display: one ``col: value`` block
    per row. Rendering is client-side in the reference too — the result
    set is computed distributed, only ``limit`` rows reach the driver."""
    rows = df.limit(limit).collect()
    width = max((len(c) for c in df.columns), default=0)
    blocks = []
    null_lit = "\\N"
    for i, row in enumerate(rows, 1):
        head = f"Row {i}:\n" + "─" * 10
        body = "\n".join(
            f"{c.rjust(width)}: {null_lit if row[c] is None else row[c]}"
            for c in df.columns)
        blocks.append(head + "\n" + body)
    return "\n\n".join(blocks)


def render_pretty(df: DataFrame, limit: int = 20) -> str:
    """``PrettyCompact``-style box table (driver-side assembly over a
    limited result, as in the reference client)."""
    rows = df.limit(limit).collect()
    cells = [[("\\N" if row[c] is None else str(row[c])) for c in df.columns]
             for row in rows]
    widths = [max([len(c)] + [len(r[i]) for r in cells])
              for i, c in enumerate(df.columns)]
    top = "┌" + "┬".join("─" * (w + 2) for w in widths) + "┐"
    hdr = "│" + "│".join(f" {c.ljust(w)} "
                                   for c, w in zip(df.columns, widths)) + "│"
    sep = "├" + "┼".join("─" * (w + 2) for w in widths) + "┤"
    bot = "└" + "┴".join("─" * (w + 2) for w in widths) + "┘"
    body = ["│" + "│".join(f" {v.ljust(w)} "
                                     for v, w in zip(r, widths)) + "│"
            for r in cells]
    return "\n".join([top, hdr, sep, *body, bot])


def render_json_envelope(df: DataFrame, limit: int = 1000,
                         compact: bool = False) -> str:
    """The reference's ``JSON`` / ``JSONCompact`` whole-result envelope:
    ``{"meta": [...], "data": [...], "rows": N}``. Assembled client-side
    over an explicitly limited result (like Pretty/Vertical); the
    per-row serialization is the distributed JSONEachRow projection."""
    fmt = "JSONCompactEachRow" if compact else "JSONEachRow"
    rows = [r["line"] for r in
            serialize_lines(df.limit(limit), fmt).collect()]
    meta = ",".join(
        '{"name":"%s","type":"%s"}' % (n, _CH_TYPE.get(t, "String"))
        for n, t in df.dtypes)
    body = ",\n".join(rows)
    return ('{\n"meta":\n[\n' + meta + '\n],\n"data":\n[\n' + body
            + '\n],\n"rows": ' + str(len(rows)) + '\n}')


def write_npy(df: DataFrame, vec_col: str, path: str) -> DataFrame:
    """The reference's ``Npy`` output format for an array column: each
    partition writes one ``.npy`` part file (float32 matrix) under
    ``path`` and the call returns the manifest (file, rows) — the
    embedding-interchange shape a training job mmaps. Files land on the
    filesystem visible to executors (shared FS on a cluster, local dir
    here) — same contract as any Spark file sink."""
    import os
    import sys
    import uuid

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    os.makedirs(path, exist_ok=True)

    def dump(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float32)
                              for v in pdf[vec_col]])
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.npy")
            np.save(fname, mat)
            yield pd.DataFrame({"file": [fname], "rows": [len(pdf)]})

    return df.select(vec_col).mapInPandas(dump, "file string, rows long")


def read_npy(spark: SparkSession, path: str,
             vec_col: str = "embedding") -> DataFrame:
    """Inverse of ``write_npy``: every ``.npy`` part file parses to rows
    of ``array<float>`` — distributed via the binaryFile source (each
    file is one Arrow batch, parsed executor-side)."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    files = spark.read.format("binaryFile").load(f"{path}/*.npy")

    def parse(batches):
        import io

        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                mat = np.load(io.BytesIO(bytes(blob)))
                out.extend(row.astype(np.float32).tolist() for row in mat)
            yield pd.DataFrame({vec_col: out})

    return files.select("content").mapInPandas(
        parse, f"{vec_col} array<float>")
