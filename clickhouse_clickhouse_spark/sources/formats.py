"""I/O format surface (SURVEY.md §2.1: the reference's ~70 formats map to
Spark's built-in sources; fixtures are Parquet, the rest are exercised by
round-trip tests).

Supported here: parquet, orc, csv (with header), json (lines), text,
xml (Spark 4 built-in; maps the reference's XML output format — rows
under a fixed rowTag), native (the reference's columnar block format —
``sources/native.py``, schema required on read), avro (from-scratch OCF
codec, ``sources/avro.py`` — no jar needed). Delta/Iceberg need jars absent from this
environment — they raise a clear error instead of failing obscurely
(import-try gating per brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NATIVE = {"parquet", "orc", "csv", "json", "text", "xml"}
_NEEDS_JARS = {"delta", "iceberg", "hudi"}


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite",
              compression: str | None = None) -> None:
    """``compression``: per-format codec (parquet: snappy/zstd/gzip/none;
    orc: zlib/snappy/zstd; csv/json/text: gzip/bzip2/none) — the
    reference's column-codec setting (CODEC(ZSTD)) at file granularity."""
    if fmt in _NEEDS_JARS:
        raise NotImplementedError(
            f"format {fmt!r} requires connector jars not present in this "
            "environment; gate behind a deployment that ships them")
    if fmt in ("native", "arrow", "msgpack") and compression:
        # loud, not silently dropped (round-14 review)
        raise ValueError(
            f"format {fmt!r} does not support a compression codec here; "
            "avro supports deflate, parquet/orc/csv/json their own")
    if fmt in ("native", "avro", "arrow", "msgpack"):
        # the custom writers add uuid-named part files into an existing
        # directory — honor the mode the caller asked for instead of
        # silently appending under 'overwrite' (round-14 review:
        # re-running an INTO OUTFILE doubled every row on read)
        import os
        import shutil
        if os.path.isdir(path):
            if mode == "overwrite":
                shutil.rmtree(path)
            elif mode == "error":
                raise FileExistsError(
                    f"write_any: {path} exists and mode='error'")
            elif mode != "append":
                raise ValueError(
                    f"write_any: unsupported mode {mode!r} for custom "
                    f"format {fmt!r} (overwrite/append/error)")
    if fmt == "native":
        from clickhouse_clickhouse_spark.sources.native import write_native
        write_native(df, path).collect()
        return
    if fmt == "avro":
        from clickhouse_clickhouse_spark.sources.avro import write_avro
        write_avro(df, path, codec=compression or "null").collect()
        return
    if fmt == "arrow":
        write_arrow(df, path).collect()
        return
    if fmt == "msgpack":
        from clickhouse_clickhouse_spark.sources.msgpack import (
            write_msgpack,
        )
        write_msgpack(df, path).collect()
        return
    if fmt not in _NATIVE:
        raise ValueError(f"unknown format {fmt!r}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    if fmt == "xml":
        w = w.option("rowTag", "row")
    if compression:
        w = w.option("compression", compression)
    w.format(fmt).save(path)


def read_any(spark: SparkSession, path: str, fmt: str,
             schema: T.StructType | None = None) -> DataFrame:
    if fmt in _NEEDS_JARS:
        raise NotImplementedError(f"format {fmt!r} requires connector jars")
    if fmt == "native":
        if schema is None:
            raise ValueError("format 'native' requires an explicit schema "
                             "(self-describing blocks are validated "
                             "against it)")
        from clickhouse_clickhouse_spark.sources.native import read_native
        return read_native(spark, path, schema)
    if fmt == "avro":
        from clickhouse_clickhouse_spark.sources.avro import read_avro
        return read_avro(spark, path, schema)
    if fmt == "arrow":
        return read_arrow(spark, path, schema)
    if fmt == "msgpack":
        if schema is None:
            raise ValueError("format 'msgpack' requires an explicit "
                             "schema (bare value streams carry no "
                             "self-description)")
        from clickhouse_clickhouse_spark.sources.msgpack import (
            read_msgpack,
        )
        return read_msgpack(spark, path, schema)
    if fmt not in _NATIVE:
        raise ValueError(f"unknown format {fmt!r}")
    r = spark.read
    if fmt == "csv":
        # header=true ALWAYS (write_any writes one): with an explicit
        # schema the old code skipped the option and parsed the header
        # row as data (round-14 review)
        r = r.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "csv":
        r = r.option("inferSchema", "true")
    if fmt == "xml":
        r = r.option("rowTag", "row")
    return r.format(fmt).load(path)


def write_arrow(df: DataFrame, path: str) -> DataFrame:
    """The reference's ``Arrow`` format (upstream
    src/Processors/Formats/Impl/ArrowBlockOutputFormat.cpp): one Arrow
    IPC file per partition under ``path`` — mapInPandas hands us Arrow
    batches already, so serialization is pyarrow-native (zero custom
    code). Returns the (file, rows) manifest."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def dump(batches):
        import pandas as pd
        import pyarrow as pa
        tables = [pa.Table.from_pandas(pdf, preserve_index=False)
                  for pdf in batches if len(pdf)]
        if not tables:
            return
        table = pa.concat_tables(tables)
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        with pa.ipc.new_file(fname, table.schema) as w:
            w.write_table(table)
        yield pd.DataFrame({"file": [fname], "rows": [table.num_rows]})

    return df.mapInPandas(dump, "file string, rows long")


def read_arrow(spark: SparkSession, path: str,
               schema: T.StructType | None = None) -> DataFrame:
    """Arrow IPC source: files parallelize via binaryFile; record
    batches stream out as pandas frames. Schema defaults to the files'
    own (read driver-side from one footer)."""
    files = spark.read.format("binaryFile").load(f"{path}/*.arrow")
    if schema is None:
        import io

        import pyarrow as pa
        one = files.select("content").limit(1).collect()[0].content
        with pa.ipc.open_file(io.BytesIO(bytes(one))) as r:
            from pyspark.sql.pandas.types import from_arrow_schema
            schema = from_arrow_schema(r.schema)

    def parse(batches):
        import io

        import pyarrow as pa
        for pdf in batches:
            for blob in pdf["content"]:
                with pa.ipc.open_file(io.BytesIO(bytes(blob))) as r:
                    for i in range(r.num_record_batches):
                        yield r.get_batch(i).to_pandas()

    return files.select("content").mapInPandas(parse, schema)
