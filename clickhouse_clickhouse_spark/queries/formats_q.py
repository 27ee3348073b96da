"""FORMAT serialization queries (SURVEY.md §2.1 — the reference's text
I/O formats, upstream ``src/Processors/Formats/Impl/*RowOutputFormat.cpp``
/ ``*RowInputFormat.cpp``).

Each query exercises ``sources/render.py`` distributively: serializers are
pure JVM projections (one row in → one formatted line out), parsers are
``from_json``/``from_csv`` expressions, RowBinary is the Arrow-batched
binary exchange path. Oracles rebuild the exact same lines with DuckDB
string/JSON functions, or (for the round trips) simply select the source
columns — parse(serialize(x)) must equal x.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.sources import render
from clickhouse_clickhouse_spark.tables import load_table


@register("format_jsoneachrow", oracle="""
SELECT to_json(struct_pack(
         n_nationkey := n_nationkey,
         n_name := n_name,
         n_regionkey := n_regionkey))::VARCHAR AS line
FROM nation
""")
def format_jsoneachrow(spark, sf):
    """JSONEachRow output: one JSON object per row, keys in column order,
    no whitespace — byte-identical to the reference's JSONEachRow for
    int/string columns (JSONEachRowRowOutputFormat.cpp)."""
    return render.serialize_lines(load_table(spark, sf, "nation"),
                                  "JSONEachRow")


@register("format_jsoncompact", oracle="""
SELECT to_json([n_nationkey::JSON, to_json(n_name), n_regionkey::JSON])::VARCHAR
       AS line
FROM nation
""")
def format_jsoncompact(spark, sf):
    """JSONCompactEachRow output: positional JSON arrays."""
    return render.serialize_lines(load_table(spark, sf, "nation"),
                                  "JSONCompactEachRow")


@register("format_csv_lines", oracle="""
SELECT n_nationkey || ',"' || replace(n_name, '"', '""') || '",'
       || n_regionkey AS line
FROM nation
""")
def format_csv_lines(spark, sf):
    """CSV output: strings always double-quoted (quote doubling), numerics
    bare — the reference's CSV dialect (CSVRowOutputFormat.cpp)."""
    return render.serialize_lines(load_table(spark, sf, "nation"), "CSV")


@register("format_tsv_lines", oracle="""
SELECT s_suppkey || chr(9) || replace(s_name, chr(92), chr(92) || chr(92))
       || chr(9) || s_nationkey AS line
FROM supplier
""")
def format_tsv_lines(spark, sf):
    """TabSeparated output with backslash escaping, NULL → \\N."""
    s = load_table(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    return render.serialize_lines(s, "TSV")


@register("format_values_lines", oracle="""
SELECT '(' || o_orderkey || ',''' ||
       replace(replace(o_orderpriority, chr(92), chr(92) || chr(92)),
               '''', chr(92) || '''') ||
       ''',''' || strftime(o_orderdate, '%Y-%m-%d') || ''')' AS line
FROM orders
""")
def format_values_lines(spark, sf):
    """Values output: SQL literal tuples (backslash-escaped single-quoted
    strings, dates quoted) — the INSERT-ready exchange format."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.to_date("o_orderdate").alias("o_orderdate"))
    return render.serialize_lines(o, "Values")


@register("format_roundtrip_csv", oracle="""
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 6) AS acctbal
FROM supplier
""")
def format_roundtrip_csv(spark, sf):
    """CSV serialize → parse round trip over all supplier columns
    (including the double) — parse(serialize(x)) = x, both sides
    distributed expressions (CSVRowInputFormat.cpp analog)."""
    s = load_table(spark, sf, "supplier").withColumn(
        "s_acctbal", F.round("s_acctbal", 6))
    lines = render.serialize_lines(s, "CSV")
    back = render.parse_lines(lines, "CSV", s.schema)
    return back.select("s_suppkey", "s_name", "s_nationkey",
                       F.round("s_acctbal", 6).alias("acctbal"))


@register("format_roundtrip_tsv", oracle="""
SELECT o_orderkey, o_orderpriority, o_orderdate
FROM orders WHERE o_orderkey % 7 = 0
""")
def format_roundtrip_tsv(spark, sf):
    """TSV serialize → parse round trip (string unescaping + date cast)."""
    o = (load_table(spark, sf, "orders")
         .filter(F.col("o_orderkey") % 7 == 0)
         .select("o_orderkey", "o_orderpriority", "o_orderdate"))
    lines = render.serialize_lines(o, "TSV")
    return render.parse_lines(lines, "TSV", o.schema)


@register("format_roundtrip_values", oracle="""
SELECT o_orderkey, o_orderpriority, o_orderdate
FROM orders WHERE o_orderkey % 5 = 0
""")
def format_roundtrip_values(spark, sf):
    """Values serialize → parse round trip (quoted-literal parsing)."""
    o = (load_table(spark, sf, "orders")
         .filter(F.col("o_orderkey") % 5 == 0)
         .select("o_orderkey", "o_orderpriority", "o_orderdate"))
    lines = render.serialize_lines(o, "Values")
    return render.parse_lines(lines, "Values", o.schema)


@register("format_rowbinary_roundtrip", oracle="""
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 6) AS acctbal
FROM supplier
""")
def format_rowbinary_roundtrip(spark, sf):
    """RowBinary encode → decode round trip: little-endian numerics,
    LEB128-prefixed strings, Arrow-batched per partition (the reference's
    binary exchange format; RowBinary spec is public)."""
    s = load_table(spark, sf, "supplier").withColumn(
        "s_acctbal", F.round("s_acctbal", 6))
    enc = render.rowbinary_encode(s)
    dec = render.rowbinary_decode(enc, s.schema)
    return dec.select("s_suppkey", "s_name", "s_nationkey",
                      F.round("s_acctbal", 6).alias("acctbal"))


@register("format_markdown_lines", oracle="""
SELECT '| ' || r_regionkey || ' | ' || replace(r_name, '|', chr(92) || '|')
       || ' |' AS line
FROM region
""")
def format_markdown_lines(spark, sf):
    """Markdown table body rows (MarkdownRowOutputFormat.cpp analog)."""
    r = load_table(spark, sf, "region").select("r_regionkey", "r_name")
    return render.serialize_lines(r, "Markdown")


@register("format_regexp_parse", oracle="""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
""")
def format_regexp_parse(spark, sf):
    """Regexp input format (RegexpRowInputFormat.cpp analog): serialize
    each document's metadata to a log-style line, then recover typed
    columns purely with distributed regexp_extract expressions."""
    from pyspark.sql import types as T

    d = load_table(spark, sf, "documents")
    lines = d.select(F.format_string("doc=%s lang=[%s] chars=%s",
                                     F.col("doc_id").cast("string"),
                                     F.col("lang"),
                                     F.col("n_chars").cast("string"))
                     .alias("line"))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    return render.parse_regexp(
        lines, r"^doc=(\d+) lang=\[(\w+)\] chars=(\d+)$", schema)


@register("format_template_lines", oracle="""
SELECT 'nation ' || n_name || ' (' || n_nationkey || ') in region '
       || n_regionkey AS line
FROM nation
""")
def format_template_lines(spark, sf):
    """Template output format (${column} placeholders, everything else
    literal — TemplateBlockOutputFormat.cpp analog)."""
    n = load_table(spark, sf, "nation")
    return render.serialize_template(
        n, "nation ${n_name} (${n_nationkey}) in region ${n_regionkey}")


@register("format_jsonstrings", oracle="""
SELECT '{"n_nationkey":"' || n_nationkey || '","n_name":' ||
       to_json(n_name) || ',"n_regionkey":"' || n_regionkey || '"}'
       AS line
FROM nation
""")
def format_jsonstrings(spark, sf):
    """JSONStringsEachRow: every value rendered as its text form, then
    JSON-quoted (JSONStringsEachRowRowOutputFormat.cpp analog)."""
    return render.serialize_lines(load_table(spark, sf, "nation"),
                                  "JSONStringsEachRow")


@register("format_native_roundtrip", oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_orderdate AS TIMESTAMP) AS odate,
       round(o_totalprice, 6) AS price
FROM orders WHERE o_orderkey % 7 = 0
""")
def format_native_roundtrip(spark, sf):
    """Native columnar block format encode -> decode round trip (round-5:
    closes the Native wire-format gap, [U] src/Formats/NativeWriter.cpp /
    NativeReader.cpp): self-describing blocks, columnar numpy assembly on
    encode, and the pointer-doubling vectorized varint-chain decoder for
    interleaved String columns — no per-value Python either way.
    Nullable(T) null-mask layout exercised via the Spark-nullable parquet
    columns."""
    from clickhouse_clickhouse_spark.sources.native import (
        native_decode,
        native_encode,
    )

    o = (load_table(spark, sf, "orders")
         .filter(F.col("o_orderkey") % 7 == 0)
         .select("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderdate", F.round("o_totalprice", 6)
                 .alias("o_totalprice")))
    dec = native_decode(native_encode(o), o.schema)
    return dec.select("o_orderkey", "o_custkey", "o_orderstatus",
                      F.col("o_orderdate").cast("timestamp").alias("odate"),
                      F.round("o_totalprice", 6).alias("price"))


@register("format_avro_roundtrip", oracle="""
SELECT s_suppkey, s_name, s_nationkey,
       CAST(NULL AS VARCHAR) AS s_comment_null,
       round(s_acctbal, 6) AS acctbal
FROM supplier
""")
def format_avro_roundtrip(spark, sf):
    """Avro record encode -> decode round trip (round-5: from-scratch
    OCF codec un-gates the Avro format, [U]
    src/Processors/Formats/Impl/AvroRowInputFormat.cpp): zigzag-varint
    segment assembly on encode, the pointer-doubling record-chain
    decoder on decode — nullable union layout exercised by the
    all-NULL column."""
    from clickhouse_clickhouse_spark.sources.avro import (
        avro_decode_blocks,
        avro_encode_blocks,
    )

    s = (load_table(spark, sf, "supplier")
         .select("s_suppkey", "s_name", "s_nationkey",
                 F.lit(None).cast("string").alias("s_comment_null"),
                 F.round("s_acctbal", 6).alias("acctbal")))
    return avro_decode_blocks(avro_encode_blocks(s), s.schema)


@register("format_protobuf_roundtrip", oracle="""
SELECT s_suppkey, s_name,
       CAST(NULL AS VARCHAR) AS always_null,
       round(s_acctbal, 6) AS acctbal
FROM supplier
""")
def format_protobuf_roundtrip(spark, sf):
    """Protobuf wire-format encode -> decode round trip (round-5: the
    from-scratch codec un-gates the last jar-blocked format, [U]
    src/Formats/ProtobufSerializer.cpp): length-delimited row framing,
    canonical tag order, proto3 null-omission (the all-NULL column is
    absent on the wire and comes back NULL)."""
    from clickhouse_clickhouse_spark.sources.protobuf import (
        protobuf_decode,
        protobuf_encode,
        spark_schema_to_proto,
    )

    s = (load_table(spark, sf, "supplier")
         .select("s_suppkey", "s_name",
                 F.lit(None).cast("string").alias("always_null"),
                 F.round("s_acctbal", 6).alias("acctbal")))
    proto = spark_schema_to_proto(s.schema)
    dec = protobuf_decode(protobuf_encode(s, proto), proto)
    return dec.select(F.col("s_suppkey").cast("long").alias("s_suppkey"),
                      "s_name", "always_null",
                      F.col("acctbal").cast("double").alias("acctbal"))


@register("format_msgpack_roundtrip", oracle="""
SELECT s_suppkey, s_name, s_nationkey,
       round(s_acctbal, 6) AS acctbal,
       CAST(NULL AS BIGINT) AS always_null
FROM supplier
""")
def format_msgpack_roundtrip(spark, sf):
    """MessagePack encode -> decode round trip (round-6: from-scratch
    vectorized codec per the public msgpack spec, closing the declared
    MsgPack gap — [U]
    src/Processors/Formats/Impl/MsgPackRowInputFormat.cpp): canonical
    signed forms + nil on encode, unsigned external forms accepted on
    decode; segment-assembly encode, masked-gather cursor decode."""
    from clickhouse_clickhouse_spark.sources.msgpack import (
        msgpack_decode,
        msgpack_encode,
    )

    s = (load_table(spark, sf, "supplier")
         .select("s_suppkey", "s_name", "s_nationkey",
                 F.round("s_acctbal", 6).alias("acctbal"),
                 F.lit(None).cast("long").alias("always_null")))
    ddl = ("s_suppkey bigint, s_name string, s_nationkey bigint, "
           "acctbal double, always_null bigint")
    return msgpack_decode(msgpack_encode(s), ddl)


@register("format_uint64_full_range", oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS k,
       CAST(CAST(CAST('9223372036854775808' AS DECIMAL(20,0))
            + CAST(n_nationkey AS DECIMAL(20,0))
              * CAST('368934881474191032' AS DECIMAL(20,0))
            AS DECIMAL(20,0)) AS VARCHAR) AS u64
FROM nation
""")
def format_uint64_full_range(spark, sf):
    """UInt64 full-range opt-in (round-7; SURVEY §1.2's one documented
    type loss, [U] src/DataTypes/DataTypeNumber.cpp):
    ``types_map.parse_ch_type(..., uint64_as_decimal=True)`` maps
    UInt64 to DECIMAL(20,0); values in 2^63..2^64-1 round-trip
    losslessly through BOTH binary formats — RowBinary (little-endian
    u8) and MsgPack (canonical unsigned forms incl. 0xCF), where the
    default LongType path wraps (and now refuses loudly instead).
    The query builds 25 values spanning 2^63..~2^64, pushes them
    through MsgPack encode→decode then RowBinary encode→decode with
    the opt-in schema, and returns the survivors for DuckDB to
    hash-match against exact decimal arithmetic."""
    from clickhouse_clickhouse_spark.sources.msgpack import (
        msgpack_decode,
        msgpack_encode,
    )
    from clickhouse_clickhouse_spark.sources.render import (
        rowbinary_decode,
        rowbinary_encode,
    )
    from clickhouse_clickhouse_spark.types_map import ch_schema_to_struct

    n = load_table(spark, sf, "nation").selectExpr(
        "CAST(n_nationkey AS BIGINT) AS k",
        "CAST(CAST('9223372036854775808' AS DECIMAL(20,0)) "
        "+ CAST(n_nationkey AS DECIMAL(20,0)) "
        "  * CAST('368934881474191032' AS DECIMAL(20,0)) "
        "AS DECIMAL(20,0)) AS u64")
    mp = msgpack_decode(msgpack_encode(n), "k bigint, u64 decimal(20,0)")
    schema = ch_schema_to_struct("k Int64, u64 UInt64",
                                 uint64_as_decimal=True)
    out = rowbinary_decode(rowbinary_encode(mp), schema)
    # Emit the survivors as decimal STRINGS: full-range UInt64 exceeds
    # float64's mantissa, and the driver gate hashes Spark Decimal
    # objects differently from DuckDB's float64 DECIMAL lowering
    # (round-13 finding; shapes.py driver-gate note).
    return out.withColumn("u64", F.col("u64").cast("string"))
