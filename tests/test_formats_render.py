"""FORMAT serialization layer (sources/render.py) — escaping, NULLs,
headers, OUTFILE, RowBinary, presentation rendering."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.sources import render


@pytest.fixture(scope="module")
def nasty(spark):
    """Rows exercising every escape target + NULLs."""
    return spark.createDataFrame(
        [
            Row(k=1, s='plain', d=datetime.date(2024, 1, 2)),
            Row(k=2, s='tab\there', d=None),
            Row(k=3, s='new\nline', d=datetime.date(2024, 3, 4)),
            Row(k=4, s='quote"dq\'sq', d=None),
            Row(k=5, s='back\\slash', d=None),
            Row(k=6, s=None, d=datetime.date(2024, 5, 6)),
            Row(k=7, s='pipe|bar,comma', d=None),
        ]
    )


def _lines(df, fmt):
    return [r["line"] for r in
            render.serialize_lines(df.orderBy("k"), fmt).collect()]


def test_tsv_escapes_and_null(nasty):
    lines = {ln.split("\t")[0]: ln for ln in _lines(nasty, "TSV")}
    assert lines["2"] == "2\ttab\\there\t\\N"
    assert lines["3"] == "3\tnew\\nline\t2024-03-04"
    assert lines["5"] == "5\tback\\\\slash\t\\N"
    assert lines["6"] == "6\t\\N\t2024-05-06"


def test_csv_quoting_and_null(nasty):
    lines = {ln.split(",")[0]: ln for ln in _lines(nasty, "CSV")}
    assert lines["4"] == '4,"quote""dq\'sq",\\N'
    assert lines["7"] == '7,"pipe|bar,comma",\\N'


def test_values_escaping(nasty):
    lines = {ln[1:].split(",")[0]: ln for ln in _lines(nasty, "Values")}
    assert lines["4"] == "(4,'quote\"dq\\'sq',NULL)"
    assert lines["5"] == "(5,'back\\\\slash',NULL)"
    assert lines["6"] == "(6,NULL,'2024-05-06')"


def test_json_each_row_null_kept(nasty):
    lines = _lines(nasty, "JSONEachRow")
    assert '"s":null' in lines[5]
    compact = _lines(nasty, "JSONCompactEachRow")
    assert compact[5].startswith("[6,null,")


def test_markdown_pipe_escape(nasty):
    lines = _lines(nasty, "Markdown")
    assert lines[6] == "| 7 | pipe\\|bar,comma | \\N |"
    hdr = render.header_lines(nasty, "Markdown")
    assert hdr == ["| k | s | d |", "|---|---|---|"]


def test_tsv_roundtrip_nasty(nasty):
    """serialize→parse recovers every escaped string and NULL exactly."""
    lines = render.serialize_lines(nasty, "TSV")
    back = render.parse_lines(lines, "TSV", nasty.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, nasty.collect()))


def test_csv_roundtrip_nasty(nasty):
    lines = render.serialize_lines(nasty, "CSV")
    back = render.parse_lines(lines, "CSV", nasty.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, nasty.collect()))


def test_headers_with_types(nasty):
    hdr = render.header_lines(nasty, "TSVWithNamesAndTypes")
    assert hdr == ["k\ts\td", "Int64\tString\tDate"]
    assert render.header_lines(nasty, "CSVWithNames") == ['"k","s","d"']
    assert render.header_lines(nasty, "TSV") == []


def test_into_outfile_roundtrip(nasty, tmp_path):
    path = str(tmp_path / "out_tsv")
    render.into_outfile(nasty, path, "TSVWithNames")
    spark = nasty.sparkSession
    back = render.parse_lines(
        spark.read.text(path).withColumnRenamed("value", "line"),
        "TSV", nasty.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, nasty.collect()))
    assert (tmp_path / "out_tsv" / "_header").read_text().startswith("k\ts\td")


def test_rowbinary_rejects_unsupported(spark):
    df = spark.createDataFrame([Row(a=[1, 2])])
    with pytest.raises(Exception):
        render.rowbinary_encode(df).collect()


def test_rowbinary_timestamp_date(spark):
    df = spark.createDataFrame(
        [Row(k=1, t=datetime.datetime(2024, 5, 6, 7, 8, 9),
             d=datetime.date(2020, 2, 29))])
    dec = render.rowbinary_decode(render.rowbinary_encode(df), df.schema)
    assert dec.collect() == df.collect()


def test_render_pretty_vertical(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b=None)])
    pretty = render.render_pretty(df.orderBy("a"))
    assert pretty.splitlines()[0].startswith("┌")
    assert "│ 1" in pretty and "\\N" in pretty
    vert = render.render_vertical(df.orderBy("a"))
    assert vert.startswith("Row 1:")
    assert "b: \\N" in vert


def test_serialize_plan_is_projection_only(spark, sf_dir):
    """The serializer must not add exchanges — pure narrow projection."""
    from clickhouse_clickhouse_spark.tables import load_table

    df = render.serialize_lines(load_table(spark, sf_dir, "nation"),
                                "JSONEachRow")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_template_nulls_and_unknown_column(nasty):
    out = render.serialize_template(nasty.orderBy("k"),
                                    "k=${k}; s=${s}")
    lines = [r.line for r in out.collect()]
    assert lines[0] == "k=1; s=plain"
    assert lines[5] == "k=6; s=\\N"
    import pytest as _pytest
    with _pytest.raises(KeyError):
        render.serialize_template(nasty, "${missing}")


def test_parse_regexp_unmatched_rows_null(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    lines = spark.createDataFrame([Row(line="id=5 name=x"),
                                   Row(line="garbage")])
    sch = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("name", T.StringType())])
    rows = render.parse_regexp(lines, r"^id=(\d+) name=(\w+)$",
                               sch).collect()
    assert sorted(rows, key=repr) == sorted(
        [(5, "x"), (None, None)], key=repr)


def test_json_envelope(spark):
    import json as _json

    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    env = _json.loads(render.render_json_envelope(df.orderBy("a")))
    assert env["rows"] == 2
    assert env["meta"][0] == {"name": "a", "type": "Int64"}
    assert env["data"][1] == {"a": 2, "b": "y"}
    compact = _json.loads(
        render.render_json_envelope(df.orderBy("a"), compact=True))
    assert compact["data"] == [[1, "x"], [2, "y"]]


def test_npy_roundtrip(spark, sf_dir, tmp_path):
    from clickhouse_clickhouse_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings") \
        .select("embedding").repartition(4)
    d = str(tmp_path / "npy_out")
    manifest = render.write_npy(e, "embedding", d).collect()
    assert sum(m.rows for m in manifest) == 500
    back = render.read_npy(spark, d)
    a = sorted(tuple(r.embedding) for r in e.collect())
    b = sorted(tuple(r.embedding) for r in back.collect())
    assert a == b


def test_tsvraw_and_jsonstrings(spark, sf_dir):
    from clickhouse_clickhouse_spark.tables import load_table

    n = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").limit(2)
    raw = [r.line for r in render.serialize_lines(n, "TSVRaw").collect()]
    assert raw[0] == "0\tNATION_0\t0"
    back = render.parse_lines(render.serialize_lines(n, "TSVRaw"),
                              "TSVRaw", n.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, n.collect()))
    js = [r.line for r in
          render.serialize_lines(n, "JSONStringsEachRow").collect()]
    assert js[0] == '{"n_nationkey":"0","n_name":"NATION_0","n_regionkey":"0"}'


def test_rowbinary_multibyte_leb128_roundtrip(spark):
    """Strings needing 2- and 3-byte LEB128 length prefixes survive the
    vectorized encode/decode (round-5 rewrite of the variable-width
    path)."""
    rows = [(1, "x" * 5), (2, "y" * 300), (3, "z" * 20000), (4, ""),
            (5, "é" * 100)]
    df = spark.createDataFrame(rows, "k int, s string")
    dec = render.rowbinary_decode(render.rowbinary_encode(df), df.schema)
    got = {r.k: r.s for r in dec.collect()}
    assert got == dict(rows)


def test_native_format_roundtrips(spark, sf_dir, tmp_path):
    """Native block format: in-plan and file round trips, Nullable mask
    layout, multi-byte varint prefixes (>=128-byte strings), unicode,
    and the loud unexpected-column error."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from clickhouse_clickhouse_spark.sources.native import (
        native_decode,
        native_encode,
        read_native,
        write_native,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    df = spark.createDataFrame(
        [(1, "a" * 5, 1.5, None), (2, "b" * 200, None, "x"),
         (3, "", 2.5, "y" * 300), (None, "unicode £éф", 3.5, "z")],
        "k int, s string, f double, t string")
    back = native_decode(native_encode(df), df.schema)
    assert sorted(map(tuple, back.collect()), key=str) == \
        sorted(map(tuple, df.collect()), key=str)

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    p = str(tmp_path / "native")
    man = write_native(o, p).collect()
    assert sum(r.blocks for r in man) >= 1
    rd = read_native(spark, p, o.schema)
    assert sorted(map(tuple, rd.collect()), key=str) == \
        sorted(map(tuple, o.collect()), key=str)

    wrong = o.withColumnRenamed("o_orderkey", "nope").schema
    with _pytest.raises(Exception, match="unexpected column"):
        native_decode(native_encode(o), wrong).collect()


def test_native_varint_chain_decoder():
    """The pointer-doubling interleaved-varint decoder against a direct
    sequential reference over adversarial length mixes (0, 1, 127, 128,
    16383, 16384 — every prefix-width boundary)."""
    import numpy as np

    from clickhouse_clickhouse_spark.sources.native import (
        _leb128_block,
        _varint_chain,
    )

    rng = np.random.default_rng(11)
    lens = np.array([0, 1, 127, 128, 300, 16383, 16384, 5, 0, 70000]
                    + rng.integers(0, 1000, size=200).tolist(),
                    dtype=np.int64)
    prefix, nb = _leb128_block(lens)
    # build the interleaved stream: prefix_i + payload_i
    parts, pstart = [], 0
    for ln, k in zip(lens, nb):
        parts.append(prefix[pstart:pstart + k])
        parts.append(rng.integers(0, 256, size=ln).astype(np.uint8))
        pstart += k
    buf = np.concatenate(parts)
    starts, got_lens = _varint_chain(buf, 0, lens.size)
    exp_starts = np.cumsum(nb + lens) - lens
    assert (got_lens == lens).all()
    assert (starts == exp_starts).all()


def test_avro_ocf_roundtrips(spark, sf_dir, tmp_path):
    """From-scratch Avro OCF codec: mixed types with nulls, negative
    longs (zigzag), multi-byte length prefixes, binary columns; file
    round trip with deflate codec and embedded-schema inference; loud
    refusal for unsupported schema bits."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from clickhouse_clickhouse_spark.sources.avro import (
        _avro_json_fields,
        read_avro,
        write_avro,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    df = spark.createDataFrame(
        [(1, "hello", 1.5, True, None, bytearray(b"\x00\x01")),
         (2, "x" * 300, None, False, "text £é", None),
         (None, "", 2.25, None, "z", bytearray(b"")),
         (-12345678901, "neg", -3.5, True, None, bytearray(b"\xff" * 5))],
        "k long, s string, f double, b boolean, t string, y binary")
    p = str(tmp_path / "a1")
    write_avro(df, p).collect()
    back = read_avro(spark, p)       # schema from the embedded header

    def norm(rows):
        return sorted([tuple(bytes(x) if isinstance(x, (bytes, bytearray))
                             else x for x in r) for r in rows], key=str)
    assert norm(back.collect()) == norm(df.collect())

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    p2 = str(tmp_path / "a2")
    write_avro(o, p2, codec="deflate").collect()
    rd = read_avro(spark, p2)
    assert sorted(map(str, rd.collect())) == sorted(map(str, o.collect()))

    with _pytest.raises(TypeError, match="unsupported union"):
        _avro_json_fields('{"type":"record","name":"r","fields":'
                          '[{"name":"x","type":["int","string"]}]}')
    with _pytest.raises(TypeError, match="unsupported column"):
        write_avro(spark.createDataFrame([([1],)], "a array<int>"), "/tmp/x")


def test_protobuf_wire_format(spark):
    """From-scratch protobuf codec: framed + single roundtrips with
    nulls/negatives/unicode/binary; decode of HAND-BUILT canonical wire
    bytes (external ground truth); missing-field -> NULL; loud errors on
    unknown fields and unsupported .proto shapes."""
    import pytest as _pytest

    from clickhouse_clickhouse_spark.sources.protobuf import (
        parse_proto,
        protobuf_decode,
        protobuf_encode,
        spark_schema_to_proto,
    )

    df = spark.createDataFrame(
        [(1, "hello", 1.5, True, bytearray(b"\x00\x01")),
         (-7, "x" * 200, None, False, None),
         (None, "", 2.25, None, bytearray(b"")),
         (1 << 40, "üñí", -3.5, True, bytearray(b"\xff" * 3))],
        "k long, s string, f double, b boolean, y binary")
    proto = spark_schema_to_proto(df.schema)

    def norm(rows):
        return sorted([tuple(bytes(x) if isinstance(x, (bytes, bytearray))
                             else x for x in r) for r in rows], key=str)
    for framed in (True, False):
        dec = protobuf_decode(protobuf_encode(df, proto, framed=framed),
                              proto, framed=framed)
        assert norm(dec.collect()) == norm(df.collect())

    p2 = "message M { int32 a = 1; sint32 b = 2; string c = 3; }"
    hand = bytes([0x08, 0x96, 0x01, 0x10, 0x03, 0x1A, 0x02]) + b"hi"
    r = protobuf_decode(
        spark.createDataFrame([(bytearray(hand),)], "pb binary"),
        p2, framed=False).collect()[0]
    assert (r.a, r.b, r.c) == (150, -2, "hi")
    # omitted field decodes to NULL (reference Nullable mapping)
    hand2 = bytes([0x08, 0x01, 0x1A, 0x01]) + b"z"
    r2 = protobuf_decode(
        spark.createDataFrame([(bytearray(hand2),)], "pb binary"),
        p2, framed=False).collect()[0]
    assert (r2.a, r2.b, r2.c) == (1, None, "z")
    # unknown trailing field -> loud error, not silent misparse
    bad = hand + bytes([0x20, 0x01])          # field 4 varint
    with _pytest.raises(Exception, match="unknown or out-of-order"):
        protobuf_decode(
            spark.createDataFrame([(bytearray(bad),)], "pb binary"),
            p2, framed=False).collect()
    with _pytest.raises(ValueError, match="unsupported field"):
        parse_proto("message M { repeated int32 xs = 1; }")
