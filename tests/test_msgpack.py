"""MessagePack codec (sources/msgpack.py) — round-trips, hand-built
external wire bytes (spec vectors incl. the unsigned int forms this
encoder never emits), and loud refusals. Spec: msgpack.org/spec;
reference analog: MsgPackRow[Input|Output]Format.
"""

import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.sources.msgpack import (
    msgpack_decode,
    msgpack_encode,
)

DDL = ("i bigint, s string, d double, b boolean, raw binary, "
       "al array<bigint>, ad array<double>, asx array<string>")


def _fixture(spark):
    rows = [
        Row(i=5, s="hi", d=1.5, b=True, raw=b"\x00\xff",
            al=[1, -200, 3_000_000_000], ad=[0.5, -2.25],
            asx=["a", "bb"]),
        Row(i=-7, s="", d=-0.0, b=False, raw=b"",
            al=[], ad=[], asx=[]),
        Row(i=None, s=None, d=None, b=None, raw=None,
            al=None, ad=None, asx=None),
        Row(i=2**40, s="naïve → 東京", d=3.14159, b=True, raw=b"xyz",
            al=[0], ad=[1e300], asx=["unicode ✓", ""]),
        Row(i=-(2**40), s="x" * 300, d=float("inf"), b=False,
            raw=b"\x01" * 300, al=list(range(20)), ad=[0.0] * 17,
            asx=["s"] * 16),
    ]
    return spark.createDataFrame(rows, DDL)


def test_msgpack_roundtrip(spark):
    df = _fixture(spark)
    back = msgpack_decode(msgpack_encode(df), DDL)
    a = sorted([tuple(r) for r in df.collect()], key=repr)
    b = sorted([tuple(r) for r in back.collect()], key=repr)
    assert a == b


def test_msgpack_smallest_forms(spark):
    # canonical sizes: fixint 1B, int16 3B, float64 9B, fixstr 1+L
    df = spark.createDataFrame([Row(i=5)], "i bigint")
    cell = msgpack_encode(df).collect()[0].mp
    assert cell == b"\x05"
    df = spark.createDataFrame([Row(i=-31)], "i bigint")
    assert msgpack_encode(df).collect()[0].mp == bytes([256 - 31])
    df = spark.createDataFrame([Row(i=1000)], "i bigint")
    assert msgpack_encode(df).collect()[0].mp == b"\xd1\x03\xe8"
    df = spark.createDataFrame([Row(s="abc")], "s string")
    assert msgpack_encode(df).collect()[0].mp == b"\xa3abc"


def test_msgpack_external_unsigned_forms(spark):
    # bytes a size-optimizing external encoder would emit: uint8/16/32/64
    # + str8 + float32 + array16 — forms our encoder never writes
    cell = b"".join([
        b"\xcc\xfa",                       # uint8 250
        b"\xd9\x03abc",                    # str8 "abc"
        b"\xca" + struct.pack(">f", 2.5),  # float32 2.5
        b"\xdc\x00\x02\xcd\x01\x00\xcf" + struct.pack(">Q", 7),
        # array16 [uint16 256, uint64 7]
    ])
    df = spark.createDataFrame([Row(mp=cell)], "mp binary")
    out = msgpack_decode(df, "i bigint, s string, d double, "
                             "al array<bigint>").collect()[0]
    assert out.i == 250 and out.s == "abc" and out.d == 2.5
    assert out.al == [256, 7]


def test_msgpack_int_promotes_into_double(spark):
    # the reference casts integer msgpack values into Float columns
    df = spark.createDataFrame([Row(mp=b"\x2a")], "mp binary")
    assert msgpack_decode(df, "d double").collect()[0].d == 42.0


def test_msgpack_wrong_type_raises(spark):
    df = spark.createDataFrame([Row(mp=b"\xa3abc")], "mp binary")
    with pytest.raises(Exception, match="msgpack"):
        msgpack_decode(df, "i bigint").collect()


def test_msgpack_map_schema_refused(spark):
    df = spark.createDataFrame([Row(m={"a": 1})],
                               "m map<string,bigint>")
    with pytest.raises(ValueError, match="not supported"):
        msgpack_encode(df)


def test_msgpack_nested_array_refused(spark):
    df = spark.createDataFrame([Row(a=[[1]])],
                               "a array<array<bigint>>")
    with pytest.raises(ValueError, match="element type"):
        msgpack_encode(df)


def test_msgpack_volume_roundtrip(spark, sf_dir):
    from clickhouse_clickhouse_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "event_type",
                F.col("value").cast("double").alias("value"), "props")
    ddl = ("event_id bigint, user_id bigint, event_type string, "
           "value double, props string")
    back = msgpack_decode(msgpack_encode(ev), ddl)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0


def test_msgpack_stream_file_roundtrip(spark, tmp_path):
    from clickhouse_clickhouse_spark.sources.msgpack import (
        read_msgpack, write_msgpack,
    )

    df = _fixture(spark).select("i", "s", "d", "b", "raw")
    path = str(tmp_path / "mp_stream")
    manifest = write_msgpack(df, path).collect()
    assert sum(r.rows for r in manifest) == df.count()
    back = read_msgpack(spark, path, "i bigint, s string, d double, "
                                     "b boolean, raw binary")
    a = sorted([tuple(r) for r in df.collect()], key=repr)
    b = sorted([tuple(r) for r in back.collect()], key=repr)
    assert a == b


def test_msgpack_stream_rejects_arrays(spark, tmp_path):
    from clickhouse_clickhouse_spark.sources.msgpack import write_msgpack

    df = spark.createDataFrame([Row(a=[1, 2])], "a array<bigint>")
    with pytest.raises(ValueError, match="scalar-only"):
        write_msgpack(df, str(tmp_path / "x"))


def test_msgpack_stream_external_bytes(spark, tmp_path):
    # a stream no cell framing: two rows of (uint16, fixstr) written by
    # hand with unsigned forms
    p = tmp_path / "ext"
    p.mkdir()
    (p / "a.msgpack").write_bytes(
        b"\xcd\x01\x00\xa2hi" + b"\x07\xa0")
    from clickhouse_clickhouse_spark.sources.msgpack import read_msgpack

    rows = sorted(read_msgpack(spark, str(p), "i bigint, s string")
                  .collect(), key=lambda r: r.i)
    assert [(r.i, r.s) for r in rows] == [(7, ""), (256, "hi")]


def test_msgpack_via_write_read_any(spark, tmp_path):
    from clickhouse_clickhouse_spark.sources.formats import (
        read_any, write_any,
    )

    df = spark.range(50).selectExpr(
        "id", "concat('v', id) AS s",
        "CAST(id * 1.5 AS DOUBLE) AS d")
    p = str(tmp_path / "mp_any")
    write_any(df, p, "msgpack")
    back = read_any(spark, p, "msgpack",
                    schema="id bigint, s string, d double")
    assert back.count() == 50
    assert {r.id for r in back.collect()} == set(range(50))


def test_into_outfile_binary_formats(spark, tmp_path):
    # SELECT ... INTO OUTFILE 'p' FORMAT Parquet|MsgPack dispatch to the
    # binary format layer (reference CLI semantics)
    from clickhouse_clickhouse_spark.sources.formats import read_any
    from clickhouse_clickhouse_spark.sources.render import into_outfile

    df = spark.range(20).selectExpr("id", "concat('r', id) AS s")
    pq = str(tmp_path / "of_parquet")
    into_outfile(df, pq, "Parquet")
    assert spark.read.parquet(pq).count() == 20
    mp = str(tmp_path / "of_msgpack")
    into_outfile(df, mp, "MsgPack")
    back = read_any(spark, mp, "msgpack", schema="id bigint, s string")
    assert sorted(r.id for r in back.collect()) == list(range(20))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_scalar_rows = hst.lists(
    hst.tuples(
        hst.one_of(hst.none(), hst.integers(min_value=-(2**63),
                                            max_value=2**63 - 1)),
        hst.one_of(hst.none(), hst.text(max_size=40)),
        hst.one_of(hst.none(),
                   hst.floats(allow_nan=False, width=64)),
        hst.one_of(hst.none(), hst.booleans()),
        hst.one_of(hst.none(), hst.binary(max_size=40)),
        hst.one_of(hst.none(), hst.lists(
            hst.one_of(hst.none(), hst.integers(min_value=-(2**63),
                                                max_value=2**63 - 1)),
            max_size=8)),
    ), min_size=1, max_size=30)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_scalar_rows)
def test_msgpack_property_roundtrip(spark, rows):
    """Any batch of arbitrary scalars + int arrays (full int64 range,
    unicode, NULLs everywhere) round-trips bit-exactly."""
    ddl = ("i bigint, s string, d double, b boolean, raw binary, "
           "al array<bigint>")
    df = spark.createDataFrame(rows, ddl)
    back = msgpack_decode(msgpack_encode(df), ddl)
    a = sorted((tuple(r) for r in df.collect()), key=repr)
    b = sorted((tuple(r) for r in back.collect()), key=repr)
    assert a == b


def test_msgpack_uint64_overflow_refused(spark):
    # uint64 >= 2^63 would silently wrap negative via int64 — refuse
    # loudly instead (round-6 advice)
    cell = b"\xcf" + struct.pack(">Q", 2**63)
    df = spark.createDataFrame([Row(mp=cell)], "mp binary")
    with pytest.raises(Exception, match="uint64|2\\^63"):
        msgpack_decode(df, "i bigint").collect()
    # ... and the float-promotion path must not wrap either
    with pytest.raises(Exception, match="uint64|2\\^63"):
        msgpack_decode(df, "d double").collect()
    # 2^63 - 1 still decodes fine
    ok = b"\xcf" + struct.pack(">Q", 2**63 - 1)
    df = spark.createDataFrame([Row(mp=ok)], "mp binary")
    assert msgpack_decode(df, "i bigint").collect()[0].i == 2**63 - 1


def test_msgpack_truncated_cell_refused(spark):
    # a cell whose value stream does not tile it exactly (trailing
    # garbage / short row) must raise, not silently mis-decode the next
    # column from stale cursor bytes (round-6 advice)
    good = b"\x05\xa2hi"               # i=5, s="hi"
    trailing = good + b"\x07"          # extra byte after the last column
    df = spark.createDataFrame([Row(mp=trailing)], "mp binary")
    with pytest.raises(Exception, match="truncated|trailing|bytes"):
        msgpack_decode(df, "i bigint, s string").collect()
    df = spark.createDataFrame([Row(mp=good)], "mp binary")
    out = msgpack_decode(df, "i bigint, s string").collect()[0]
    assert (out.i, out.s) == (5, "hi")


def test_uint64_decimal_optin_roundtrip(spark):
    # the DECIMAL(20,0) opt-in (types_map uint64_as_decimal): full
    # unsigned range incl. 2^64-1 round-trips; negatives refuse
    import decimal

    from clickhouse_clickhouse_spark.types_map import parse_ch_type

    from pyspark.sql import types as T
    assert parse_ch_type("UInt64", uint64_as_decimal=True)[0] == \
        T.DecimalType(20, 0)
    assert parse_ch_type("UInt64")[0] == T.LongType()

    vals = [0, 42, 2**63 - 1, 2**63, 2**64 - 1, None]
    df = spark.createDataFrame([(decimal.Decimal(v) if v is not None
                                 else None,) for v in vals],
                               "v decimal(20,0)")
    back = msgpack_decode(msgpack_encode(df), "v decimal(20,0)")
    got = sorted((r.v for r in back.collect()),
                 key=lambda x: (x is None, x))
    assert got == sorted((decimal.Decimal(v) if v is not None else None
                          for v in vals), key=lambda x: (x is None, x))
    with pytest.raises(Exception, match="UInt64 range|DECIMAL"):
        msgpack_encode(spark.sql(
            "SELECT CAST(-1 AS DECIMAL(20,0)) AS v")).collect()


def test_uint64_rowbinary_optin_roundtrip(spark):
    import decimal

    from clickhouse_clickhouse_spark.sources.render import (
        rowbinary_decode, rowbinary_encode,
    )
    from clickhouse_clickhouse_spark.types_map import ch_schema_to_struct

    vals = [0, 1, 2**63, 2**64 - 1]
    df = spark.createDataFrame(
        [(i, decimal.Decimal(v)) for i, v in enumerate(vals)],
        "k bigint, v decimal(20,0)")
    schema = ch_schema_to_struct("k Int64, v UInt64",
                                 uint64_as_decimal=True)
    back = rowbinary_decode(rowbinary_encode(df), schema)
    assert sorted((r.k, r.v) for r in back.collect()) == \
        [(i, decimal.Decimal(v)) for i, v in enumerate(vals)]
    with pytest.raises(TypeError, match="DECIMAL\\(20,0\\)"):
        rowbinary_encode(spark.sql(
            "SELECT CAST(1 AS DECIMAL(10,2)) AS v"))
