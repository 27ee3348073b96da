"""Round-14 adversarial-review regression pins for sources/."""

import numpy as np
import pytest
from pyspark.sql import functions as F


PROTO = "message M { uint64 a = 1; }"


def test_avro_null_last_union_decodes(spark):
    """Foreign writers may order unions [T, "null"]; the decoder
    previously hardcoded null-first and decoded every present value as
    NULL (and vice versa)."""
    from clickhouse_clickhouse_spark.sources.avro import (
        _avro_json_fields, _decode_block)

    sch = ('{"type":"record","name":"r","fields":'
           '[{"name":"x","type":["long","null"]}]}')
    fields = _avro_json_fields(sch)
    assert fields == [("x", "long", None, 2)]
    # null-LAST wire form: union idx 0x00 = present, 0x02 = null
    buf = np.frombuffer(bytes([0x00, 0x0A, 0x02, 0x00, 0x0C]),
                        dtype=np.uint8)
    out = _decode_block(buf, fields, 3)
    assert list(out["x"]) == [5, None, 6]
    # our own writer's null-FIRST form still decodes identically
    sch2 = ('{"type":"record","name":"r","fields":'
            '[{"name":"x","type":["null","long"]}]}')
    f2 = _avro_json_fields(sch2)
    assert f2 == [("x", "long", None, 1)]
    buf2 = np.frombuffer(bytes([0x02, 0x0A, 0x00, 0x02, 0x0C]),
                         dtype=np.uint8)
    out2 = _decode_block(buf2, f2, 3)
    assert list(out2["x"]) == [5, None, 6]


def test_avro_null_timestamp_next_to_extreme_double(spark, tmp_path):
    """Logical conversion ran on speculative garbage of masked rows
    BEFORE null-masking — a NULL timestamp followed by an extreme
    double raised OutOfBoundsDatetime on a correctly written file."""
    import datetime as dt

    from clickhouse_clickhouse_spark.sources.avro import (
        read_avro, write_avro)

    rows = [(dt.datetime(2024, 1, 1), 1.5), (None, -1e300),
            (dt.datetime(2024, 6, 1), -1e300)]
    df = spark.createDataFrame(rows, "ts timestamp, x double")
    p = str(tmp_path / "a")
    write_avro(df, p).collect()
    back = read_avro(spark, p).orderBy("x", "ts").collect()
    assert [r.ts for r in back if r.ts is None] == [None]
    assert sorted(r.x for r in back) == [-1e300, -1e300, 1.5]


def test_csv_read_with_schema_skips_header(spark, tmp_path):
    from clickhouse_clickhouse_spark.sources.formats import (
        read_any, write_any)

    df = spark.range(10).withColumn("s", F.lit("v"))
    p = str(tmp_path / "c")
    write_any(df, p, "csv")
    back = read_any(spark, p, "csv", schema=df.schema)
    assert back.count() == 10
    assert back.filter(F.col("s") == "s").count() == 0


def test_write_any_overwrite_custom_formats(spark, tmp_path):
    """'overwrite' silently APPENDED for the custom writers — a re-run
    doubled every row on read."""
    from clickhouse_clickhouse_spark.sources.formats import (
        read_any, write_any)

    df = spark.range(20).withColumn("s", F.lit("x"))
    p = str(tmp_path / "n")
    write_any(df, p, "native")
    write_any(df, p, "native")           # overwrite, not append
    assert read_any(spark, p, "native", schema=df.schema).count() == 20
    write_any(df, p + "2", "msgpack")
    with pytest.raises(FileExistsError):
        write_any(df, p + "2", "msgpack", mode="error")
    with pytest.raises(ValueError, match="compression"):
        write_any(df, p + "3", "native", compression="zstd")


def test_protobuf_null_cell_and_uint64_guard(spark):
    from clickhouse_clickhouse_spark.sources.protobuf import (
        protobuf_decode)

    # NULL cell -> all-null row (was: TypeError in the executor)
    df = spark.createDataFrame([(None,), (bytes([0x02, 0x08, 0x07]),)],
                               "pb binary")
    got = protobuf_decode(df, PROTO).orderBy("a").collect()
    assert [r.a for r in got] == [None, 7]   # asc = NULLS FIRST
    # uint64 >= 2^63 refuses loudly instead of wrapping negative
    big = (1 << 63)
    u = big
    varint = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        varint.append(b | 0x80 if u else b)
        if not u:
            break
    cell = bytes([1 + len(varint), 0x08]) + bytes(varint)
    bad = spark.createDataFrame([(cell,)], "pb binary")
    with pytest.raises(Exception, match="2\\^63"):
        protobuf_decode(bad, PROTO).collect()


def test_swap_dirs_leaves_no_old_dir(spark, tmp_path):
    import os

    from clickhouse_clickhouse_spark.sources.write import mutate_update

    p = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.lit(1)).write.parquet(p)
    mutate_update(spark, p, {"v": F.lit(2)}, F.col("id") > 5)
    assert not os.path.exists(p + "__old")
    assert spark.read.parquet(p).filter("v = 2").count() == 4


def test_native_long_strings_window_growth(spark, tmp_path):
    """Strings far longer than the initial 16-bytes-per-row window must
    still decode exactly (the windowed varint chain doubles until the
    chain provably fits)."""
    from clickhouse_clickhouse_spark.sources.formats import (
        read_any, write_any)

    df = spark.range(8).select(
        "id", F.concat(F.lit("x" * 5000), F.col("id").cast("string"))
        .alias("s"))
    p = str(tmp_path / "n")
    write_any(df, p, "native")
    back = read_any(spark, p, "native", schema=df.schema)
    assert sorted((r.id, len(r.s)) for r in back.collect()) == \
        [(i, 5001) for i in range(8)]
