"""MergeTree engine-variant merge semantics tests."""

import datetime

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.sources.merge_variants import (
    aggregating_merge, apply_ttl, collapsing_merge, optimize_with,
    replacing_merge, summing_merge,
)

T = datetime.datetime


def test_replacing_merge(spark):
    df = spark.createDataFrame(
        [(1, 1, "old"), (1, 3, "new"), (1, 2, "mid"), (2, 1, "only")],
        "k int, ver int, v string")
    out = {r.k: (r.ver, r.v) for r in replacing_merge(df, ["k"], "ver").collect()}
    assert out == {1: (3, "new"), 2: (1, "only")}


def test_summing_merge(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 2, "a"), (1, 5.0, 3, "b"), (2, 1.0, 1, "c")],
        "k int, amount double, qty int, tag string")
    out = {r.k: (r.amount, r.qty, r.tag) for r in
           summing_merge(df, ["k"], ["amount", "qty"]).collect()}
    assert out[1] == (15.0, 5, "a") and out[2] == (1.0, 1, "c")


def test_aggregating_merge(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 3, 7), (1, 5.0, 1, 9), (2, 2.0, 4, 4)],
        "k int, s double, mn int, mx int")
    out = {r.k: (r.s, r.mn, r.mx) for r in
           aggregating_merge(df, ["k"], {"s": "sum", "mn": "min", "mx": "max"})
           .collect()}
    assert out[1] == (15.0, 1, 9) and out[2] == (2.0, 4, 4)


def test_collapsing_merge(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, 100.0),    # insert v1
         (1, 2, -1, 100.0),   # cancel v1
         (1, 3, 1, 120.0),    # insert v2 -> survives
         (2, 1, 1, 50.0),
         (2, 2, -1, 50.0),    # fully cancelled -> key 2 vanishes
         (3, 1, -1, 10.0),    # dangling -1 -> kept (reference keeps it)
         (4, 1, -1, 7.0),     # two cancels, one state: sign-sum -1
         (4, 2, 1, 8.0),      #   -> FIRST -1 row (seq 1) survives
         (4, 3, -1, 9.0)],
        "k int, seq int, sign int, v double")
    out = {r.k: r.v for r in
           collapsing_merge(df, ["k"], "sign", order_by=["seq"]).collect()}
    assert out == {1: 120.0, 3: 10.0, 4: 7.0}


def test_ttl_and_optimize_with(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = [(i, 1, T(2024, 1, 1) + datetime.timedelta(days=i), float(i))
            for i in range(10)]
    spark.createDataFrame(rows, "k int, ver int, ts timestamp, v double") \
        .write.parquet(path)
    apply_ttl(spark, path, "ts", F.lit("2024-01-05").cast("timestamp"))
    assert spark.read.parquet(path).count() == 6  # days 4..9 remain
    # engine-variant OPTIMIZE: replacing merge on the survivors
    optimize_with(spark, path,
                  lambda df: replacing_merge(df.withColumn("k", F.lit(1)),
                                             ["k"], "v"))
    left = spark.read.parquet(path).collect()
    assert len(left) == 1 and left[0].v == 9.0
