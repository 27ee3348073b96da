"""Round-14 pin: the searchsorted bucketize kernel must agree with the
in-plan HOF-fold form (both remain live — kernel for raw inputs, fold
for derived subtrees) on adversarial keys the fixtures never produce:
values exactly equal to a boundary, NaN, NULL, infinities, and the
string-prefix key path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.grank import (
    _BKT,
    _bucket_bounds,
    _bucketize,
    _searchsorted_kernel,
    global_range_count,
)


@pytest.fixture(scope="module")
def spark():
    from clickhouse_clickhouse_spark.session import get_spark

    return get_spark("test_grank_kernel", cores=4)


def test_kernel_matches_fold_numeric_edges(spark):
    vals = ([float(i) for i in range(50)]
            + [12.0, 12.0, 25.5, float("nan"), float("inf"),
               float("-inf"), None])
    df = spark.createDataFrame([(v,) for v in vals], "k double")
    got = sorted((repr(r["k"]), r[_BKT]) for r in
                 _bucketize(df, "k", 8, kernel=True).collect())
    ref = sorted((repr(r["k"]), r[_BKT]) for r in
                 _bucketize(df, "k", 8, kernel=False).collect())
    assert got == ref
    d = dict(got)
    assert d["None"] == -1          # NULL -> -1 on both paths
    assert d["nan"] == 7            # Spark orders NaN ABOVE every bound


def test_kernel_matches_fold_boundary_ties(spark):
    # constant-heavy data puts many values exactly ON the percentile
    # boundaries — the strict `v > b` count must agree
    vals = [1.0] * 20 + [2.0] * 20 + [3.0] * 20
    df = spark.createDataFrame([(v,) for v in vals], "k double")
    got = [r[_BKT] for r in
           _bucketize(df, "k", 4, kernel=True).orderBy("k").collect()]
    ref = [r[_BKT] for r in
           _bucketize(df, "k", 4, kernel=False).orderBy("k").collect()]
    assert got == ref


def test_kernel_matches_fold_string_prefix_keys(spark):
    vals = ["", "a", "aa", "ab", "abcdefgh", "abcdefgz", "zz", None,
            "éclair", "0", "~"]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = sorted((repr(r["k"]), r[_BKT]) for r in
                 _bucketize(df, "k", 4, kernel=True).collect())
    ref = sorted((repr(r["k"]), r[_BKT]) for r in
                 _bucketize(df, "k", 4, kernel=False).collect())
    assert got == ref


def test_offset_kernel_matches_fold_frame_targets(spark):
    # the global_range_count `hi` form — kernel vs the pre-round-14
    # SQL fold `size(filter(bounds, b < key + preceding))` it replaced
    vals = [float(i) for i in range(40)] + [float("nan"), None]
    df = spark.createDataFrame([(v,) for v in vals], "k double")
    bounds = _bucket_bounds(df, "k", 8)
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    kern = F.when(F.col("k").isNull(), F.lit(0)).otherwise(
        _searchsorted_kernel(bounds, offset=5.0)(F.col("k")))
    fold = F.size(F.filter(barr, lambda bb: bb < F.col("k") + F.lit(5.0)))
    rows = df.select(F.col("k"), kern.alias("hi"),
                     fold.alias("ref")).collect()
    for r in rows:
        assert r["hi"] == r["ref"], r
    nan_hi = [r["hi"] for r in rows
              if r["k"] is not None and math.isnan(r["k"])]
    assert nan_hi == [len(bounds)]  # Spark: b < NaN is TRUE everywhere


def test_global_range_count_kernel_small(spark):
    # tiny exact check vs a single-partition window
    from pyspark.sql import Window

    df = spark.createDataFrame([(float(v),) for v in
                                [1, 2, 2, 3, 7, 8, 15, 15, 16]],
                               "k double")
    got = {tuple(r) for r in
           global_range_count(df, "k", 5.0, out="c", buckets=4).collect()}
    w = (Window.orderBy(F.col("k").cast("double")).rangeBetween(-5, 0))
    ref = {tuple(r) for r in
           df.withColumn("c", F.count("*").over(w)).collect()}
    assert got == ref
