"""Unit tests for the custom operator semantics (SURVEY.md §2.3-2.6
helpers) against small hand-built frames — golden-output style, the
reference's 0_stateless analog at micro scale."""

import datetime

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.joins import any_join, asof_join, paste_join
from clickhouse_clickhouse_spark.operators.aggregates import (
    delta_sum, final_dedup, limit_by, sum_map, top_k_per_group, with_totals,
)
from clickhouse_clickhouse_spark.operators.fill import with_fill
from clickhouse_clickhouse_spark.operators.windows import limit_with_ties

TS = datetime.datetime


def test_asof_modes_pooled(spark):
    """backward / strict / forward / left-outer semantics in FOUR
    actions over ONE shared fixture (suite-wall pattern: the per-case
    micro frames cost per-ACTION overhead, not compute — the join key
    is the case discriminator). Cases: k=1 backward chain, k=2 tie row
    (non-strict matches, strict excludes), k=3 exact-tie row, k=4
    forward pick, k=9 unmatched left."""
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10)), (1, TS(2024, 1, 1, 12)),
         (2, TS(2024, 1, 1, 9)), (3, TS(2024, 1, 1, 9)),
         (4, TS(2024, 1, 1, 10)), (9, TS(2024, 1, 1))],
        "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9), 100.0), (1, TS(2024, 1, 1, 11), 200.0),
         (2, TS(2024, 1, 1, 9), 300.0), (3, TS(2024, 1, 1, 9), 1.0),
         (4, TS(2024, 1, 1, 9), 1.0), (4, TS(2024, 1, 1, 11), 2.0)],
        "k int, rts timestamp, v double")

    back = {(r.k, r.ts): r.v for r in
            asof_join(left, right, ["k"], "ts", "rts",
                      "backward").collect()}
    assert back == {(1, TS(2024, 1, 1, 10)): 100.0,
                    (1, TS(2024, 1, 1, 12)): 200.0,
                    (2, TS(2024, 1, 1, 9)): 300.0,   # ties (non-strict)
                    (3, TS(2024, 1, 1, 9)): 1.0,
                    (4, TS(2024, 1, 1, 10)): 1.0}

    strict = {(r.k, r.ts): r.v for r in
              asof_join(left, right, ["k"], "ts", "rts",
                        strict=True).collect()}
    assert strict == {(1, TS(2024, 1, 1, 10)): 100.0,
                      (1, TS(2024, 1, 1, 12)): 200.0,
                      (4, TS(2024, 1, 1, 10)): 1.0}  # ties excluded

    fwd = {(r.k, r.ts): r.v for r in
           asof_join(left, right, ["k"], "ts", "rts",
                     "forward").collect()}
    assert fwd == {(1, TS(2024, 1, 1, 10)): 200.0,
                   (2, TS(2024, 1, 1, 9)): 300.0,
                   (3, TS(2024, 1, 1, 9)): 1.0,
                   (4, TS(2024, 1, 1, 10)): 2.0}     # 12:00 has no next

    outer = {(r.k, r.ts): r.v for r in
             asof_join(left, right, ["k"], "ts", "rts",
                       how="left").collect()}
    assert outer[(9, TS(2024, 1, 1))] is None and len(outer) == 6


def test_any_join_picks_first_by_order(spark):
    left = spark.createDataFrame([(1,)], "k int")
    right = spark.createDataFrame([(1, 5), (1, 3), (1, 9)], "k int, v int")
    out = any_join(left, right, ["k"], order_by=["v"]).collect()
    assert len(out) == 1 and out[0].v == 3


def test_paste_join_zips_to_shorter(spark):
    a = spark.createDataFrame([(i,) for i in range(5)], "x int")
    b = spark.createDataFrame([(chr(97 + i),) for i in range(3)], "y string")
    out = paste_join(a, b, ["x"], ["y"]).orderBy("x").collect()
    assert [(r.x, r.y) for r in out] == [(0, "a"), (1, "b"), (2, "c")]


def test_limit_by_with_offset(spark):
    df = spark.createDataFrame([(1, i) for i in range(5)] + [(2, 0)], "k int, v int")
    out = limit_by(df, 2, ["k"], ["v"], offset=1)
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(1, 1), (1, 2)]  # group 2 has no row past the offset


def test_top_k_per_group(spark):
    df = spark.createDataFrame([("a", 1), ("a", 3), ("a", 2), ("b", 9)], "g string, v int")
    out = top_k_per_group(df, 2, ["g"], "v")
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 9)]


def test_final_dedup_latest_version_wins(spark):
    df = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 1, "only")], "k int, ver int, val string")
    out = final_dedup(df, ["k"], "ver")
    got = {r.k: r.val for r in out.collect()}
    assert got == {1: "new", 2: "only"}


def test_sum_map_assembled(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1.0, "b": 2.0}), (1, {"b": 3.0, "c": 4.0})],
        "k int, m map<string,double>")
    out = sum_map(df, ["k"], "m").collect()
    assert out[0]["sum_m"] == {"a": 1.0, "b": 5.0, "c": 4.0}


def test_with_totals_adds_grand_total(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, v int")
    out = with_totals(df, ["g"], {"s": F.sum("v")})
    rows = {r.g: r.s for r in out.collect()}
    assert rows == {"a": 1, "b": 2, None: 3}


def test_with_fill_interpolates(spark):
    df = spark.createDataFrame([(1, 10.0), (4, 40.0)], "k int, v double")
    out = with_fill(df, "k", 1, 5, 1, carry_forward=["v"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 10.0, 2: 10.0, 3: 10.0, 4: 40.0, 5: 40.0}


def test_limit_with_ties(spark):
    df = spark.createDataFrame([(v,) for v in [1, 1, 2, 2, 3]], "v int")
    out = limit_with_ties(df, 3, ["v"])
    assert sorted(r.v for r in out.collect()) == [1, 1, 2, 2]


def test_delta_sum_positive_only(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 15.0), (1, 3, 5.0), (1, 4, 8.0)],
        "k int, t int, v double")
    out = delta_sum(df, ["k"], "t", "v").collect()
    assert out[0].delta_sum == 8.0  # +5 (10→15) +3 (5→8)


def test_bitmap_algebra(spark):
    from clickhouse_clickhouse_spark.operators import bitmap as B

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4)],
        "g string, v long")
    bm = df.groupBy("g").agg(B.group_bitmap_state("v").alias("bm"))
    a = bm.filter("g = 'a'").select(F.col("bm").alias("a"))
    b = bm.filter("g = 'b'").select(F.col("bm").alias("b"))
    row = (a.crossJoin(b)
           .select(B.bitmap_and(F.col("a"), F.col("b")).alias("and_"),
                   B.bitmap_or(F.col("a"), F.col("b")).alias("or_"),
                   B.bitmap_xor(F.col("a"), F.col("b")).alias("xor_"),
                   B.bitmap_andnot(F.col("a"), F.col("b")).alias("andnot"),
                   B.bitmap_has_all(F.col("a"), F.col("b")).alias("hasall"),
                   B.bitmap_has_any(F.col("a"), F.col("b")).alias("hasany"),
                   B.bitmap_subset_in_range(F.col("a"), 2, 4).alias("rng"))
           .collect()[0])
    assert row.and_ == [2, 3] and row.or_ == [1, 2, 3, 4]
    assert row.xor_ == [1, 4] and row.andnot == [1]
    assert row.hasall is False and row.hasany is True
    assert row.rng == [2, 3]


def test_group_bitmap_and_cross_groups(spark):
    from clickhouse_clickhouse_spark.operators.bitmap import group_bitmap_and

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3), ("c", 2), ("c", 1)],
        "g string, v long")
    assert group_bitmap_and(df, "g", "v").collect()[0].and_cardinality == 1


def test_map_combinator_avg_and_assembled(spark):
    """The generic -Map combinator: avg path with exact literals, and
    the assembled (key-sorted map) output form."""
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.operators.aggregates import map_combinator

    df = spark.createDataFrame(
        [(1, {"a": 2.0, "b": 10.0}), (1, {"a": 4.0}), (2, {"b": 1.0})],
        "g long, m map<string,double>")
    # ONE action: the three variants join on g (suite-wall pattern)
    rows = (map_combinator(df, ["g"], "m", "avg", assemble=False)
            .groupBy("g")
            .agg(F.map_from_entries(F.sort_array(F.collect_list(
                F.struct("map_key", "map_value")))).alias("flat"))
            .join(map_combinator(df, ["g"], "m", "avg"), "g")
            .join(map_combinator(df, ["g"], "m", "count"), "g")
            .collect())
    flat = {(r.g, k): v for r in rows for k, v in r.flat.items()}
    assert flat == {(1, "a"): 3.0, (1, "b"): 10.0, (2, "b"): 1.0}
    assert {r.g: r.avg_m for r in rows} == \
        {1: {"a": 3.0, "b": 10.0}, 2: {"b": 1.0}}
    assert {r.g: r.count_m for r in rows} == \
        {1: {"a": 2, "b": 1}, 2: {"b": 1}}


def test_exp_time_decayed_family_vs_bruteforce(spark):
    """decayed count/avg/max must equal the O(n^2) direct computation,
    including across an epoch boundary (span > 500*tau)."""
    import math

    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.operators.advanced import (
        exp_time_decayed_avg, exp_time_decayed_count, exp_time_decayed_max,
    )

    tau = 1.0
    # times cross the 500s epoch boundary; values include a big early max
    pts = [(0.0, 9.0), (1.0, 2.0), (499.5, 5.0), (500.5, 1.0), (502.0, 3.0)]
    rows = [(1, float(t), float(v)) for t, v in pts]
    df = spark.createDataFrame(rows, "k long, ts double, v double")

    # ONE action: the three variants join on ts (suite-wall pattern)
    rows = (exp_time_decayed_count(df, ["k"], "ts", tau)
            .select("ts", "decayed_count")
            .join(exp_time_decayed_avg(df, ["k"], "ts", "v", tau)
                  .select("ts", "decayed_avg"), "ts")
            .join(exp_time_decayed_max(df, ["k"], "ts", "v", tau)
                  .select("ts", "decayed_max"), "ts")
            .collect())
    got_c = {r.ts: r.decayed_count for r in rows}
    got_a = {r.ts: r.decayed_avg for r in rows}
    got_m = {r.ts: r.decayed_max for r in rows}
    for t, _ in pts:
        cnt = sum(math.exp(-(t - ti)) for ti, _ in pts if ti <= t)
        sm = sum(vi * math.exp(-(t - ti)) for ti, vi in pts if ti <= t)
        mx = max(vi * math.exp(-(t - ti)) for ti, vi in pts if ti <= t)
        assert abs(got_c[t] - cnt) < 1e-9 * max(cnt, 1)
        assert abs(got_a[t] - sm / cnt) < 1e-9 * max(abs(sm / cnt), 1)
        assert abs(got_m[t] - mx) < 1e-9 * max(abs(mx), 1)


def test_sparkbar_buckets_condense_x_range(spark):
    """sparkbar(width)(x, y): the x range condenses into `buckets`
    equi-width segments (round-5 advice fix — the parameter is real),
    empty segments render as spaces."""
    from clickhouse_clickhouse_spark.operators.aggregates import sparkbar

    # 16 x positions into 4 buckets: idx = x*4//16 = x//4; per-bucket
    # totals 4,8,12,16 -> glyphs 2,4,6,8 of the 8-block ramp
    rows = [("g", x, 1.0 + (x // 4)) for x in range(16)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    bar = sparkbar(df, ["g"], "x", "y", buckets=4).collect()[0]["bar"]
    assert bar == "▂▄▆█"
    # occupancy gaps: only the first and last segment have data
    df2 = spark.createDataFrame([("g", 0, 5.0), ("g", 15, 5.0)],
                                "g string, x int, y double")
    bar2 = sparkbar(df2, ["g"], "x", "y", buckets=4).collect()[0]["bar"]
    assert bar2 == "█  █"


def test_tdigest_state_merge_and_persistence(spark, sf_dir, tmp_path):
    """Round-5 AggregateFunction-parity: t-digest centroid states are
    accurate, mergeable in any split, and survive a parquet write/read
    (the AggregateFunction(quantileTDigest) column storage contract)."""
    import pyspark.sql.functions as F

    from clickhouse_clickhouse_spark.operators.tdigest import (
        quantile_tdigest,
        tdigest_merge_states,
        tdigest_quantile,
        tdigest_quantiles,
        tdigest_state,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    dig = quantile_tdigest(li, ["l_returnflag"], "l_extendedprice",
                           {"p50": 0.5, "p99": 0.99})
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("e99"),
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("rng"))
    for r in dig.join(exact, "l_returnflag").collect():
        assert abs(r.p50 - r.e50) <= 0.01 * r.rng
        assert abs(r.p99 - r.e99) <= 0.02 * r.rng

    # state table: bounded size, parquet round trip, further merge
    st = tdigest_merge_states(
        tdigest_state(li, ["l_returnflag"], "l_extendedprice"),
        ["l_returnflag"])
    rows = st.collect()
    assert all(len(r.td) <= 220 for r in rows)  # ~2x delta hard bound
    p = str(tmp_path / "td")
    st.write.parquet(p)
    back = spark.read.parquet(p)
    again = {r.l_returnflag: r.p50 for r in
             tdigest_quantiles(back, {"p50": 0.5}).collect()}
    direct = {r.l_returnflag: r.p50 for r in
              tdigest_quantiles(st, {"p50": 0.5}).collect()}
    assert again == direct  # storage is lossless over the state
    # driver-side readout of a persisted cell
    one = back.limit(1).collect()[0]
    assert abs(tdigest_quantile(one.td, 0.5) - again[one.l_returnflag]) \
        < 1e-9


def test_bitmap_codec_roundtrip_and_merge(spark, tmp_path):
    """Roaring-style binary bitmap state: codec round trip across both
    container kinds, UInt32 domain enforcement, parquet persistence, and
    merge over serialized states."""
    import numpy as np
    import pyspark.sql.functions as F
    import pytest as _pytest

    from clickhouse_clickhouse_spark.operators.bitmap import (
        _deserialize_one,
        _serialize_one,
        bitmap_cardinality_serialized,
        bitmap_deserialize,
        bitmap_merge_serialized,
        bitmap_serialize,
        group_bitmap_state,
    )

    # array containers, bitset container, container boundary crossing
    rng = np.random.default_rng(7)
    sparse = rng.choice(1 << 22, size=500, replace=False).tolist()
    dense = list(range(3 << 16, (3 << 16) + 9000))  # one bitset container
    for vals in ([], [0], [0xFFFFFFFF], sparse, dense, sparse + dense):
        assert _deserialize_one(_serialize_one(vals)) == sorted(set(vals))
    b = _serialize_one(dense)
    assert len(b) < 2 * len(dense)  # bitset kind actually engaged
    with _pytest.raises(ValueError, match="UInt32"):
        _serialize_one([1 << 33])

    df = spark.createDataFrame(
        [("a", int(v)) for v in sparse[:100]]
        + [("b", int(v)) for v in dense[:5000]], "g string, v long")
    st = (df.groupBy("g", (F.col("v") % 3).alias("shard"))
          .agg(group_bitmap_state("v").alias("bm"))
          .select("g", bitmap_serialize("bm").alias("bin")))
    p = str(tmp_path / "bm")
    st.write.parquet(p)
    merged = bitmap_merge_serialized(spark.read.parquet(p), ["g"], "bin")
    got = {r.g: (r.card, r.arr) for r in
           merged.select(
               "g", bitmap_cardinality_serialized("bin").alias("card"),
               bitmap_deserialize("bin").alias("arr")).collect()}
    assert got["a"] == (100, sorted(set(sparse[:100])))
    assert got["b"] == (5000, sorted(set(dense[:5000])))


def test_quantile_timing_grid_and_nearest_rank(spark):
    """quantileTiming quantization: exact <1024, 16ms buckets to 30s,
    clamped at 30000; nearest-rank pick (first cum > floor(level*N))."""
    from clickhouse_clickhouse_spark.operators.aggregates import (
        quantile_timing,
    )

    vals = [-5.0, 3.7, 100.0, 1023.9, 1030.0, 2000.5, 29999.0, 45000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    out = quantile_timing(df, ["k"], "v",
                          {"p0": 0.0, "p50": 0.5, "p100": 0.99}).collect()[0]
    # quantized multiset: [0, 3, 100, 1023, 1024, 2000, 29984, 30000]
    # (2000.5 -> floor(2000.5/16)*16 = 1996? no: floor(125.03)*16 = 2000)
    assert out.p0 == 0          # rank floor(0*8)+1 = 1 -> smallest
    assert out.p50 == 1024      # rank floor(4)+1 = 5 -> 5th smallest
    assert out.p100 == 30000    # rank floor(7.92)+1 = 8 -> largest


def test_quantile_timing_weighted_expansion_equivalence(spark):
    """Weighted nearest-rank == unweighted over the weight-expanded
    multiset."""
    from clickhouse_clickhouse_spark.operators.aggregates import (
        quantile_timing, quantile_timing_weighted,
    )

    rows = [("g", 10.0, 3), ("g", 500.0, 1), ("g", 2000.0, 2),
            ("g", 40000.0, 1)]
    df = spark.createDataFrame(rows, "k string, v double, w int")
    expanded = spark.createDataFrame(
        [("g", v) for _, v, w in rows for _ in range(w)],
        "k string, v double")
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9}
    a = quantile_timing_weighted(df, ["k"], "v", "w", qs).collect()[0]
    b = quantile_timing(expanded, ["k"], "v", qs).collect()[0]
    assert (a.p25, a.p50, a.p90) == (b.p25, b.p50, b.p90)
