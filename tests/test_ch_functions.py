"""Smoke the CH-named function namespace: every exported name builds a
valid Column and a sample evaluates correctly."""

import datetime

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark import ch_functions as ch


def test_ch_names_evaluate(spark):
    df = spark.createDataFrame(
        [(5, -2.7, "Hello World", [3.0, 1.0, 2.0],
          datetime.datetime(2024, 3, 5, 10, 30), '{"k": 7}')],
        "i long, d double, s string, a array<double>, ts timestamp, j string")
    row = df.select(
        ch.plus("i", F.lit(2)).alias("plus"),
        ch.abs_("d").alias("abs"),
        ch.roundBankers(F.lit(2.5), 0).alias("bankers"),
        ch.if_(F.col("i") > 3, F.lit("y"), F.lit("n")).alias("iff"),
        ch.multiIf(F.col("i") > 10, F.lit("a"), F.col("i") > 3, F.lit("b"),
                   F.lit("c")).alias("mif"),
        ch.position("s", "World").alias("pos"),
        ch.replaceOne("s", "l", "L").alias("rep1"),
        ch.replaceAll("s", "l", "L").alias("repall"),
        ch.splitByChar(" ", "s").alias("split"),
        ch.toStartOfMonth("ts").alias("som"),
        ch.toDayOfWeek("ts").alias("dow"),
        ch.formatDateTime("ts", "%Y-%m-%d").alias("fmt"),
        ch.arraySort("a").alias("asort"),
        ch.arraySum("a").alias("asum"),
        ch.hasAll("a", F.array(F.lit(1.0), F.lit(3.0))).alias("hasall"),
        ch.arrayMap(lambda x: x * 2, "a").alias("amap"),
        ch.JSONExtractInt("j", "$.k").alias("jint"),
        ch.sigmoid(F.lit(0.0)).alias("sig"),
        ch.dotProduct("a", "a").alias("dot"),
        ch.toDayOfWeek(F.lit("2024-03-04").cast("date")).alias("monday"),
    ).collect()[0]
    assert row.plus == 7
    assert row.abs == 2.7
    assert row.bankers == 2.0          # half-to-even
    assert row.iff == "y" and row.mif == "b"
    assert row.pos == 7
    assert row.rep1 == "HeLlo World"
    assert row.repall == "HeLLo WorLd"
    assert row.split == ["Hello", "World"]
    assert row.som == datetime.datetime(2024, 3, 1)
    assert row.dow == 2                # Tuesday, CH Mon=1
    assert row.fmt == "2024-03-05"
    assert row.asort == [1.0, 2.0, 3.0]
    assert row.asum == 6.0
    assert row.hasall
    assert row.amap == [6.0, 2.0, 4.0]
    assert row.jint == 7
    assert row.sig == 0.5
    assert row.dot == 14.0
    assert row.monday == 1


def test_ch_aggregates(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)],
                               "g string, v double")
    out = {r.g: r for r in df.groupBy("g").agg(
        ch.count().alias("n"),
        ch.uniqExact("v").alias("u"),
        ch.argMax("v", "v").alias("am"),
        ch.quantileExact("v", 0.5).alias("med")).collect()}
    assert out["a"].n == 2 and out["a"].u == 2
    assert out["a"].am == 3.0 and out["a"].med == 2.0


def test_round2_longtail_functions(spark):
    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame(
        [(12, 18, {"a": 1}, {"a": 2, "b": 5})],
        "x long, y long, m1 map<string,int>, m2 map<string,int>")
    r = df.select(
        ch.gcd("x", "y").alias("g"), ch.lcm("x", "y").alias("l"),
        ch.bitHammingDistance("x", "y").alias("h"),
        ch.roundToExp2(F.lit(1000)).alias("e2"),
        ch.roundDuration(F.lit(125)).alias("dur"),
        ch.roundAge(F.lit(40)).alias("age"),
        ch.mapAdd("m1", "m2").alias("ma"),
        ch.accurateCastOrNull(F.lit("xx"), "int").alias("bad_cast"),
    ).collect()[0]
    assert (r.g, r.l) == (6, 36)
    assert r.h == bin(12 ^ 18).count("1")
    assert r.e2 == 512 and r.dur == 120 and r.age == 35
    assert r.ma == {"a": 3, "b": 5}
    assert r.bad_cast is None


def test_murmurhash2_64_pinned():
    """MurmurHash2 64A implementation pinned by regression vectors
    (public Appleby algorithm, seed 0)."""
    from clickhouse_clickhouse_spark.functions.hashing import (
        murmurhash2_64_py,
    )

    assert murmurhash2_64_py(b"hello") == 0x1E68D17C457BF117
    assert murmurhash2_64_py(b"") == 0
    # determinism + 8-byte-boundary coverage
    assert murmurhash2_64_py(b"12345678") == murmurhash2_64_py(b"12345678")
    assert murmurhash2_64_py(b"12345678") != murmurhash2_64_py(b"12345679")


def test_jaro_winkler_matches_duckdb():
    import duckdb

    from clickhouse_clickhouse_spark.functions.hashing import jaro_winkler_py

    pairs = [("martha", "marhta"), ("dixon", "dicksonx"), ("old ring", "Brand#20"),
             ("jellyfish", "smellyfish"), ("", ""), ("abc", ""), ("x", "x")]
    for a, b in pairs:
        want = duckdb.sql(
            f"select jaro_winkler_similarity('{a}','{b}')").fetchone()[0]
        assert abs(jaro_winkler_py(a, b) - want) < 1e-12, (a, b)


def test_round2_batch2_functions(spark):
    import datetime

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], 21, "2024-03-05 10:34:56")],
        "arr array<double>, mask long, s string")
    r = df.select(
        ch.arrayCumSum("arr").alias("cs"),
        ch.arrayDifference("arr").alias("ad"),
        ch.bitmaskToList("mask").alias("bm"),
        ch.toStartOfFiveMinutes(ch.parseDateTimeBestEffort("s")).alias("t5"),
        ch.timeSlot(ch.parseDateTimeBestEffort("s")).alias("slot"),
        ch.parseDateTimeBestEffort(F.lit("05.03.2024")).alias("de"),
    ).collect()[0]
    assert r.cs == [1.0, 3.0, 6.0]
    assert r.ad == [0.0, 1.0, 1.0]
    assert r.bm == "1,4,16"
    assert r.t5 == datetime.datetime(2024, 3, 5, 10, 30)
    assert r.slot == datetime.datetime(2024, 3, 5, 10, 30)
    assert r.de == datetime.datetime(2024, 3, 5)
    agg = df.select(F.explode("arr").alias("x")) \
            .agg(ch.sumCount("x").alias("sc")).collect()[0].sc
    assert (agg["sum"], agg["count"]) == (6.0, 3)


def test_running_difference_and_derivative(spark):
    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 10, 16.0), (1, 20, 4.0), (2, 0, 5.0)],
        "k int, t long, v double")
    out = {(r.k, r.t): (r.rd, r.nnd) for r in df.select(
        "k", "t",
        ch.runningDifference("v", ["t"], partition_by=["k"]).alias("rd"),
        ch.nonNegativeDerivative("v", "t", partition_by=["k"]).alias("nnd"),
    ).collect()}
    assert out[(1, 0)] == (0.0, None)
    assert out[(1, 10)] == (6.0, 0.6)
    assert out[(1, 20)] == (-12.0, 0.0)   # counter reset clamped
    assert out[(2, 0)] == (0.0, None)


def test_round2c_batch(spark):
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame(
        [(1, "a::b::c", "2024-03-15 13:47:21")],
        "id long, s string, t string").withColumn("ts", F.to_timestamp("t"))
    r = df.select(
        ch.splitByString("::", F.col("s")).alias("parts"),
        ch.arrayResize(F.array(F.lit(1), F.lit(2)), 4, 0).alias("resized"),
        ch.arrayResize(F.array(F.lit(1), F.lit(2), F.lit(3)), 2).alias("cut"),
        ch.timeSlots(F.col("ts"), F.lit(3600), 1800).alias("slots"),
        ch.mapFilter(lambda k, v: v > 1,
                     F.create_map(F.lit("a"), F.lit(1),
                                  F.lit("b"), F.lit(2))).alias("mf"),
        ch.mapApply(lambda k, v: v * 10,
                    F.create_map(F.lit("a"), F.lit(1))).alias("ma"),
        ch.addHours(F.col("ts"), 2).alias("plus2h"),
        ch.range_(F.lit(0)).alias("empty_range"),
        ch.arrayWithConstant(F.lit(3), 7).alias("sevens"),
    ).first()
    assert r.parts == ["a", "b", "c"]
    assert r.resized == [1, 2, 0, 0] and r.cut == [1, 2]
    assert [str(x) for x in r.slots] == [
        "2024-03-15 13:30:00", "2024-03-15 14:00:00", "2024-03-15 14:30:00"]
    assert r.mf == {"b": 2} and r.ma == {"a": 10}
    assert str(r.plus2h) == "2024-03-15 15:47:21"
    assert r.empty_range == [] and r.sevens == [7, 7, 7]


def test_array_url_soundex_additions(spark):
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame(
        [("https://www.shop.example.co/cart/item?id=9&x=1", )], "url string")
    r = df.select(
        ch.arrayUnion(F.array(F.lit(1), F.lit(2)),
                      F.array(F.lit(2), F.lit(3))).alias("u"),
        ch.arrayProduct(F.array(F.lit(2), F.lit(3), F.lit(4))).alias("p"),
        ch.hasSubstr(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
                     F.array(F.lit(2), F.lit(3))).alias("h1"),
        ch.hasSubstr(F.array(F.lit(1), F.lit(2), F.lit(3)),
                     F.array(F.lit(3), F.lit(2))).alias("h2"),
        ch.topLevelDomain(F.col("url")).alias("tld"),
        ch.domainWithoutWWW(F.col("url")).alias("dom"),
        ch.pathFull(F.col("url")).alias("pf"),
        ch.soundex(F.lit("Robert")).alias("sx"),
    ).first()
    assert sorted(r.u) == [1, 2, 3] and r.p == 24.0
    assert r.h1 is True and r.h2 is False
    assert r.tld == "co" and r.dom == "shop.example.co"
    assert r.pf == "/cart/item?id=9&x=1" and r.sx == "R163"


def test_array_rotate_shift_map_update(spark):
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    arr = F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))
    df = spark.range(1)
    r = df.select(
        ch.arrayRotateLeft(arr, 1).alias("rl"),
        ch.arrayRotateLeft(arr, 6).alias("rl6"),
        ch.arrayRotateRight(arr, 1).alias("rr"),
        ch.arrayShiftLeft(arr, 2, 0).alias("sl"),
        ch.arrayShiftRight(arr, 2, 0).alias("sr"),
        ch.arrayRotateLeft(F.array().cast("array<int>"), 3).alias("empty"),
        ch.mapUpdate(F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)),
                     F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3)))
          .alias("mu"),
    ).first()
    assert r.rl == [2, 3, 4, 1] and r.rl6 == [3, 4, 1, 2]
    assert r.rr == [4, 1, 2, 3]
    assert r.sl == [3, 4, 0, 0] and r.sr == [0, 0, 1, 2]
    assert r.empty == []
    assert r.mu == {"a": 1, "b": 9, "c": 3}


def test_round5_long_tail_batch(spark):
    """Round-5 ch_functions batch: deterministic results checked by
    value; random/uuid generators by shape and range."""
    import pyspark.sql.functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame([("ab cd-ef", "hello")], "s string, h string")
    r = df.select(
        ch.tokens("s").alias("toks"),
        ch.splitByRegexp(r"\W+", "s").alias("sp"),
        ch.ngrams("h", 3).alias("ng"),
        ch.multiSearchAny("h", ["xyz", "ell"]).alias("any1"),
        ch.multiSearchAny("h", ["xyz", "zzz"]).alias("any2"),
        ch.countSubstrings("h", "l").alias("cs"),
        ch.translateUTF8("h", "lo", "LO").alias("tr"),
        ch.arrayJaccardIndex(F.array(F.lit(1), F.lit(2)),
                             F.array(F.lit(2), F.lit(3))).alias("jac"),
        ch.toModifiedJulianDay(F.lit("1995-01-01").cast("date")).alias("mjd"),
        ch.fromModifiedJulianDay(F.lit(49718)).alias("back"),
        ch.JSONArrayLength(F.lit('[1,2,3]')).alias("jl"),
        ch.normalizeQuery(F.lit("k = 42 AND s = 'x'")).alias("nq"),
        ch.normalizedQueryHash(F.lit("k = 42")).alias("nqh1"),
        ch.normalizedQueryHash(F.lit("k = 777")).alias("nqh2"),
    ).collect()[0]
    assert r.toks == ["ab", "cd", "ef"]
    assert r.sp == ["ab", "cd", "ef"]
    assert r.ng == ["hel", "ell", "llo"]
    assert r.any1 is True and r.any2 is False
    assert r.cs == 2
    assert r.tr == "heLLO"
    assert abs(r.jac - 1 / 3) < 1e-9
    assert r.mjd == 49718
    assert str(r.back) == "1995-01-01"
    assert r.jl == 3
    assert r.nq == "k = ? AND s = ?"
    assert r.nqh1 == r.nqh2  # same normalized form -> same hash

    import re as _re
    rows = spark.range(200).select(
        ch.generateUUIDv4().alias("u"),
        ch.randUniform(5.0, 6.0).alias("ru"),
        ch.randNormal(10.0, 0.001).alias("rn"),
        ch.randExponential(1000.0).alias("re"),
        ch.arrayShuffle(F.sequence(F.lit(1), F.lit(5))).alias("sh")).collect()
    assert len({r.u for r in rows}) == 200
    assert all(_re.fullmatch(r"[0-9a-f-]{36}", r.u) for r in rows)
    assert all(5.0 <= r.ru < 6.0 for r in rows)
    assert all(9.9 < r.rn < 10.1 for r in rows)
    assert all(r.re >= 0 for r in rows)
    assert all(sorted(r.sh) == [1, 2, 3, 4, 5] for r in rows)

    from pyspark.sql import Window
    w = Window.partitionBy(F.lit(0)).orderBy("id")
    lr = spark.range(3).select(
        F.col("id"), ch.lagInFrame("id").over(w).alias("lg"),
        ch.leadInFrame("id").over(w).alias("ld"),
        ch.nthValue("id", 2).over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)).alias("nv")).collect()
    assert [(r.lg, r.ld, r.nv) for r in sorted(lr, key=lambda r: r.id)] == \
        [(None, 1, 1), (0, 2, 1), (1, None, 1)]


def test_round5_small_batch2(spark):
    import pyspark.sql.functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame([("the quick brown fox",)], "s string")
    r = df.select(
        ch.toDecimalString(F.lit(1234.5678), 2).alias("d"),
        ch.toDecimalString(F.lit(-0.125), 1).alias("dn"),
        F.size(ch.arrayRandomSample(
            F.sequence(F.lit(1), F.lit(10)), 3)).alias("k"),
        ch.multiSearchFirstIndex("s", ["fox", "quick", "zzz"]).alias("i1"),
        ch.multiSearchFirstIndex("s", ["zzz"]).alias("i0")).collect()[0]
    assert (r.d, r.dn, r.k, r.i1, r.i0) == \
        ("1234.57", "-0.1", 3, 2, 0)


def test_round5_late_batch_arrays_json_regex(spark):
    import pyspark.sql.functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame([(1,)], "i int")
    r = df.select(
        # CH docs example: arrayAUC([0.1,0.4,0.35,0.8],[0,0,1,1]) = 0.75
        ch.arrayAUC(F.array(F.lit(0.1), F.lit(0.4), F.lit(0.35), F.lit(0.8)),
                    F.array(F.lit(0), F.lit(0), F.lit(1), F.lit(1))).alias("auc"),
        ch.arrayFill(lambda x: x > 0,
                     F.array(*[F.lit(v) for v in (1, 0, 0, 5, 0)])).alias("fl"),
        ch.arrayReverseFill(lambda x: x > 0,
                            F.array(*[F.lit(v) for v in (0, 2, 0)])).alias("rf"),
        ch.arraySplit(lambda x: x == 1,
                      F.array(*[F.lit(v) for v in (1, 2, 3, 1, 5)])).alias("sp"),
        ch.arrayPartialSort(2, F.array(*[F.lit(v) for v in (3, 1, 2)])).alias("ps"),
        ch.JSONExtractKeys(F.lit('{"a":1,"b":2}')).alias("jk"),
        ch.JSONExtractArrayRaw(F.lit('[1,"a",{"b":2}]')).alias("jr"),
        ch.simpleJSONExtractInt(F.lit('{"n":"7"}'), "n").alias("sj"),
        ch.extractGroups(F.lit("k=v"), r"(\w+)=(\w+)").alias("eg"),
        ch.extractAllGroupsVertical(F.lit("a=1, b=2"),
                                    r"(\w+)=(\w+)").alias("egv"),
        ch.extractAllGroupsHorizontal(F.lit("a=1, b=2"),
                                      r"(\w+)=(\w+)").alias("egh"),
        ch.multiSearchAllPositions(F.lit("hello world"),
                                   ["wor", "xx", "hello"]).alias("msap"),
    ).collect()[0]
    assert abs(r.auc - 0.75) < 1e-9
    assert r.fl == [1, 1, 1, 5, 5] and r.rf == [2, 2, 0]
    assert r.sp == [[1, 2, 3], [1, 5]] and r.ps == [1, 2, 3]
    assert r.jk == ["a", "b"] and r.jr == ["1", "a", '{"b":2}']
    assert r.sj == 7 and r.eg == ["k", "v"]
    assert r.egv == [["a", "1"], ["b", "2"]]
    assert r.egh == [["a", "b"], ["1", "2"]]
    assert r.msap == [7, 0, 1]


def test_round5_late_batch_maps_urls_encodings(spark):
    import pyspark.sql.functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.createDataFrame([(1,)], "i int")
    uuid = "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
    r = df.select(
        ch.mapPopulateSeries(F.create_map(
            F.lit(1), F.lit(10).cast("long"),
            F.lit(4), F.lit(40).cast("long"))).alias("mps"),
        ch.mapContainsKeyLike(F.create_map(F.lit("abc"), F.lit(1)),
                              "a%").alias("mk"),
        F.map_keys(ch.mapExtractKeyLike(
            F.create_map(F.lit("ax"), F.lit(1), F.lit("bx"), F.lit(2)),
            "a%")).alias("mek"),
        ch.subBitmap(F.array(*[F.lit(v) for v in (1, 3, 5, 7)]),
                     1, 2).alias("sb"),
        ch.bitmapTransform(F.array(*[F.lit(v) for v in (1, 3, 5)]),
                           [3], [9]).alias("bt"),
        ch.greatCircleAngle(F.lit(0.0), F.lit(0.0), F.lit(90.0),
                            F.lit(0.0)).alias("gca"),
        ch.pointInEllipses(F.lit(1.0), F.lit(0.0), 0, 0, 2, 1).alias("pe_in"),
        ch.pointInEllipses(F.lit(3.0), F.lit(0.0), 0, 0, 2, 1).alias("pe_out"),
        ch.UUIDNumToString(ch.UUIDStringToNum(F.lit(uuid))).alias("uu"),
        ch.isIPv4String(F.lit("1.2.3.255")).alias("p4"),
        ch.isIPv4String(F.lit("1.2.3.256")).alias("p4b"),
        ch.isIPv6String(F.lit("2001:db8::1")).alias("p6"),
        ch.isIPv6String(F.lit("nope")).alias("p6b"),
        ch.firstSignificantSubdomain(
            F.lit("https://a.b.clickhouse.com/x")).alias("fss"),
        ch.cutToFirstSignificantSubdomain(
            F.lit("https://sub.example.co.uk/x")).alias("cfss"),
        ch.queryStringAndFragment(F.lit("http://x.com/p?a=1#f")).alias("qsf"),
        ch.decodeXMLComponent(ch.encodeXMLComponent(
            F.lit('<a href="x">&\'</a>'))).alias("xml"),
        ch.decodeHTMLComponent(F.lit("a&nbsp;&lt;b&gt;&amp;c")).alias("html"),
        ch.tryBase64Decode(F.lit("aGVsbG8=")).alias("b ok").alias("bok"),
        ch.tryBase64Decode(F.lit("!!bad")).alias("bbad"),
        ch.base64URLEncode(F.lit("https://clickhouse.com")).alias("burl"),
        ch.base64URLDecode(ch.base64URLEncode(
            F.lit("https://clickhouse.com?a=b"))).alias("brt"),
        ch.javaHash(F.lit("abc")).alias("jh"),
        ch.hiveHash(F.lit("abc")).alias("hh"),
        ch.javaHash(F.lit("")).alias("jh0"),
        ch.formatReadableQuantity(F.lit(123456789)).alias("frq"),
        ch.toUnixTimestamp64Milli(
            F.lit("2024-01-01 00:00:01").cast("timestamp")).alias("ms"),
        ch.fromUnixTimestamp64Milli(F.lit(1704067201000)).alias("fms"),
        ch.toDaysSinceYearZero(F.lit("0001-01-01").cast("date")).alias("d0"),
    ).collect()[0]
    assert r.mps == {1: 10, 2: 0, 3: 0, 4: 40} and r.mk and r.mek == ["ax"]
    assert r.sb == [3, 5] and r.bt == [1, 5, 9]
    assert abs(r.gca - 90.0) < 1e-9 and r.pe_in and not r.pe_out
    assert r.uu == uuid
    assert (r.p4, r.p4b, r.p6, r.p6b) == (True, False, True, False)
    assert r.fss == "clickhouse" and r.cfss == "example.co.uk"
    assert r.qsf == "a=1#f"
    assert r.xml == '<a href="x">&\'</a>' and r.html == "a <b>&c"
    assert r.bok == "hello" and r.bbad == ""
    # CH docs example: unpadded URL-safe output
    assert r.burl == "aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ"
    assert r.brt == "https://clickhouse.com?a=b"
    # java.lang.String.hashCode("abc") == 96354; hash("") == 0
    assert r.jh == 96354 and r.hh == 96354 and r.jh0 == 0
    assert r.frq == "123.46 million"
    assert r.ms == 1704067201000 and str(r.fms) == "2024-01-01 00:00:01"
    assert r.d0 == 366


def test_erf_normal_cdf_and_z_tests(spark):
    import math

    import pyspark.sql.functions as F
    import pytest

    from clickhouse_clickhouse_spark import ch_functions as ch
    from clickhouse_clickhouse_spark.operators.advanced import mean_z_test

    r = spark.range(1).select(
        ch.erf(F.lit(1.0)).alias("e1"),
        ch.erfc(F.lit(0.5)).alias("ec"),
        ch.normalCDF(F.lit(0.0)).alias("n0"),
        ch.normalCDF(F.lit(1.959963984540054)).alias("n95"),
        ch.proportionsZTest(F.lit(45), F.lit(100), F.lit(30),
                            F.lit(100)).alias("pz")).collect()[0]
    assert abs(r.e1 - math.erf(1.0)) < 2e-7
    assert abs(r.ec - math.erfc(0.5)) < 2e-7
    assert abs(r.n0 - 0.5) < 1e-9 and abs(r.n95 - 0.975) < 1e-6
    # standard two-proportion example: 45/100 vs 30/100 -> z≈2.19, p≈0.028
    assert abs(r.pz.z_stat - 2.1908902) < 1e-5
    assert abs(r.pz.p_value - 0.0284596) < 1e-5

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4, 5)]
        + [("b", float(v)) for v in (6, 7, 8, 9, 10)], "g string, v double")
    out = mean_z_test(df, "v", "g", "a", "b", 2.5, 2.5).collect()[0]
    # diff=-5, se=1 -> z=-5, p≈5.7e-7 (polynomial floors near zero)
    assert abs(out.z_stat + 5.0) < 1e-9
    assert out.p_value < 1e-5
    assert abs(out.ci_low - (-5 - 1.959963984540054)) < 1e-5
    assert abs(out.ci_high - (-5 + 1.959963984540054)) < 1e-5
    with pytest.raises(ValueError):
        mean_z_test(df, "v", "g", "a", "b", 1.0, 1.0, confidence=0.8)


def test_round5_batch3_dates_arrays_strings(spark):
    import pyspark.sql.functions as F

    from clickhouse_clickhouse_spark import ch_functions as ch

    df = spark.range(1)
    r = df.select(
        ch.toISOYear(F.lit("2021-01-01").cast("date")).alias("iy"),
        ch.toStartOfISOYear(F.lit("2021-06-15").cast("date")).alias("isoy"),
        ch.toYearWeek(F.lit("2024-03-15").cast("date"), 3).alias("yw"),
        ch.makeDate(F.lit(2024), F.lit(2), F.lit(29)).alias("md"),
        ch.makeDateTime(F.lit(2024), F.lit(1), F.lit(2), F.lit(3),
                        F.lit(4), F.lit(5)).alias("mdt"),
        ch.YYYYMMDDToDate(F.lit(20240131)).alias("ymd"),
        ch.toYYYYMMDDhhmmss(
            F.lit("2024-01-02 03:04:05").cast("timestamp")).alias("t14"),
        (F.lit("2024-01-01").cast("date")
         + ch.toIntervalDay(F.lit(30))).alias("p30"),
        ch.roundDown(F.lit(17), [0, 10, 20, 30]).alias("rd"),
        ch.roundDown(F.lit(-5), [0, 10]).alias("rdl"),
        ch.bitRotateLeft(F.lit(1), 63).alias("brl"),
        ch.bitRotateRight(F.lit(1), 1).alias("brr"),
        ch.countEqual(F.array(F.lit(1), F.lit(2), F.lit(1)), 1).alias("ce"),
        ch.arrayFirst(lambda x: x > 1,
                      F.array(F.lit(1), F.lit(2), F.lit(3))).alias("af"),
        ch.arrayFirstIndex(lambda x: x > 9,
                           F.array(F.lit(1), F.lit(2))).alias("afi0"),
        ch.arrayLastIndex(lambda x: x > 1,
                          F.array(F.lit(1), F.lit(2), F.lit(3))).alias("ali"),
        ch.arrayCumSumNonNegative(
            F.array(F.lit(1), F.lit(-3), F.lit(2))).alias("acs"),
        ch.rightUTF8(F.lit("hello"), 3).alias("r3"),
        ch.locate(F.lit("lo"), F.lit("hello")).alias("loc"),
        ch.appendTrailingCharIfAbsent(F.lit("dir"), "/").alias("atc"),
        ch.appendTrailingCharIfAbsent(F.lit("dir/"), "/").alias("atc2"),
        ch.toStringCutToZero(ch.toFixedString(F.lit("ab"), 5)).alias("fxz"),
        ch.replaceRegexpOne(F.lit("a1b2c3"), r"\d", "X").alias("rro"),
        ch.replaceRegexpOne(F.lit("abc"), r"\d", "X").alias("rro0"),
        ch.splitByWhitespace(F.lit(" a  b c ")).alias("sbw"),
        ch.alphaTokens(F.lit("abc1def's")).alias("at"),
        ch.normalizeUTF8NFD(ch.normalizeUTF8NFC(F.lit("café"))).alias("nfd"),
        ch.notLike(F.lit("abc"), "a%").alias("nl"),
    ).collect()[0]
    assert r.iy == 2020 and str(r.isoy) == "2021-01-04"
    assert r.yw == 202411
    assert str(r.md) == "2024-02-29" and str(r.mdt) == "2024-01-02 03:04:05"
    assert str(r.ymd) == "2024-01-31" and r.t14 == 20240102030405
    assert str(r.p30) == "2024-01-31 00:00:00"
    assert r.rd == 10 and r.rdl == 0
    assert r.brl == -(2 ** 63) and r.brr == -(2 ** 63)
    assert r.ce == 2 and r.af == 2 and r.afi0 == 0 and r.ali == 3
    assert r.acs == [1.0, 0.0, 2.0]
    assert r.r3 == "llo" and r.loc == 4
    assert r.atc == "dir/" and r.atc2 == "dir/"
    assert r.fxz == "ab"
    assert r.rro == "aXb2c3" and r.rro0 == "abc"
    assert r.sbw == ["a", "b", "c"] and r.at == ["abc", "def", "s"]
    assert len(r.nfd) == 5 and not r.nl  # NFD decomposes the accent


def test_normal_quantile_acklam(spark):
    # published z-values (|rel err| < 1.15e-9 per Acklam)
    import clickhouse_clickhouse_spark.ch_functions as ch
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        ch.normalQuantile(0.975).alias("z975"),
        ch.normalQuantile(0.8).alias("z80"),
        ch.normalQuantile(0.5).alias("z50"),
        ch.normalQuantile(0.01).alias("z01"),
        ch.normalQuantile(0.99).alias("z99"),
        ch.normalQuantile(F.lit(1.5)).alias("oob"),
    ).collect()[0]
    assert abs(row.z975 - 1.959963985) < 1e-6
    assert abs(row.z80 - 0.841621234) < 1e-6
    assert abs(row.z50) < 1e-9
    assert abs(row.z01 + 2.326347874) < 1e-6
    assert abs(row.z99 - 2.326347874) < 1e-6
    assert row.oob is None


def test_min_sample_size_planners(spark):
    import math

    import clickhouse_clickhouse_spark.ch_functions as ch

    row = spark.range(1).select(
        ch.minSampleSizeConversion(0.25, 0.03).alias("c"),
        ch.minSampleSizeContinous(100.0, 20.0, 0.05).alias("m"),
    ).collect()[0]
    # independent python computation with the published z constants
    z = 1.959963985 + 0.841621234
    p1, p2, mde = 0.25, 0.28, 0.03
    n_conv = z * z * (p1 * (1 - p1) + p2 * (1 - p2)) / (mde * mde)
    assert math.isclose(row.c.minimum_sample_size, n_conv, rel_tol=1e-6)
    assert math.isclose(row.c.detect_range_lower, 0.22, rel_tol=1e-9)
    assert math.isclose(row.c.detect_range_upper, 0.28, rel_tol=1e-9)
    n_cont = 2 * z * z * 20.0 ** 2 / (0.05 * 100.0) ** 2
    assert math.isclose(row.m.minimum_sample_size, n_cont, rel_tol=1e-6)
    assert math.isclose(row.m.detect_range_lower, 95.0, rel_tol=1e-9)


def test_vectorized_hashes_bit_parity():
    """Round-8: the numpy-vectorized SipHash-2-4 / MurmurHash2-64A
    batch kernels must be bit-identical to the scalar reference
    implementations on adversarial lengths (0..100 incl. exact 8-byte
    multiples)."""
    import random

    import numpy as np

    from clickhouse_clickhouse_spark.functions.hashing import (
        murmurhash2_64_np,
        murmurhash2_64_py,
        siphash64_np,
        siphash64_py,
    )

    rnd = random.Random(8080)
    cases = [b"", b"a", b"12345678", b"123456789", bytes(range(256))]
    cases += [bytes(rnd.randrange(256) for _ in range(n))
              for n in list(range(0, 33)) + [63, 64, 65, 100]]
    with np.errstate(over="ignore"):
        sv = siphash64_np(cases)
        mv = murmurhash2_64_np(cases)
    for i, b in enumerate(cases):
        assert int(sv[i]) == siphash64_py(b), (i, b)
        assert int(mv[i]) == murmurhash2_64_py(b), (i, b)
