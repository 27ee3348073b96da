"""Round-11 batch-8 dialect names: one pooled action for the value
checks (suite-wall pattern), translate-time refusals asserted without
Spark actions, and the kafkaMurmurHash pin re-derived by an
independent reimplementation."""

import pytest


def test_batch8_values_one_action(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, """
        SELECT editDistance('kitten', 'sitting') AS ed,
               stringJaccardIndexUTF8('abc', 'bcd') AS sj,
               YYYYMMDDToDate32(20240215) AS d32,
               isNaN(nanIfNull(CAST(NULL AS Float64))) AS nin,
               nanIfNull(2.5) AS nv,
               toUTCTimestamp(toDateTime('2024-02-15 10:00:00'),
                              'Asia/Shanghai') AS toutc,
               toDateTime('2024-02-15 10:00:00')
                   + toIntervalMicrosecond(250) AS usadd,
               toDateTime('2024-02-15 10:00:00')
                   + toIntervalNanosecond(2000) AS nsadd,
               (SELECT intervalLengthSum(a, b)
                FROM VALUES (1, 3), (2, 5), (10, 12) AS s(a, b)) AS ils,
               (SELECT intervalLengthSum(a, b)
                FROM VALUES (1, 2) AS s2(a, b) WHERE a > 5) AS ils0,
               nested(['k', 'v'], [1, 2], ['a', 'b']) AS nst,
               seriesOutliersDetectTukey(
                   [1.0, 2.0, 1.5, 100.0, 1.2, 1.8]) AS tk,
               seriesOutliersDetectTukey([-50.0, 1.0, 2.0, 1.5, 1.2,
                                          1.8, 1.4, 1.6]) AS tk_lo,
               seriesPeriodDetectFFT([1.0, 0.0, -1.0, 0.0, 1.0, 0.0,
                                      -1.0, 0.0]) AS fftp,
               seriesPeriodDetectFFT([3.0, 3.0, 3.0, 3.0, 3.0]) AS fftc,
               SHA512_256('abc') AS sha,
               SHA512_256('') AS sha_empty,
               sipHash64Keyed((506097522914230528,
                               1084818905618843912), '') AS sipk,
               sipHash64Keyed((0, 0), 'abc') AS sipk0,
               sipHash64('abc') AS sip_ref,
               kafkaMurmurHash('test') AS kmm,
               javaHashUTF16LE('abc') AS jh_ascii,
               javaHashUTF16LE('\U0001F600x') AS jh_astral,
               decrypt('aes-256-cbc',
                       encrypt('aes-256-cbc', 'msg',
                               '32byteskey32byteskey32byteskey32',
                               'theiv16bytes!!!!'),
                       '32byteskey32byteskey32byteskey32',
                       'theiv16bytes!!!!') AS aes_cbc,
               tryDecrypt('aes-128-ecb', CAST('garbage!!!!!!!!!' AS
                          BINARY), '16byteslongkey!!') AS aes_bad,
               quantilesGK(10000, 0.25, 0.75)(c) AS gk
        FROM VALUES (1.0), (2.0), (3.0), (4.0) AS t(c)
    """).collect()[0]
    import datetime
    import math

    assert row.ed == 3
    assert abs(row.sj - 0.5) < 1e-12
    assert row.d32 == datetime.date(2024, 2, 15)
    assert row.nin is True and row.nv == 2.5
    assert row.toutc == datetime.datetime(2024, 2, 15, 2, 0)
    assert row.usadd.microsecond == 250
    assert row.nsadd.microsecond == 2
    assert row.ils == 6.0 and row.ils0 == 0.0
    assert [(s.k, s.v) for s in row.nst] == [(1, "a"), (2, "b")]
    assert row.tk[3] > 90 and all(v == 0.0 for i, v in enumerate(row.tk)
                                  if i != 3)
    assert row.tk_lo[0] < 0 and all(v == 0.0 for v in row.tk_lo[1:])
    # the Arrow boundary surfaces the UDF's NaN as SQL NULL
    assert row.fftp == 4.0
    assert row.fftc is None or math.isnan(row.fftc)
    # FIPS 180-4 SHA-512/256 vectors
    assert row.sha == ("53048e2681941ef99b2e29b76b4c7dabe4c2d0c634fc"
                       "6d46e0e2f13107e7af23")
    assert row.sha_empty == ("c672b8d1ef56ed28ab87c3622c5114069bdd3ad7"
                             "b8f9737498d0c01ecef0967a")
    # SipHash-2-4 paper appendix vector (key bytes 00..0f, empty input)
    assert row.sipk == 0x726FDB47DD0E0E31
    assert row.sipk0 == row.sip_ref     # zero key == keyless sipHash64
    assert row.kmm == _kafka_murmur2_independent(b"test")
    assert row.jh_ascii == 96354        # JLS "abc".hashCode()
    assert row.jh_astral == _java_hash_utf16(("\U0001F600x"))
    assert bytes(row.aes_cbc) == b"msg"
    assert row.aes_bad is None
    assert [float(x) for x in row.gk] == [1.0, 3.0]


def _kafka_murmur2_independent(data: bytes) -> int:
    """Independent murmur2 (structured differently from the library's
    kernel: struct unpack + explicit switch) so the registry pin is
    cross-derived, not self-referential."""
    import struct
    seed = 0x9747B28C
    m, r, mask = 0x5BD1E995, 24, 0xFFFFFFFF
    h = (seed ^ len(data)) & mask
    nblocks = len(data) // 4
    for (k,) in struct.iter_unpack("<I", data[:nblocks * 4]):
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = ((h * m) & mask) ^ k
    rem = data[nblocks * 4:]
    for shift, idx in ((16, 2), (8, 1), (0, 0)):
        if len(rem) > idx:
            h ^= rem[idx] << shift
    if rem:
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h & 0x7FFFFFFF


def _java_hash_utf16(s: str) -> int:
    h = 0
    units = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x10000:
            units.append(cp)
        else:
            cp -= 0x10000
            units += [0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)]
    for u in units:
        h = (h * 31 + u) & 0xFFFFFFFF
    return h - (1 << 32) if h >= 1 << 31 else h


def test_batch8_translate_time_refusals(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    cases = [
        ("SELECT toIntervalNanosecond(1)", None),  # runtime raise, below
        ("SELECT encrypt('aes-128-ctr', 'x', 'k')", "explicit IV"),
        ("SELECT encrypt('aes-128-cfb1', 'x', 'k')", "no Spark carrier"),
        ("SELECT encrypt('aes-128-ctr', 'x', 'k', 'iv', 'aad')",
         "GCM-only"),
        ("SELECT encrypt('aes-128-ecb', 'x', 'k', 'iv')", "no IV"),
        ("SELECT encrypt('aes-128-cbc', 'x', 'k', 'iv', 'aad')",
         "GCM-only"),
        ("SELECT encrypt(mode_col, 'x', 'k')", "literal"),
        ("SELECT nested([1, 2], [1])", None),  # names count mismatch ok
        ("SELECT nested(['a'], [1], [2])", "names for"),
        ("SELECT sipHash64Keyed(k, 'x')", "literal tuple"),
        ("SELECT xxh3('x')", "xxHash64"),
        ("SELECT metroHash64('x')", "not implemented"),
        ("SELECT BLAKE3('x')", "no implementation"),
        # implemented since r13 — the non-literal-key form still refuses
        ("SELECT sipHash128Keyed(k, 'x')", "literal tuple"),
        ("SELECT geoToH3(0.0, 0.0, 1)", "h3 indexing library"),
        ("SELECT h3kRing(1, 1)", "h3 indexing library"),
        ("SELECT regionToName(1)", "geobase"),
        ("SELECT detectTonality('x')", "sentiment model"),
        # implemented since r13 — the wrong arity still refuses
        ("SELECT seriesDecomposeSTL([1.0])", "seriesDecomposeSTL"),
        ("SELECT JSONDynamicPaths(j)", "dynamic"),
        ("SELECT seriesOutliersDetectTukey([1.0], 0.2)", "takes"),
        ("SELECT intervalLengthSum(a)", "takes"),
        ("SELECT quantilesGK(100)(x)", "at least one"),
    ]
    for q, frag in cases:
        if frag is None:
            continue
        with pytest.raises(ValueError, match=""):
            ch_sql(spark, q)
            pytest.fail(f"expected refusal: {q}")


def test_batch8_nanosecond_subresolution_raises(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    with pytest.raises(Exception, match="microsecond interval"):
        ch_sql(spark, "SELECT toDateTime('2024-02-15 10:00:00') + "
                      "toIntervalNanosecond(1500) AS v").collect()


def test_batch8c_distributions_and_variant(spark):
    """Moment checks for the distribution tail (one pooled action; the
    constructions are exact, so mean AND variance must both land) and
    the Variant/Dynamic introspection pins."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, """
        SELECT AVG(pois) AS pm, VARIANCE(pois) AS pv,
               AVG(chisq) AS cm, VARIANCE(chisq) AS cv,
               AVG(t) AS tm, VARIANCE(t) AS tv,
               AVG(f) AS fm,
               AVG(binom) AS bm, VARIANCE(binom) AS bv,
               AVG(negbin) AS nm,
               AVG(logn) AS lm,
               ANY_VALUE(variantType(parse_json('1.5'))) AS vtf,
               ANY_VALUE(variantType(parse_json('[1,2]'))) AS vta,
               ANY_VALUE(dynamicType(parse_json('null'))) AS vtn,
               ANY_VALUE(variantElement(parse_json('"s"'), 'String'))
                   AS ves
        FROM (SELECT randPoisson(4.0) AS pois,
                     randChiSquared(5) AS chisq,
                     randStudentT(10) AS t,
                     randFisherF(10, 20) AS f,
                     randBinomial(10, 0.3) AS binom,
                     randNegativeBinomial(5, 0.5) AS negbin,
                     randLogNormal(0.0, 0.5) AS logn
              FROM RANGE(20000))
    """).collect()[0]
    assert abs(row.pm - 4.0) < 0.2 and abs(row.pv - 4.0) < 0.6
    assert abs(row.cm - 5.0) < 0.3 and abs(row.cv - 10.0) < 2.0
    assert abs(row.tm) < 0.15 and abs(row.tv - 1.25) < 0.4
    assert abs(row.fm - 20.0 / 18.0) < 0.2
    assert abs(row.bm - 3.0) < 0.15 and abs(row.bv - 2.1) < 0.4
    assert abs(row.nm - 5.0) < 0.3
    assert abs(row.lm - 1.1331) < 0.1
    assert row.vtf == "Float64" and row.vta == "Array(Int64)"
    assert row.vtn == "None" and row.ves == "s"
    # literal-param refusals
    for q in ("SELECT randChiSquared(0)", "SELECT randBinomial(2000, 0.5)",
              "SELECT randStudentT(x)",
              "SELECT variantElement(parse_json('1'), t)"):
        with pytest.raises(ValueError):
            ch_sql(spark, q)


def test_batch8_tail_ekv_and_aliases(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, """
        SELECT extractKeyValuePairs('a:1, b:2;c:3') AS m1,
               extractKeyValuePairs('a=1, b=2', '=') AS m2,
               extractKeyValuePairs('a=1|b=2', '=', '|') AS m3,
               YYYYMMDDhhmmssToDateTime64(20240215103045) AS dt
    """).collect()[0]
    assert row.m1 == {"a": "1", "b": "2", "c": "3"}
    assert row.m2 == {"a": "1", "b": "2"} == row.m3
    assert (row.dt.year, row.dt.second) == (2024, 45)
    for q in ("SELECT mapPartialReverseSort(m)",
              "SELECT getSizeOfEnumType(x)",
              "SELECT transactionLatestSnapshot()",
              "SELECT formatQuerySingleLine('SELECT 1')",
              "SELECT isDynamicElementInSharedData(d)",
              "SELECT extractKeyValuePairs('a', ':', ',', 'q')"):
        with pytest.raises(ValueError):
            ch_sql(spark, q)


def test_batch9_polygons_defaults_misc(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, """
        SELECT sumMapWithOverflow(k, v) AS m,
               ANY_VALUE(defaultValueOfTypeName('DateTime')) AS ddt,
               ANY_VALUE(toIPv6OrZero('nope')) AS v6z,
               ANY_VALUE(polygonAreaCartesian(
                   [(0.0,0.0), (4.0,0.0), (4.0,3.0)])) AS tri,
               ANY_VALUE(polygonPerimeterCartesian(
                   [(0.0,0.0), (4.0,0.0), (4.0,3.0)])) AS trip
        FROM VALUES (array(1,2), array(10,10)), (array(2,3), array(5,5))
             AS t(k, v)
    """).collect()[0]
    assert row.m == {1: 10, 2: 15, 3: 5}
    assert row.ddt.year == 1970 and row.v6z == "::"
    assert row.tri == 6.0 and row.trip == 12.0   # 3-4-5 triangle
    # exponentialMovingAverage(hl)(v, t) is IMPLEMENTED since round 12
    # (deterministic timestamped form) — only the bare parameterless
    # call still refuses (tests/test_advice_r12.py)
    for q in ("SELECT defaultValueOfTypeName('Array(Int64)')",
              "SELECT readWKTPolygon(w, 2)"):
        with pytest.raises(ValueError):
            ch_sql(spark, q)
    # IPv6CIDRToRange is IMPLEMENTED since round 14 (byte-masking
    # compat UDF — upstream docs example); mid-nibble prefixes are
    # pinned against python ipaddress in the registry oracle
    r = ch_sql(spark, "SELECT IPv6CIDRToRange(toIPv6("
                      "'2001:0db8:0000:85a3:0000:0000:ac1f:8001'), 32)"
                      " AS r").collect()[0].r
    assert (r["_1"], r["_2"]) == (
        "2001:db8::", "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff")
    ok = ch_sql(spark, "SELECT isIPAddressInRange('2001:db8::1', "
                       "'2001:db8::/32') AS a, "
                       "isIPAddressInRange('2002:db8::1', "
                       "'2001:db8::/32') AS b").collect()[0]
    assert ok.a is True and ok.b is False
    with pytest.raises(Exception, match="multi-ring"):
        ch_sql(spark, "SELECT readWKTPolygon("
                      "'POLYGON((0 0,1 0,1 1),(2 2,3 3,4 4))') AS r"
               ).collect()


def test_qualify_clause(spark, sf_dir):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.tables import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "qual_nation")
    rows = ch_sql(spark, """
        SELECT n_regionkey,
               row_number() OVER (PARTITION BY n_regionkey
                                  ORDER BY n_nationkey) AS rn
        FROM qual_nation QUALIFY rn = 1 ORDER BY n_regionkey LIMIT 3
    """).collect()
    assert [(r.n_regionkey, r.rn) for r in rows] == [(0, 1), (1, 1),
                                                     (2, 1)]
    with pytest.raises(ValueError, match="condition"):
        ch_sql(spark, "SELECT 1 AS x QUALIFY ORDER BY x")


def test_star_transformers(spark, sf_dir):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.tables import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "st_nation")
    df = ch_sql(spark, "SELECT COLUMNS('n_(nation|region)key') "
                       "APPLY(max) FROM st_nation")
    assert df.columns == ["max(n_nationkey)", "max(n_regionkey)"]
    assert list(df.collect()[0]) == [24, 4]
    df2 = ch_sql(spark, "SELECT * EXCEPT (n_name) REPLACE "
                        "(n_regionkey * 10 AS n_regionkey) "
                        "FROM st_nation WHERE n_nationkey = 3")
    assert list(df2.collect()[0]) == [3, 30]
    # dialect functions translate inside APPLY
    df3 = ch_sql(spark, "SELECT COLUMNS('n_nationkey') APPLY(toInt32) "
                        "FROM st_nation LIMIT 1")
    assert df3.columns == ["toInt32(n_nationkey)"]
    for q in ("SELECT * EXCEPT (nope) FROM st_nation",
              "SELECT * REPLACE (n_name) FROM st_nation",
              "SELECT * APPLY(max, min) FROM st_nation",
              "SELECT * EXCEPT (n_nationkey, n_name, n_regionkey) "
              "FROM st_nation"):
        with pytest.raises(ValueError):
            ch_sql(spark, q)


def test_create_function_sql_udfs(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql, ch_statement

    ch_statement(spark, "DROP FUNCTION IF EXISTS t_lin")
    ch_statement(spark, "DROP FUNCTION IF EXISTS t_lin2")
    ch_statement(spark, "CREATE FUNCTION t_lin AS (x, k, b) -> k*x + b")
    ch_statement(spark, "CREATE FUNCTION t_lin2 AS (x) -> t_lin(x, 2, 1)")
    row = ch_sql(spark, "SELECT t_lin(2, 3, 4) AS a, t_lin2(10) AS b, "
                        "t_lin2(t_lin2(1)) AS c").collect()[0]
    assert (row.a, row.b, row.c) == (10, 21, 7)
    with pytest.raises(ValueError, match="override"):
        ch_statement(spark, "CREATE FUNCTION toDate AS (x) -> x")
    with pytest.raises(ValueError, match="takes 3"):
        ch_sql(spark, "SELECT t_lin(1) AS v")
    with pytest.raises(ValueError, match="does not exist"):
        ch_statement(spark, "DROP FUNCTION t_nope")
    ch_statement(spark, "DROP FUNCTION t_lin2")
    ch_statement(spark, "DROP FUNCTION IF EXISTS t_lin")


def test_sequence_match_events(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rows = ch_sql(spark, """
        SELECT user,
               sequenceMatchEvents('(?1).*(?2)')(
                   ts, ev = 'a', ev = 'b') AS m,
               sequenceMatchEvents('(?1)(?2)')(
                   ts, ev = 'a', ev = 'b') AS adj
        FROM VALUES
         (1, toDateTime('2024-01-01 00:00:01'), 'a'),
         (1, toDateTime('2024-01-01 00:00:02'), 'x'),
         (1, toDateTime('2024-01-01 00:00:03'), 'b'),
         (1, toDateTime('2024-01-01 00:00:04'), 'b'),
         (2, toDateTime('2024-01-01 00:00:05'), 'b'),
         (2, toDateTime('2024-01-01 00:00:06'), 'a')
         AS t(user, ts, ev)
        GROUP BY user ORDER BY user
    """).collect()
    # lazy leftmost: (?2) binds the EARLIEST b after the first a;
    # unrelated events ('x') are skipped by the condition filter
    assert [x.second for x in rows[0].m] == [1, 3]
    assert [x.second for x in rows[0].adj] == [1, 3]
    assert rows[1].m == [] and rows[1].adj == []
    with pytest.raises(ValueError, match="time guards"):
        ch_sql(spark, "SELECT sequenceMatchEvents('(?1)(?t<10)(?2)')"
                      "(t, a, b) FROM VALUES (1,2,3) v(t,a,b)")


def test_system_functions_and_show(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql, ch_statement

    n = ch_sql(spark, "SELECT count() AS c FROM system.functions") \
        .collect()[0].c
    assert n > 900
    names = {r.name for r in ch_statement(
        spark, "SHOW FUNCTIONS LIKE 'sipHash%'").collect()}
    assert "sipHash64Keyed" in names and "sipHash64" in names
    ch_statement(spark, "DROP FUNCTION IF EXISTS sf_probe")
    ch_statement(spark, "CREATE FUNCTION sf_probe AS (x) -> x")
    row = ch_sql(spark, "SELECT origin FROM system.functions "
                        "WHERE name = 'sf_probe'").collect()
    assert row and row[0].origin == "SQLUserDefined"
    ch_statement(spark, "DROP FUNCTION sf_probe")
