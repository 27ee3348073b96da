"""Focused tests for the round-14 vectorized space-curve kernels
(functions/spacecurves.py) — the numpy twins that replaced the
interpreted SQL folds/binders behind hilbertEncode/Decode and
mortonEncode/Decode. Pins: upstream docs values, roundtrip identity,
NULL semantics (encode NULL→NULL; hilbertDecode NULL→NULL STRUCT;
mortonDecode NULL→struct of NULL fields, matching the old SQL forms),
and the bounds guards."""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_clickhouse_spark.ch_sql import ch_sql
from clickhouse_clickhouse_spark.functions.spacecurves import (
    hilbert_decode_np,
    hilbert_encode_np,
    morton_decode_np,
    morton_encode_np,
)


def test_kernel_pins_and_roundtrip():
    # upstream docs pins: mortonEncode(1,2,3)=53, hilbertEncode(3,4)=31
    assert morton_encode_np([np.array([1]), np.array([2]),
                             np.array([3])])[0] == 53
    assert hilbert_encode_np(np.array([3]), np.array([4]))[0] == 31
    x, y = hilbert_decode_np(np.array([31]))
    assert (x[0], y[0]) == (3, 4)
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 1 << 31, size=20_000, dtype=np.int64)
    ys = rng.randint(0, 1 << 31, size=20_000, dtype=np.int64)
    bx, by = hilbert_decode_np(hilbert_encode_np(xs, ys))
    assert (bx == xs).all() and (by == ys).all()
    for k in (2, 5, 8):
        cs = [rng.randint(-2**62, 2**62, size=5_000, dtype=np.int64)
              for _ in range(k)]
        dec = morton_decode_np(k, morton_encode_np(cs))
        bits = 64 // k
        mask = (np.int64(1) << bits) - 1
        for c, d in zip(cs, dec):
            assert (d == (c & mask)).all()


def test_kernel_guards():
    with pytest.raises(ValueError, match="hilbertEncode"):
        hilbert_encode_np(np.array([-1]), np.array([0]))
    with pytest.raises(ValueError, match="hilbertEncode"):
        hilbert_encode_np(np.array([0]), np.array([1 << 31]))
    with pytest.raises(ValueError, match="hilbertDecode"):
        hilbert_decode_np(np.array([1 << 62]))


def test_gcd_lcm_udf_semantics(spark):
    rows = ch_sql(spark, """
        SELECT gcd(12246, -312) AS g, gcd(0, 0) AS g0,
               lcm(4, 6) AS l, lcm(0, 5) AS l0, lcm(-4, 6) AS ln,
               gcd(CAST(NULL AS BIGINT), 3) AS gn,
               lcm(3, CAST(NULL AS BIGINT)) AS lnn""").collect()[0]
    assert (rows.g, rows.g0, rows.l, rows.l0, rows.ln) == (78, 0, 12, 0, 12)
    assert rows.gn is None and rows.lnn is None
    # differential vs python math.gcd over a signed grid
    import math
    got = {(r.a, r.b): (r.g, r.l) for r in ch_sql(spark, """
        SELECT a, b, gcd(a, b) AS g, lcm(a, b) AS l
        FROM (SELECT number % 40 - 20 AS a, number DIV 40 - 20 AS b
              FROM numbers(1600))""").collect()}
    for (a, b), (g, l) in got.items():
        eg = math.gcd(a, b)
        el = 0 if (a == 0 or b == 0) else abs(a // eg * b)
        assert (g, l) == (eg, el), (a, b, g, l, eg, el)


def test_sql_null_semantics(spark):
    r = ch_sql(spark, """
        SELECT mortonEncode(c, 2) AS me,
               mortonDecode(2, c) AS md,
               hilbertEncode(c, 2) AS he,
               hilbertDecode(2, c) AS hd
        FROM VALUES (CAST(NULL AS BIGINT)) AS t(c)""").collect()[0]
    assert r.me is None and r.he is None
    # mortonDecode: struct of NULL fields (the old NAMED_STRUCT over
    # NULL bitwise terms); hilbertDecode: NULL struct (the old fold
    # returned NULL outright)
    assert r.md is not None and r.md._1 is None and r.md._2 is None
    assert r.hd is None


def test_sql_udf_parity(spark):
    rows = ch_sql(spark, """
        SELECT number AS n,
               mortonEncode(number % 65536, number % 1000) AS me,
               hilbertEncode(number % 32768, number % 1000) AS he,
               mortonDecode(3, number) AS md
        FROM numbers(4096)""").collect()
    n = np.arange(4096, dtype=np.int64)
    me = morton_encode_np([n % 65536, n % 1000])
    he = hilbert_encode_np(n % 32768, n % 1000)
    md = morton_decode_np(3, n)
    for i, r in enumerate(rows):
        assert r.me == me[r.n] and r.he == he[r.n]
        assert (r.md._1, r.md._2, r.md._3) == \
            (md[0][r.n], md[1][r.n], md[2][r.n])


# ---- round-15 kernels: parseReadableSize / geoDistance / geohashEncode ----

def test_parse_readable_modes(spark):
    # Template-verified semantics (round 15 differential): fractional
    # ceil, whitespace tolerance, case-folded units, i64 saturation —
    # and NULL input routes to the BAD branch in every mode (the old
    # binder's `n = '' OR unit-CASE IS NULL` condition is NULL OR TRUE),
    # so OrNull gives NULL and OrZero gives 0, not NULL.
    r = ch_sql(spark, """
        SELECT parseReadableSize('1 MiB') AS a,
               parseReadableSize('  7.5  KiB  ') AS b,
               parseReadableSize('0.5 B') AS c,
               parseReadableSizeOrNull('oops') AS d,
               parseReadableSizeOrZero('oops') AS e,
               parseReadableSizeOrNull(CAST(NULL AS STRING)) AS f,
               parseReadableSizeOrZero(CAST(NULL AS STRING)) AS g,
               parseReadableSize('9999999999 EiB') AS h,
               parseReadableSize('1 kib') AS i,
               parseReadableSizeOrNull('1.0e3 KB') AS j
    """).collect()[0]
    assert r.a == 1048576 and r.b == 7680 and r.c == 1
    assert r.d is None and r.e == 0
    assert r.f is None and r.g == 0
    assert r.h == (1 << 63) - 1          # saturating double->i64 cast
    assert r.i == 1024                    # unit is case-insensitive
    assert r.j is None                    # scientific notation rejected


def test_parse_readable_strict_raises(spark):
    # Strict mode raises on unparsable AND on NULL input, exactly like
    # the old RAISE_ERROR branch; the surface is now a PythonException
    # (kernel raise) instead of SparkRuntimeException — the same pinned
    # stance as the hilbert bounds guards.
    from pyspark.errors.exceptions.captured import PythonException
    for bad in ("'oops'", "CAST(NULL AS STRING)"):
        with pytest.raises(PythonException, match="cannot parse"):
            ch_sql(spark,
                   f"SELECT parseReadableSize({bad}) AS p").collect()


def test_geo_distance_null_nan_paths(spark):
    # The old binder's NULL behavior was an artifact of null-skipping
    # LEAST/GREATEST: NULL longitude -> ACOS(GREATEST(NULL,-1)=-1) = pi
    # times R(mla) (half circumference at the mean latitude); NULL
    # latitude -> R is NULL -> NULL. NaN values (distinguished from
    # NULL via the mask args) propagate: NaN longitude -> haversine
    # term NaN -> LEAST(NaN,1)=1 -> ACOS(1)=0 -> 0.0; NaN latitude ->
    # R(NaN) = NaN -> NaN. All four paths replayed by the kernel.
    import math
    r = ch_sql(spark, """
        SELECT round(geoDistance(CAST(NULL AS DOUBLE), 2.0, 3.0, 4.0), 3) AS lon_null,
               geoDistance(1.0, CAST(NULL AS DOUBLE), 3.0, 4.0) AS lat_null,
               geoDistance(1.0, 2.0, 3.0, CAST(NULL AS DOUBLE)) AS lat2_null,
               geoDistance(CAST('NaN' AS DOUBLE), 2.0, 3.0, 4.0) AS lon_nan,
               geoDistance(1.0, CAST('NaN' AS DOUBLE), 3.0, 4.0) AS lat_nan,
               round(geoDistance(1.0, 2.0, 3.0, 4.0), 3) AS normal
    """).collect()[0]
    assert r.lon_null == 20037325.862
    assert r.lat_null is None and r.lat2_null is None
    assert r.lon_nan == 0.0
    assert r.lat_nan is not None and math.isnan(r.lat_nan)
    assert r.normal == 314632.46


def test_geohash_encode_null_nan_cells(spark):
    # NULL coordinate: its FLOOR term is NULL and the null-skipping
    # LEAST yields scale-1 (top cell, 'z...' bits); NaN coordinate:
    # Java (long)NaN = 0 -> cell 0. Kernel replays both via the
    # per-coordinate mask args; output is never NULL.
    r = ch_sql(spark, """
        SELECT geohashEncode(CAST(NULL AS DOUBLE), 2.0, 4) AS lon_null,
               geohashEncode(1.0, CAST(NULL AS DOUBLE), 4) AS lat_null,
               geohashEncode(CAST(NULL AS DOUBLE),
                             CAST(NULL AS DOUBLE), 4) AS both_null,
               geohashEncode(CAST('NaN' AS DOUBLE), 2.0, 4) AS lon_nan,
               geohashEncode(1.0, CAST('NaN' AS DOUBLE), 4) AS lat_nan,
               geohashEncode(-5.60302734375, 42.593994140625, 4) AS pin
    """).collect()[0]
    assert r.lon_null == "xbrg" and r.lat_null == "upbx"
    assert r.both_null == "zzzz"
    assert r.lon_nan == "8025" and r.lat_nan == "h008"
    assert r.pin == "ezs4"


def test_udf_in_lambda_known_limitation(spark):
    # KNOWN LIMITATION (round-14/15 kernelization trade-off): dialect
    # scalars that now route to Python UDFs (gcd/lcm/morton/hilbert/
    # parseReadableSize/geoDistance/geohashEncode) cannot appear INSIDE
    # a higher-order-function lambda — Spark forbids Python UDFs in
    # lambda bodies. The old pure-SQL folds composed anywhere; the
    # kernels are 5-40x faster per row and every declared query keeps
    # these calls at projection level. Pinned so the failure mode is a
    # documented contract, not a surprise.
    from pyspark.errors.exceptions.captured import AnalysisException
    with pytest.raises(AnalysisException,
                       match="LAMBDA_FUNCTION_WITH_PYTHON_UDF"):
        ch_sql(spark,
               "SELECT arrayMap(x -> gcd(x, 10), array(4, 6)) AS m"
               ).collect()


def test_hilbert_guard_exception_surface(spark):
    # Round-15 advice pin: the kernelized hilbert bounds guards surface
    # as PythonException (the kernel's ValueError propagated from the
    # worker), not the old RAISE_ERROR SparkRuntimeException. Same
    # stance as strict parseReadableSize.
    from pyspark.errors.exceptions.captured import PythonException
    with pytest.raises(PythonException, match="hilbertEncode"):
        ch_sql(spark,
               "SELECT hilbertEncode(-1, 0) AS h").collect()
    with pytest.raises(PythonException, match="hilbertDecode"):
        ch_sql(spark, "SELECT hilbertDecode(2, CAST(4611686018427387904 "
                      "AS BIGINT) * 2) AS h").collect()
