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
