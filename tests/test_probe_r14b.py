"""Round-14 second resolve-probe batch: the four genuinely-unresolved
names from the 192-name sweep (155 already resolved; the other 33
apparent misses were exemplar-shape artifacts, re-verified by hand) —
tryBase58Decode, countMatchesCaseInsensitive, L1Normalize/L2Normalize,
cutToFirstSignificantSubdomainWithWWW."""

import math

from clickhouse_clickhouse_spark.ch_sql import ch_sql


def test_try_base58_decode(spark):
    r = ch_sql(spark, """
        SELECT tryBase58Decode(base58Encode('hello world')) AS rt,
               tryBase58Decode('0OIl') AS bad,
               tryBase58Decode('') AS empty,
               tryBase58Decode(CAST(NULL AS STRING)) AS n
    """).collect()[0]
    assert r.rt == "hello world"
    assert r.bad == ""          # '0' is outside the Bitcoin alphabet
    assert r.empty == ""
    assert r.n is None


def test_count_matches_case_insensitive(spark):
    r = ch_sql(spark, """
        SELECT countMatchesCaseInsensitive('The THE the', 'the') AS ci,
               countMatches('The THE the', 'the') AS cs,
               countMatchesCaseInsensitive('aAaA', 'a{2}') AS quant,
               countMatchesCaseInsensitive('', 'x') AS empty
    """).collect()[0]
    assert (r.ci, r.cs, r.quant, r.empty) == (3, 1, 2, 0)


def test_normalize_vectors(spark):
    r = ch_sql(spark, """
        SELECT L2Normalize([3, 4]) AS l2,
               L1Normalize([1.0, -3.0]) AS l1,
               L2Normalize([0.0, 0.0]) AS zero,
               L2Normalize(CAST(NULL AS ARRAY<DOUBLE>)) AS narr,
               L1Normalize([2.0, CAST(NULL AS DOUBLE)]) AS nelem
    """).collect()[0]
    assert r.l2 == [0.6, 0.8]
    assert r.l1 == [0.25, -0.75]
    # zero vector: IEEE 0/0 limits, not ANSI-off NULLs
    assert all(math.isnan(v) for v in r.zero)
    assert r.narr is None
    # a NULL element poisons the norm -> every component NULL
    assert r.nelem == [None, None]


def test_normalize_binds_norm_once():
    # the norm is a single bound struct field, not a per-element refold
    from clickhouse_clickhouse_spark.ch_sql import translate

    sql = translate("SELECT L2Normalize([1.0, 2.0]) AS v")
    assert sql.upper().count("AGGREGATE") == 1


def test_cut_to_fsd_with_www(spark):
    r = ch_sql(spark, """
        SELECT cutToFirstSignificantSubdomainWithWWW(
                   'https://www.example.com/x') AS kept,
               cutToFirstSignificantSubdomainWithWWW(
                   'https://foo.example.com/x') AS nowww,
               cutToFirstSignificantSubdomainWithWWW(
                   'https://www.news.co.uk/p?q=1') AS sld,
               cutToFirstSignificantSubdomainWithWWW(
                   'https://www.com/') AS short,
               cutToFirstSignificantSubdomainWithWWW(
                   'https://foo.www.example.com/') AS deep,
               cutToFirstSignificantSubdomain(
                   'https://www.example.com/x') AS plain
    """).collect()[0]
    assert r.kept == "www.example.com"
    assert r.nowww == "example.com"
    assert r.sld == "www.news.co.uk"
    assert r.short == "www.com"      # too few labels: host unchanged
    assert r.deep == "www.example.com"
    assert r.plain == "example.com"


def test_murmur3_32_vectors_and_spark_differential(spark):
    """murmurHash3_32 verified two independent ways: the published
    reference vectors, and Spark's builtin hash() (Murmur3 x86_32,
    seed 42) on length%4==0 inputs where Spark's kernel is standard
    murmur3 (its deviation is per-byte tail mixing only)."""
    from clickhouse_clickhouse_spark.functions.hashing import (
        murmurhash3_32_py)

    assert murmurhash3_32_py(b"") == 0
    assert murmurhash3_32_py(b"abc") == 0xB3DD93FA
    assert murmurhash3_32_py(b"hello") == 0x248BFA47
    words = ["abcd", "spark!!!", "0123456789ab", "ClickHouse!!" * 4]
    rows = spark.sql("SELECT " + ", ".join(
        f"hash('{w}') AS h{i}" for i, w in enumerate(words))
        ).collect()[0]
    for i, w in enumerate(words):
        mine = murmurhash3_32_py(w.encode(), 42)
        signed = mine - (1 << 32) if mine >= (1 << 31) else mine
        assert signed == rows[f"h{i}"], w


def test_murmur2_32_shares_kafka_kernel():
    """murmurHash2_32 is kafka_murmur2 minus the Kafka seed/sign-mask —
    the kernels must agree when given the Kafka seed."""
    from clickhouse_clickhouse_spark.functions.hashing import (
        kafka_murmur2_py, murmurhash2_32_py)

    for v in (b"", b"a", b"ab", b"abc", b"abcd", b"hello world",
              b"x" * 37, bytes(range(256))):
        assert (murmurhash2_32_py(v, 0x9747B28C) & 0x7FFFFFFF
                == kafka_murmur2_py(v))


def test_murmur_dialect_names(spark):
    r = ch_sql(spark, """
        SELECT murmurHash3_32('abc') AS m3,
               murmurHash2_32('abc') AS m2s,
               murmurHash2_64('abc') AS m2l,
               murmurHash3_32(CAST(NULL AS STRING)) AS n
    """).collect()[0]
    assert r.m3 == 0xB3DD93FA
    from clickhouse_clickhouse_spark.functions.hashing import (
        murmurhash2_32_py, murmurhash2_64_np)
    assert r.m2s == murmurhash2_32_py(b"abc")
    import numpy as np
    assert r.m2l == int(murmurhash2_64_np([b"abc"]).astype(np.int64)[0])
    assert r.n is None


def test_probe_batch2_scalars(spark):
    r = ch_sql(spark, """
        SELECT multiMatchAllIndices('hello world',
                                    ['x+', 'wor.d', 'he']) AS mmai,
               multiMatchAllIndices('abc',
                   CAST(ARRAY() AS ARRAY<STRING>)) AS mmai_empty,
               multiSearchAnyCaseInsensitive('Hello World',
                                             ['WORLD']) AS ms_ci,
               arrayFirstIndex(x -> x > 2, [1, 3, 2, 5]) AS afi,
               arrayFirstIndex(x -> x > 9, [1, 3]) AS afi_none,
               parseDateTimeInJodaSyntax('2024-02-29 10:30',
                                         'yyyy-MM-dd HH:mm') AS pj,
               parseDateTimeInJodaSyntaxOrNull('garbage',
                                               'yyyy-MM-dd') AS pjn,
               identity(42) AS idn,
               materialize('x') AS mat
    """).collect()[0]
    assert r.mmai == [2, 3] and r.mmai_empty == []
    assert r.ms_ci is True
    assert (r.afi, r.afi_none) == (2, 0)
    assert str(r.pj) == "2024-02-29 10:30:00" and r.pjn is None
    assert (r.idn, r.mat) == (42, "x")


def test_rand_constant_is_per_query_constant(spark):
    out = ch_sql(spark, """
        SELECT COUNT(DISTINCT rc) AS n, MIN(rc) AS lo
        FROM (SELECT randConstant() AS rc FROM numbers(1000))
    """).collect()[0]
    assert out.n == 1 and 0 <= out.lo < (1 << 32)


def test_multi_match_all_indices_null_haystack(spark):
    r = ch_sql(spark, """
        SELECT multiMatchAllIndices(CAST(NULL AS STRING), ['a']) AS a,
               multiMatchAllIndices('x', CAST(NULL AS ARRAY<STRING>))
                   AS b
    """).collect()[0]
    assert r.a is None and r.b is None


def test_murmur32_numpy_kernels_bit_parity():
    """The vectorized 32-bit murmur kernels match the scalar spec
    loops byte-for-byte over every length 0..67 plus random batches
    (the round-8 discipline for the 64-bit family)."""
    import random as _r

    import numpy as np

    from clickhouse_clickhouse_spark.functions.hashing import (
        murmurhash2_32_np, murmurhash2_32_py,
        murmurhash3_32_np, murmurhash3_32_py)

    rng = _r.Random(14)
    data = [bytes(rng.randrange(256) for _ in range(n))
            for n in range(68)]
    data += [bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
             for _ in range(64)]
    with np.errstate(over="ignore"):
        for seed in (0, 42, 0x9747B28C):
            got2 = murmurhash2_32_np(data, seed)
            got3 = murmurhash3_32_np(data, seed)
            for i, b in enumerate(data):
                assert int(got2[i]) == murmurhash2_32_py(b, seed), \
                    (2, seed, i)
                assert int(got3[i]) == murmurhash3_32_py(b, seed), \
                    (3, seed, i)


def test_review_fixes_batch3(spark):
    """Round-14 review catches on the probe-batch additions."""
    import pytest as _pt

    # 1: single-label hosts pass through instead of SLICE(start=0) abort
    r = ch_sql(spark, """
        SELECT cutToFirstSignificantSubdomainWithWWW(
                   'https://localhost/x') AS a,
               cutToFirstSignificantSubdomain('https://localhost/x') AS b
    """).collect()[0]
    assert r.a == "localhost" and r.b == "localhost"
    # 2: randConstant draws FRESH per translation (memo bypass)
    from clickhouse_clickhouse_spark.ch_sql import translate
    t1 = translate("SELECT randConstant() AS rc")
    t2 = translate("SELECT randConstant() AS rc")
    assert t1 != t2
    # 3: base parseDateTimeInJodaSyntax ERRORS on garbage (OrNull is
    # the NULL form); NULL input stays NULL
    with _pt.raises(Exception, match="cannot parse"):
        ch_sql(spark, "SELECT parseDateTimeInJodaSyntax("
                      "'garbage', 'yyyy-MM-dd') AS x").collect()
    ok = ch_sql(spark, """
        SELECT parseDateTimeInJodaSyntax(CAST(NULL AS STRING),
                                         'yyyy-MM-dd') AS n
    """).collect()[0]
    assert ok.n is None
    # 4: NULL pattern ELEMENT refuses loudly instead of silent drop
    with _pt.raises(Exception, match="NULL pattern"):
        ch_sql(spark, "SELECT multiMatchAllIndices('x', "
                      "['x', CAST(NULL AS STRING)]) AS x").collect()
    # 6: (?iu) folds unicode like upstream's RE2 (?i)
    u = ch_sql(spark, "SELECT countMatchesCaseInsensitive("
                      "'Ärger', 'ärger') AS c").collect()[0]
    assert u.c == 1
    # 5: kafka kernel now DELEGATES (still Kafka-vector compatible)
    from clickhouse_clickhouse_spark.functions.hashing import (
        kafka_murmur2_py)
    assert kafka_murmur2_py(b"") >= 0
