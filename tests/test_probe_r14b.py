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
