"""Round-12 advisor findings — regression pins.

1. encrypt GCM must pass the AAD through to aes_encrypt (tag covers
   AAD; dropping it broke round-trip tag verification).
2. _chi2_draw_sql must sum logs, not multiply uniforms (product
   underflows double near dof ~1300 and LN(0) is NULL).
3. nested() must resolve over REAL table columns (ARRAYS_ZIP names
   struct fields after bare column refs, breaking positional reads).
4. _expand_sql_udfs must not treat argument text as a regex
   replacement template, nor rewrite parameter names inside the
   body's own string literals.
5. randNegativeBinomial(r, p>=1) must return 0, not NULL.
"""

import pytest


def test_advice_r12_values_one_action(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql, ch_statement

    ch_statement(spark, "DROP FUNCTION IF EXISTS t_rex12")
    ch_statement(spark, "DROP FUNCTION IF EXISTS t_lit12")
    ch_statement(spark,
                 "CREATE FUNCTION t_rex12 AS (pat, s) -> s RLIKE pat")
    ch_statement(spark, "CREATE FUNCTION t_lit12 AS (x) -> "
                        "CONCAT('x=', CAST(x AS STRING))")
    row = ch_sql(spark, """
        SELECT decrypt('aes-256-gcm',
                       encrypt('aes-256-gcm', 'msg',
                               '32byteskey32byteskey32byteskey32',
                               'theiv12bytes', 'additional-data'),
                       '32byteskey32byteskey32byteskey32',
                       'theiv12bytes', 'additional-data') AS gcm_rt,
               tryDecrypt('aes-256-gcm',
                          encrypt('aes-256-gcm', 'msg',
                                  '32byteskey32byteskey32byteskey32',
                                  'theiv12bytes', 'aad-one'),
                          '32byteskey32byteskey32byteskey32',
                          'theiv12bytes', 'aad-two') AS gcm_badaad,
               decrypt('aes-256-gcm',
                       encrypt('aes-256-gcm', 'noaad',
                               '32byteskey32byteskey32byteskey32',
                               'theiv12bytes'),
                       '32byteskey32byteskey32byteskey32',
                       'theiv12bytes') AS gcm_noaad,
               randNegativeBinomial(3, 1) AS nb_p1,
               randNegativeBinomial(3, 1.0) AS nb_p1f,
               randNegativeBinomial(4, 0.5) AS nb_half,
               nested(['k', 'v'], ka, va) AS nst_cols,
               nested(['k', 'v'], ka, ARRAY('x')) AS nst_pad,
               nested(['k', 'v'], ARRAY(), ARRAY()) AS nst_empty,
               t_rex12('\\\\d+', 'a1') AS rex_hit,
               t_rex12('\\\\d+', 'abc') AS rex_miss,
               t_lit12(5) AS lit_keep
        FROM VALUES (ARRAY(1, 2), ARRAY('a', 'b')) AS t(ka, va)
    """).collect()[0]

    assert bytes(row.gcm_rt) == b"msg"          # AAD reaches both sides
    assert row.gcm_badaad is None               # wrong AAD -> tag fails
    assert bytes(row.gcm_noaad) == b"noaad"     # no-AAD path unchanged
    assert row.nb_p1 == 0 and row.nb_p1f == 0   # upstream p=1 -> 0
    assert row.nb_half is not None and row.nb_half >= 0
    # bare COLUMN refs — the advisor's broken case
    assert [(s.k, s.v) for s in row.nst_cols] == [(1, "a"), (2, "b")]
    # longest-wins NULL padding (ARRAYS_ZIP contract)
    assert [(s.k, s.v) for s in row.nst_pad] == [(1, "x"), (2, None)]
    assert row.nst_empty == []
    assert row.rex_hit is True and row.rex_miss is False
    assert row.lit_keep == "x=5"                # 'x=' literal untouched
    ch_statement(spark, "DROP FUNCTION t_rex12")
    ch_statement(spark, "DROP FUNCTION t_lit12")


def test_advice_r12_chi2_large_dof_one_action(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    # product-of-uniforms form underflowed at dof ~1300 -> NULL; the
    # log-sum form must stay finite through the 2000 cap. 200 draws:
    # chi2(2000) mean 2000, sd ~63 -> sample mean within +-100 easily.
    row = ch_sql(spark, """
        SELECT COUNT(*) AS n,
               SUM(IF(c IS NULL OR t IS NULL OR f IS NULL, 1, 0))
                   AS nulls,
               MIN(c) AS cmin, AVG(c) AS cmean
        FROM (SELECT randChiSquared(2000) AS c,
                     randStudentT(1500) AS t,
                     randFisherF(1500, 1500) AS f
              FROM numbers(200))
    """).collect()[0]
    assert row.n == 200 and row.nulls == 0
    assert row.cmin > 0
    assert abs(row.cmean - 2000.0) < 100.0


def test_advice_r12_udf_backslash_arg_no_regex_error(spark):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql, ch_statement

    # Before the fix this raised re.error ("bad escape \\d") at
    # translate time; now translation must succeed.
    ch_statement(spark, "DROP FUNCTION IF EXISTS t_pat12")
    ch_statement(spark, "CREATE FUNCTION t_pat12 AS (p) -> UPPER(p)")
    out = ch_sql(spark, "SELECT t_pat12('\\\\d+\\\\s') AS u").collect()
    assert out[0].u == "\\D+\\S"
    ch_statement(spark, "DROP FUNCTION t_pat12")


def test_ema_deterministic_brute_force(spark):
    """exponentialMovingAverage(hl)(v, t): value pinned against an
    independent python fold of the closed form, and invariant to input
    order (the determinism contract that un-refused the name)."""
    import math

    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    pts = [(1.0, 10.0), (5.0, 40.0), (2.0, 70.0), (9.0, 100.0),
           (4.0, 55.0), (7.0, 100.0)]  # duplicate t on purpose
    hl = 30.0
    tm = max(t for _, t in pts)
    ws = [(v * 2 ** ((t - tm) / hl), 2 ** ((t - tm) / hl))
          for v, t in pts]
    expected = sum(w[0] for w in ws) / sum(w[1] for w in ws)

    def run(rows):
        vals = ", ".join(f"({v!r}, {t!r})" for v, t in rows)
        return ch_sql(spark, f"""
            SELECT exponentialMovingAverage(30)(v, t) AS ema
            FROM VALUES {vals} AS p(v, t)""").collect()[0].ema

    fwd = run(pts)
    rev = run(list(reversed(pts)))
    assert math.isclose(fwd, expected, rel_tol=1e-12)
    assert fwd == rev

    # bare call (no half-life parameter) still refuses, with the
    # parametric signature named
    with pytest.raises(ValueError, match="half-life"):
        ch_sql(spark, "SELECT exponentialMovingAverage(v, t) "
                      "FROM VALUES (1.0, 1.0) AS p(v, t)")


def test_distinct_on_order_rewrite_battery(spark):
    """DISTINCT ON / LIMIT n BY with a top-level ORDER BY whose keys
    the select list RENAMED, DROPPED, or referenced POSITIONALLY must
    still pick the oracle-tracking survivor (round-12 verdict item 5:
    alias-rewrite + hoist in _wrap_order_rewrite)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rows = [(1, 10, "a"), (1, 30, "b"), (1, 20, "c"),
            (2, 5, "d"), (2, 5, "e")]
    vals = ", ".join(f"({k}, {v}, '{s}')" for k, v, s in rows)
    view = f"(SELECT * FROM VALUES {vals} AS t(k, v, s))"

    # renamed: ORDER BY v resolves to the alias vv
    r = ch_sql(spark, f"SELECT DISTINCT ON (k) k, v AS vv FROM {view} "
                      "ORDER BY k, v DESC").collect()
    assert sorted((x.k, x.vv) for x in r) == [(1, 30), (2, 5)]
    # dropped: ORDER BY v is NOT projected at all -> hoisted
    r = ch_sql(spark, f"SELECT DISTINCT ON (k) k, s FROM {view} "
                      "ORDER BY k, v DESC").collect()
    assert sorted((x.k, x.s) for x in r) == [(1, "b"), (2, "d")]
    # tie on v=5 for k=2 broken by s -> deterministic survivor 'd'
    r = ch_sql(spark, f"SELECT DISTINCT ON (k) k, s FROM {view} "
                      "ORDER BY k, v, s").collect()
    assert sorted((x.k, x.s) for x in r) == [(1, "a"), (2, "d")]
    # positional: ORDER BY 2 must mean the 2nd item, not literal 2
    # (a bare number inside a WINDOW ORDER BY is a constant)
    r = ch_sql(spark, f"SELECT DISTINCT ON (k) k, v FROM {view} "
                      "ORDER BY 1, 2 DESC").collect()
    assert sorted((x.k, x.v) for x in r) == [(1, 30), (2, 5)]
    # LIMIT n BY with renamed order key
    r = ch_sql(spark, f"SELECT k, v AS vv FROM {view} "
                      "ORDER BY k, v DESC LIMIT 2 BY k").collect()
    assert sorted((x.k, x.vv) for x in r) == [(1, 20), (1, 30),
                                              (2, 5), (2, 5)]


def test_minhash_tuple_family_one_action(spark):
    """ngramMinHash / wordShingleMinHash dialect family (round-12
    verdict item 6): planted near-dup pair agrees on the min tuple
    while an unrelated doc does not; Arg forms return grams sorted by
    their hash; parameter validation refuses non-literals."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " x"     # one extra token, gram sets overlap heavily
    far = "totally unrelated content about solar panel efficiency data"
    row = ch_sql(spark, f"""
        SELECT wordShingleMinHash('{base}', 1, 2) AS b,
               wordShingleMinHash('{near}', 1, 2) AS nr,
               wordShingleMinHash('{far}', 1, 2) AS fr,
               ngramMinHashArg('abcdefgh', 3, 6) AS all_grams,
               wordShingleMinHashCaseInsensitive('A b C d') =
                   wordShingleMinHashCaseInsensitive('a B c D') AS ci,
               ngramMinHash('ab') AS short_s
    """).collect()[0]
    # hashnum=2 over size-1 shingles: appending one token keeps the two
    # smallest token hashes with overwhelming (and fixture-pinned)
    # certainty; the verdict's "planted near-dup agreement"
    assert row.b._1 == row.nr._1
    assert row.b._1 != row.fr._1 and row.b._2 != row.fr._2
    # 6 grams requested, 'abcdefgh' has exactly 6 distinct 3-grams:
    # _1 ascending-hash order, _2 descending — same set
    assert sorted(row.all_grams._1) == sorted(row.all_grams._2)
    assert len(row.all_grams._1) == 6
    assert row.ci is True
    # string shorter than the gram size -> empty-set sentinel tuple
    assert row.short_s._1 == row.short_s._2

    with pytest.raises(ValueError, match="literal integer"):
        ch_sql(spark, "SELECT ngramMinHash('x', k) FROM VALUES (2) "
                      "AS t(k)")
    with pytest.raises(ValueError, match="hashnum"):
        ch_sql(spark, "SELECT wordShingleMinHash('x', 2, 0)")


def test_gcm_aad_byte_parity_vs_openssl(spark):
    """encrypt('aes-256-gcm', ...) byte parity against an INDEPENDENT
    OpenSSL-backed implementation (python `cryptography` AESGCM):
    ciphertext||tag must match exactly, with and without AAD — the
    docstring's byte-parity claim, now externally verified (the
    round-11 advisor found the AAD was silently dropped)."""
    pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    key = b"32byteskey32byteskey32byteskey32"
    iv = b"theiv12bytes"
    row = ch_sql(spark, """
        SELECT encrypt('aes-256-gcm', 'payload',
                       '32byteskey32byteskey32byteskey32',
                       'theiv12bytes', 'the-aad') AS with_aad,
               encrypt('aes-256-gcm', 'payload',
                       '32byteskey32byteskey32byteskey32',
                       'theiv12bytes') AS no_aad
    """).collect()[0]
    ref = AESGCM(key)
    assert bytes(row.with_aad) == ref.encrypt(iv, b"payload", b"the-aad")
    assert bytes(row.no_aad) == ref.encrypt(iv, b"payload", None)

    # CBC too: PKCS#7-padded ciphertext, byte-exact
    from cryptography.hazmat.primitives import padding
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    iv16 = b"theiv16bytes!!!!"
    cbc = ch_sql(spark, """
        SELECT encrypt('aes-256-cbc', 'payload',
                       '32byteskey32byteskey32byteskey32',
                       'theiv16bytes!!!!') AS ct""").collect()[0].ct
    padder = padding.PKCS7(128).padder()
    data = padder.update(b"payload") + padder.finalize()
    enc = Cipher(algorithms.AES(key), modes.CBC(iv16)).encryptor()
    assert bytes(cbc) == enc.update(data) + enc.finalize()


def test_aes_stream_modes_byte_parity(spark):
    """aes-*-ctr/ofb/cfb128/cfb8 (round 12: the former 'no Spark
    carrier' refusal, now a cryptography-backed stream UDF): byte
    parity against the OpenSSL reference, encrypt->decrypt round trip,
    output length == input length (no padding), and the wrong-key-size
    loud raise."""
    pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    key = b"32byteskey32byteskey32byteskey32"
    iv = b"theiv16bytes!!!!"
    row = ch_sql(spark, """
        SELECT encrypt('aes-256-ctr', 'payload7', k, v) AS ctr,
               encrypt('aes-256-ofb', 'payload7', k, v) AS ofb,
               encrypt('aes-256-cfb128', 'payload7', k, v) AS cfb,
               encrypt('aes-256-cfb8', 'payload7', k, v) AS cfb8,
               decrypt('aes-256-ctr',
                       encrypt('aes-256-ctr', 'payload7', k, v),
                       k, v) AS rt,
               decrypt('aes-256-cfb128',
                       encrypt('aes-256-cfb128', 'payload7', k, v),
                       k, v) AS rt_cfb
        FROM VALUES ('32byteskey32byteskey32byteskey32',
                     'theiv16bytes!!!!') AS t(k, v)
    """).collect()[0]

    def ref(mode):
        enc = Cipher(algorithms.AES(key), mode(iv)).encryptor()
        return enc.update(b"payload7") + enc.finalize()

    assert bytes(row.ctr) == ref(modes.CTR)
    assert bytes(row.ofb) == ref(modes.OFB)
    assert bytes(row.cfb) == ref(modes.CFB)
    assert bytes(row.cfb8) == ref(modes.CFB8)
    assert len(row.ctr) == 8                  # stream: no padding
    assert bytes(row.rt) == b"payload7" and bytes(row.rt_cfb) == \
        b"payload7"

    with pytest.raises(Exception, match="key must be"):
        ch_sql(spark, "SELECT encrypt('aes-256-ctr', 'x', 'shortkey', "
                      "'theiv16bytes!!!!') AS e").collect()


def test_ripemd160_vector(spark):
    """ripeMD160 (round 12: the former OpenSSL-legacy refusal, probed
    at registration): ISO/IEC 10118-3 published vectors."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, "SELECT ripeMD160('abc') AS a, "
                        "RIPEMD160('') AS e, "
                        "ripeMD160('message digest') AS m").collect()[0]
    assert row.a == "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"
    assert row.e == "9c1185a5c5e9fc54612808977ee8f548b2258d31"
    assert row.m == "5d0689ef49d2fae572b881b123a85ffa21595f36"


def test_limit_by_ignores_subquery_order_by(spark):
    """A pre-round-12 hazard: the LIMIT BY wrap's ORDER BY extraction
    was not subquery-safe — an ORDER BY inside a derived table/CTE
    truncated the body mid-expression. Must now translate cleanly and
    keep the inner ORDER BY (it bounds the inner LIMIT 5)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rows = ", ".join(f"({k}, {n})" for k, n in
                     [(1, 9), (1, 7), (1, 5), (2, 8), (2, 6), (2, 4)])
    got = ch_sql(spark, f"""
        SELECT k, n FROM (SELECT k, n FROM VALUES {rows} AS t(k, n)
                          ORDER BY n LIMIT 4) s
        LIMIT 1 BY k""").collect()
    # inner: the 4 smallest n (4,5,6,7); outer: one row per k
    assert sorted(r.k for r in got) == [1, 2]
    assert all(r.n <= 7 for r in got)

    # CTE body: same hazard through the WITH path
    got2 = ch_sql(spark, f"""
        WITH c AS (SELECT k, n FROM VALUES {rows} AS t(k, n)
                   ORDER BY n LIMIT 4)
        SELECT k, n FROM c ORDER BY k, n LIMIT 1 BY k""").collect()
    assert [(r.k, r.n) for r in got2] == [(1, 5), (2, 4)]


def test_limit_by_and_distinct_on_nested_in_subqueries(spark):
    """Round 12: LIMIT n BY and DISTINCT ON inside derived tables,
    IN-subqueries, and CTE bodies wrap their OWN span (innermost
    first) instead of garbling the outer query."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rows = ", ".join(f"({k}, {n})" for k, n in
                     [(1, 9), (1, 7), (2, 8), (2, 6), (3, 5)])
    src = f"VALUES {rows} AS t(k, n)"

    got = ch_sql(spark, f"""
        SELECT * FROM (SELECT k, n FROM {src}
                       ORDER BY k, n DESC LIMIT 1 BY k) s
        WHERE n > 5""").collect()
    assert sorted((r.k, r.n) for r in got) == [(1, 9), (2, 8)]

    got = ch_sql(spark, f"""
        SELECT 'hit' AS tag FROM (SELECT 3 AS a) u
        WHERE a IN (SELECT k FROM {src}
                    ORDER BY k, n LIMIT 1 BY k)""").collect()
    assert [r.tag for r in got] == ["hit"]

    got = ch_sql(spark, f"""
        SELECT * FROM (SELECT DISTINCT ON (k) k, n FROM {src}
                       ORDER BY k, n) s WHERE n < 7""").collect()
    assert sorted((r.k, r.n) for r in got) == [(2, 6), (3, 5)]

    got = ch_sql(spark, f"""
        WITH best AS (SELECT k, n FROM {src}
                      ORDER BY k, n DESC LIMIT 1 BY k)
        SELECT sum(n) AS s FROM best""").collect()
    assert got[0].s == 22  # 9 + 8 + 5


def test_qualify_nested_in_subquery(spark):
    """Round 12: QUALIFY inside a derived table wraps its own span."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    rows = ", ".join(f"({k}, {n})" for k, n in
                     [(1, 9), (1, 7), (2, 8), (2, 6)])
    got = ch_sql(spark, f"""
        SELECT * FROM (
          SELECT k, n,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY n DESC)
                     AS rn
          FROM VALUES {rows} AS t(k, n)
          QUALIFY rn = 1) s
        WHERE n > 8""").collect()
    assert [(r.k, r.n) for r in got] == [(1, 9)]


def test_array_join_nested_in_subquery(spark):
    """Round 12: ARRAY JOIN inside a derived table rewrites (and
    substitutes) within its own span."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    spark.sql("SELECT * FROM VALUES (1, ARRAY(10, 20)), "
              "(2, ARRAY(30)) AS t(id, arr)") \
        .createOrReplaceTempView("aj_nested_t")
    got = ch_sql(spark, """
        SELECT * FROM (
          SELECT id, v FROM aj_nested_t
          ARRAY JOIN arr AS v) s
        WHERE v > 15 ORDER BY id, v""").collect()
    assert [(r.id, r.v) for r in got] == [(1, 20), (2, 30)]

    # bare-name form nested: the array name means its element inside
    # the span, and the outer query sees the exploded column
    got = ch_sql(spark, """
        SELECT sum(arr) AS s FROM (
          SELECT arr FROM aj_nested_t ARRAY JOIN arr) q""").collect()
    assert got[0].s == 60


def test_r12_probe_gap_names(spark):
    """Round-12 resolve-probe gap closures: stringCompare (2- and
    5-arg window form), to/fromUnixTimestamp64Second."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, """
        SELECT stringCompare('abc', 'abd') AS lt,
               stringCompare('abd', 'abc') AS gt,
               stringCompare('abc', 'abc') AS eq,
               stringCompare('xabcy', 'zabcw', 1, 1, 3) AS win_eq,
               stringCompare('xabcy', 'zabdw', 1, 1, 3) AS win_lt,
               toUnixTimestamp64Second(
                   toDateTime('2024-02-15 10:00:00')) AS ts_s,
               fromUnixTimestamp64Second(1707991200) AS from_s
    """).collect()[0]
    assert (row.lt, row.gt, row.eq) == (-1, 1, 0)
    assert (row.win_eq, row.win_lt) == (0, -1)
    assert row.ts_s == 1707991200
    import datetime
    assert row.from_s == datetime.datetime(2024, 2, 15, 10, 0)


def test_json_merge_patch_rfc7386(spark):
    """JSONMergePatch (round 12, former refusal): RFC 7386 semantics —
    recursive object merge, null removes, non-object replaces, N-arg
    left fold. Cases from the RFC's own example table."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    row = ch_sql(spark, """
        SELECT JSONMergePatch('{"a":"b"}', '{"a":"c"}') AS replace,
               JSONMergePatch('{"a":"b"}', '{"b":"c"}') AS add,
               JSONMergePatch('{"a":"b"}', '{"a":null}') AS remove,
               JSONMergePatch('{"a":{"b":"c"}}',
                              '{"a":{"b":"d","c":null}}') AS nested,
               JSONMergePatch('{"a":[1,2]}', '{"a":[3]}') AS arr,
               JSONMergePatch('{"a":1}', '{"b":2}', '{"c":3}') AS three,
               jsonMergePatch('{"x":1}', '{"x":{"y":2}}') AS alias_obj
    """).collect()[0]
    import json
    assert json.loads(row.replace) == {"a": "c"}
    assert json.loads(row.add) == {"a": "b", "b": "c"}
    assert json.loads(row.remove) == {}
    assert json.loads(row.nested) == {"a": {"b": "d"}}
    assert json.loads(row.arr) == {"a": [3]}     # arrays replace whole
    assert json.loads(row.three) == {"a": 1, "b": 2, "c": 3}
    assert json.loads(row.alias_obj) == {"x": {"y": 2}}

    with pytest.raises(Exception, match="not valid JSON"):
        ch_sql(spark, "SELECT JSONMergePatch('{', '{}') AS v").collect()


def test_student_ttest_one_sample(spark):
    """studentTTestOneSample (round 12): t pinned against the python
    closed form; p via the documented normal approximation (same
    deviation stance as welch/studentTTest)."""
    import math
    import statistics

    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    xs = [4.2, 5.1, 3.8, 4.9, 5.5, 4.0, 4.7, 5.2]
    mu = 4.0
    vals = ", ".join(f"({x!r})" for x in xs)
    row = ch_sql(spark, f"""
        SELECT studentTTestOneSample(x, {mu}) AS r
        FROM VALUES {vals} AS t(x)""").collect()[0].r
    n = len(xs)
    t_exp = ((statistics.mean(xs) - mu) * math.sqrt(n)
             / statistics.stdev(xs))
    p_exp = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(t_exp)
                                               / math.sqrt(2.0))))
    assert abs(row.t_stat - t_exp) < 1e-9
    assert abs(row.p_value - p_exp) < 1e-6


def test_array_normalized_gini_docs_example(spark):
    """arrayNormalizedGini (round 12, former refusal): pinned to the
    upstream documentation's own example values."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    r = ch_sql(spark, """
        SELECT arrayNormalizedGini([0.9, 0.3, 0.8, 0.7],
                                   [6, 1, 0, 2]) AS g""").collect()[0].g
    assert abs(r._1 - 0.18055555555555558) < 1e-12
    assert abs(r._2 - 0.2638888888888889) < 1e-12
    assert abs(r._3 - 0.6842105263157896) < 1e-12
    # perfect ranking: predicted order == label order -> normalized 1
    r = ch_sql(spark, """
        SELECT arrayNormalizedGini([0.4, 0.3, 0.2, 0.1],
                                   [9, 5, 3, 1]) AS g""").collect()[0].g
    assert abs(r._3 - 1.0) < 1e-12
