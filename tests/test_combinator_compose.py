"""Generic aggregate-combinator composition (round 8 — the dialect's
suffix-peeling parser, ch_sql._compose_combinators, mirroring upstream's
mechanical combinator registry [U] src/AggregateFunctions/Combinators/).

Differential battery: every (base x valid stack) pairing class runs
through ch_sql on a fixture with NULL elements, NULL arrays/maps, empty
arrays and ragged shapes, and is replayed in DuckDB through an
INDEPENDENT formulation (unnest/list algebra, not the translated SQL).
"""

from __future__ import annotations

import duckdb
import pytest

FIXTURE = [
    (1, 1, [1, 2, None], {"a": 1, "b": 2}),
    (1, 2, [3], {"a": 10, "c": 5}),
    (1, 3, None, None),
    (2, 4, [], {"b": 7}),
    (2, 6, [5, None], {"b": 1, "a": None}),
    (3, 9, None, None),              # group with NO array/map data
]


@pytest.fixture(scope="module")
def cb_view(spark):
    spark.createDataFrame(
        FIXTURE, "k int, x int, arr array<int>, m map<string,int>") \
        .createOrReplaceTempView("cb_t")
    return "cb_t"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE cb_t AS
        SELECT * FROM (VALUES
          (1, 1, [1, 2, NULL], MAP(['a','b'], [1, 2])),
          (1, 2, [3], MAP(['a','c'], [10, 5])),
          (1, 3, NULL, NULL),
          (2, 4, [], MAP(['b'], [7])),
          (2, 6, [5, NULL], MAP(['b','a'], [1, NULL])),
          (3, 9, NULL, NULL)
        ) AS t(k, x, arr, m)""")
    yield con
    con.close()


def _spark_rows(spark, sql):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    return {r[0]: tuple(r)[1:] for r in ch_sql(spark, sql).collect()}


def _duck_rows(duck, sql):
    out = {}
    for row in duck.execute(sql).fetchall():
        out[row[0]] = row[1:]
    return out


def _cmp(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) < 1e-9
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_cmp(x, y) for x, y in zip(a, b))
    return a == b


# per-row non-null element list (DuckDB side)
_NN = "list_filter(arr, __e -> __e IS NOT NULL)"


def test_scalar_and_array_stacks(spark, duck, cb_view):
    got = _spark_rows(spark, """
        SELECT k,
               toInt64(sumArray(arr)) AS sa,
               toInt64(sumArrayIf(arr, x % 2 = 0)) AS sai,
               round(avgArray(arr), 6) AS aa,
               countArray(arr) AS ca,
               countArrayIfOrNull(arr, x < 0) AS caon,
               toInt64(minArray(arr)) AS mna,
               toInt64(maxArrayIf(arr, x % 2 = 1)) AS mxa,
               uniqExactArray(arr) AS uea,
               arraySort(arrayFilter(__e -> __e IS NOT NULL,
                                     groupUniqArrayArray(arr))) AS gua,
               arraySort(groupArrayArrayIf(arr, x % 2 = 1)) AS gaa,
               countDistinctIf(x % 2, x > 1) AS cdi,
               toInt64(sumDistinct(x % 3)) AS sd,
               toInt64(sumDistinctIf(x % 3, x > 1)) AS sdi,
               countIfOrNull(x < 0) AS cio,
               uniqExactArrayOrNull(arr) AS ueao
        FROM cb_t GROUP BY k""")
    want = _duck_rows(duck, f"""
        SELECT k,
          CAST(sum(list_sum({_NN})) AS BIGINT) AS sa,
          CAST(sum(CASE WHEN x % 2 = 0 THEN list_sum({_NN}) END)
               AS BIGINT) AS sai,
          round(CAST(sum(list_sum({_NN})) AS DOUBLE)
                / sum(CASE WHEN arr IS NULL THEN 0
                      ELSE len({_NN}) END), 6) AS aa,
          CAST(coalesce(sum(CASE WHEN arr IS NULL THEN 0
                            ELSE len({_NN}) END), 0) AS BIGINT) AS ca,
          CAST(nullif(coalesce(sum(CASE WHEN x < 0 AND arr IS NOT NULL
                                    THEN len({_NN}) ELSE 0 END), 0), 0)
               AS BIGINT) AS caon,
          CAST(min(list_min({_NN})) AS BIGINT) AS mna,
          CAST(max(CASE WHEN x % 2 = 1 THEN list_max({_NN}) END)
               AS BIGINT) AS mxa,
          CAST(coalesce(len(list_distinct(flatten(
              list({_NN}) FILTER (arr IS NOT NULL)))), 0)
               AS BIGINT) AS uea,
          list_sort(list_distinct(coalesce(flatten(
              list(arr) FILTER (arr IS NOT NULL)),
              CAST([] AS INT[]))), 'ASC', 'NULLS LAST') AS gua,
          list_sort(coalesce(flatten(list(arr)
              FILTER (arr IS NOT NULL AND x % 2 = 1)),
              CAST([] AS INT[])), 'ASC', 'NULLS LAST') AS gaa,
          CAST(count(DISTINCT CASE WHEN x > 1 THEN x % 2 END)
               AS BIGINT) AS cdi,
          CAST(sum(DISTINCT x % 3) AS BIGINT) AS sd,
          CAST(sum(DISTINCT CASE WHEN x > 1 THEN x % 3 END)
               AS BIGINT) AS sdi,
          CAST(nullif(count(CASE WHEN x < 0 THEN 1 END), 0)
               AS BIGINT) AS cio,
          CAST(nullif(coalesce(len(list_distinct(flatten(
              list({_NN}) FILTER (arr IS NOT NULL)))), 0), 0)
               AS BIGINT) AS ueao
        FROM cb_t GROUP BY k""")
    assert set(got) == set(want)
    for k in got:
        for i, (g, w) in enumerate(zip(got[k], want[k])):
            assert _cmp(g, w), (k, i, g, w)
    # NULL elements are retained as distinct values (DuckDB's
    # list_distinct drops them, so this pins the Spark side alone)
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    raw = ch_sql(spark, "SELECT groupUniqArrayArray(arr) AS g "
                        "FROM cb_t WHERE k = 1 GROUP BY k").collect()[0]
    assert None in raw.g and {1, 2, 3} <= {v for v in raw.g
                                           if v is not None}


def test_map_stacks(spark, duck, cb_view):
    got = _spark_rows(spark, """
        SELECT k,
               map_keys(sumMap(m)) AS smk,
               arrayMap(__v -> toInt64(__v), map_values(sumMap(m))) AS smv,
               arrayMap(__v -> toInt64(__v), map_values(minMap(m))) AS mnv,
               map_keys(maxMapIf(m, x % 2 = 0)) AS mxk,
               arrayMap(__v -> toInt64(__v),
                        map_values(maxMapIf(m, x % 2 = 0))) AS mxv,
               map_values(countMap(m)) AS cmv,
               arrayMap(__v -> round(__v, 6), map_values(avgMap(m))) AS amv
        FROM cb_t GROUP BY k""")
    # DuckDB replay: unnest entries per group, re-aggregate by key.
    # The -If map variants union keys over PASSING rows only, so the
    # filtered aggregate replays from its own row subset.
    want = _duck_rows(duck, """
        WITH e AS (
          SELECT k, x, unnest(map_entries(m), recursive := true)
          FROM cb_t WHERE m IS NOT NULL),
        base AS (
          SELECT k, list(key ORDER BY key) AS smk,
                 list(CAST(s AS BIGINT) ORDER BY key) AS smv,
                 list(CAST(mn AS BIGINT) ORDER BY key) AS mnv,
                 list(CAST(c AS BIGINT) ORDER BY key) AS cmv,
                 list(round(av, 6) ORDER BY key) AS amv
          FROM (SELECT k, key, sum(value) AS s, min(value) AS mn,
                       count(value) AS c, avg(value) AS av
                FROM e GROUP BY k, key)
          GROUP BY k),
        filt AS (
          SELECT k, list(key ORDER BY key) AS mxk,
                 list(CAST(mx AS BIGINT) ORDER BY key) AS mxv
          FROM (SELECT k, key, max(value) AS mx
                FROM e WHERE x % 2 = 0 GROUP BY k, key)
          GROUP BY k)
        SELECT base.k, smk, smv, mnv, mxk, mxv, cmv, amv
        FROM base LEFT JOIN filt ON base.k = filt.k""")
    assert set(got) >= set(want)
    for k in want:
        for i, (g, w) in enumerate(zip(got[k], want[k])):
            assert _cmp(g, w), (k, i, g, w)
    # groups with no map rows at all -> NULL maps
    assert got[3] == (None,) * 7


def test_foreach_stack(spark, cb_view):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    r = {row.k: row for row in ch_sql(spark, """
        SELECT k, sumForEachIf([x, x * 2], x % 2 = 0) AS s,
               avgForEachOrNull([x, x]) AS a
        FROM cb_t GROUP BY k""").collect()}
    assert r[1].s == [2, 4]            # only x=2 passes the If
    assert r[2].s == [10, 20]          # x=4 and x=6
    assert r[3].s is None              # x=9 fails the If -> nothing
    assert r[1].a == [2.0, 2.0]


def test_invalid_stacks_refuse(spark):
    from clickhouse_clickhouse_spark.ch_sql import translate

    for bad, msg in [
        ("SELECT sumIfArray(a, c) FROM t", "structural"),
        ("SELECT medianArray(a) FROM t", "not supported"),
        ("SELECT sumArrayMap(m) FROM t", "structural"),
        ("SELECT corrDistinct(a, b) FROM t", "Distinct"),
        ("SELECT sumArrayIf(a) FROM t", "argument"),
        ("SELECT medianForEach(a) FROM t", "not supported"),
    ]:
        with pytest.raises(ValueError, match=msg):
            translate(bad)


def test_unknown_names_pass_through(spark):
    """Names that don't peel to a base must translate untouched (the
    composer must not hijack scalar functions or Spark built-ins)."""
    from clickhouse_clickhouse_spark.ch_sql import translate

    assert "toDecimalOrNull(x)" in translate(
        "SELECT toDecimalOrNull(x) FROM t")
    # arrayMap is an enumerated scalar template, not sum+...+Map
    assert "TRANSFORM(a, __x -> __x)" in translate(
        "SELECT arrayMap(__x -> __x, a) FROM t")
    # bare bases translate through their native/enumerated route
    # (the r11 ch_compat empty-set wrap applies in scalar positions)
    assert translate("SELECT sum(x) FROM t") == \
        "SELECT COALESCE(sum(x), 0) FROM t"
    assert translate("SELECT k, sum(x) FROM t GROUP BY k") == \
        "SELECT k, sum(x) FROM t GROUP BY k"


def _grid_cases():
    """Full valid cross-product of base x {Array} x {Distinct} x {If}
    x {OrNull} (ForEach/Map pairings covered by the class battery
    above). Returns (name, spark_expr, duck_expr) triples built from
    INDEPENDENT formulations (DuckDB uses FILTER clauses + list
    algebra, never the translated SQL)."""
    nn = "list_filter(arr, __e -> __e IS NOT NULL)"
    row_cnt = f"(CASE WHEN arr IS NULL THEN 0 ELSE len({nn}) END)"
    duck_arr = {
        "sum": ("CAST(sum(list_sum({nn})){f} AS BIGINT)", False),
        "min": ("min(list_min({nn})){f}", False),
        "max": ("max(list_max({nn})){f}", False),
        "count": (f"CAST(coalesce(sum({row_cnt}){{f}}, 0) AS BIGINT)",
                  True),
        "avg": (f"(CAST(sum(list_sum({nn})){{f}} AS DOUBLE) / "
                f"sum({row_cnt}){{f}})", False),
        "uniqExact": ("CAST(coalesce(len(list_distinct(flatten("
                      "list({nn}) FILTER (arr IS NOT NULL{andc})))), 0)"
                      " AS BIGINT)", True),
    }
    duck_scalar = {
        "sum": ("CAST(sum({d}v){f} AS BIGINT)", False),
        "min": ("min({d}v){f}", False),
        "max": ("max({d}v){f}", False),
        "count": ("CAST(count({d}v){f} AS BIGINT)", True),
        "avg": ("avg({d}v){f}", False),
        "uniqExact": ("CAST(count(DISTINCT v){f} AS BIGINT)", True),
    }
    cases = []
    for base in duck_scalar:
        for arr in (False, True):
            for dist in (False, True):
                if dist and (arr or base == "uniqExact"):
                    continue
                for if_ in (False, True):
                    for ornull in (False, True):
                        name = (base + ("Array" if arr else "")
                                + ("Distinct" if dist else "")
                                + ("If" if if_ else "")
                                + ("OrNull" if ornull else ""))
                        if name == base:
                            continue
                        sargs = "arr" if arr else "x % 4"
                        if base == "count" and not arr and not dist:
                            # nullary upstream form: countIf(cond)
                            sexpr = (f"{name}(x % 2 = 0)" if if_
                                     else f"{name}({sargs})")
                        else:
                            sexpr = f"{name}({sargs}" + \
                                (", x % 2 = 0)" if if_ else ")")
                        f = " FILTER (x % 2 = 0)" if if_ else ""
                        if arr:
                            t, counting = duck_arr[base]
                            d = t.format(
                                nn=nn, f=f,
                                andc=" AND x % 2 = 0" if if_ else "")
                        else:
                            t, counting = duck_scalar[base]
                            d = t.format(d="DISTINCT " if dist else "",
                                         f=f)
                        if ornull and counting:
                            d = f"nullif({d}, 0)"
                        cases.append((name, sexpr, d))
    return cases


def test_combinator_stack_grid(spark, duck, cb_view):
    """Every valid scalar/array combinator stack, differential vs
    DuckDB (independent FILTER-clause formulation); NULL arrays, NULL
    elements, empty arrays, an all-filtered group, and an empty-data
    group are all in the fixture."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    cases = _grid_cases()
    # integer sums widen to BIGINT on the DuckDB side — match them
    scols = ",\n".join(
        f"{'toInt64(' + s + ')' if n.startswith('sum') else s} AS c{i}"
        for i, (n, s, _) in enumerate(cases))
    got = {r[0]: tuple(r)[1:] for r in ch_sql(
        spark, f"SELECT k, {scols} FROM cb_t GROUP BY k").collect()}
    dcols = ",\n".join(f"{d} AS c{i}"
                       for i, (_, _, d) in enumerate(cases))
    want = {}
    for row in duck.execute(
            "WITH s AS (SELECT k, x, arr, x % 4 AS v FROM cb_t) "
            f"SELECT k, {dcols} FROM s GROUP BY k").fetchall():
        want[row[0]] = row[1:]
    assert set(got) == set(want)
    bad = []
    for k in got:
        for i, (g, w) in enumerate(zip(got[k], want[k])):
            if not _cmp(g, w):
                bad.append((k, cases[i][0], g, w))
    assert not bad, f"{len(bad)} grid mismatches; first 5: {bad[:5]}"


def test_integer_sum_widens_past_int32(spark, cb_view):
    """Round-8 review finding: integral accumulators widen to BIGINT
    (the reference widens Int32 sums to Int64) — a bare type-preserving
    fold would silently wrap past 2^31 with ANSI off."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    spark.createDataFrame(
        [(1, [2000000000, 2000000000], {"a": 2000000000}),
         (1, [2000000000, 2000000000], {"a": 2000000000})],
        "k int, arr array<int>, m map<string,int>") \
        .createOrReplaceTempView("wide_t")
    r = ch_sql(spark, """
        SELECT sumArray(arr) AS sa, sumForEach(arr) AS sf,
               map_values(sumMap(m)) AS sm
        FROM wide_t GROUP BY k""").collect()[0]
    assert r.sa == 8000000000
    assert r.sf == [4000000000, 4000000000]
    assert r.sm == [4000000000]


def test_estimate_and_misc_base_if_forms(spark, cb_view):
    """Round-8 late batch: uniq-family estimates, avgWeighted and
    groupBit* compose with -If (the CASE wrap feeds NULL, which the
    sketch/bit aggregates skip)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    spark.createDataFrame([(i, i % 3, float(i)) for i in range(12)],
                          "x int, g int, w double") \
        .createOrReplaceTempView("nb_if")
    r = ch_sql(spark, """
        SELECT uniqIf(g, x > 5) AS u,
               uniqCombined64If(g, x > 5) AS uc,
               round(avgWeightedIf(x, w, x % 2 = 0), 6) AS aw,
               groupBitOrIf(x, x < 4) AS bo
        FROM nb_if""").collect()[0]
    assert r.u == 3 and r.uc == 3       # g in {0,1,2} over x=6..11
    evens = [i for i in range(12) if i % 2 == 0]
    assert abs(r.aw - round(sum(i * float(i) for i in evens)
                            / sum(float(i) for i in evens), 6)) < 1e-9
    assert r.bo == 3


def test_composer_name_fuzz_never_crashes():
    """Random base x suffix-permutation names must either translate or
    raise ValueError — never an unhandled exception (the composer sits
    on the path of EVERY unknown identifier)."""
    import itertools
    import random

    from clickhouse_clickhouse_spark.ch_sql import translate

    rnd = random.Random(88)
    bases = ["sum", "avg", "min", "max", "count", "any", "uniqExact",
             "groupArray", "argMin", "median", "uniq", "avgWeighted",
             "notABase", "toDecimal", "arrayMap", ""]
    sufs = ["If", "OrNull", "Array", "Distinct", "ForEach",
            "Map", "State", "Merge"]
    n_ok = n_refused = 0
    for _ in range(400):
        name = rnd.choice(bases) + "".join(
            rnd.choice(sufs) for _ in range(rnd.randint(0, 3)))
        if not name:
            continue
        nargs = rnd.randint(0, 4)
        args = ", ".join(f"c{i}" for i in range(nargs))
        try:
            translate(f"SELECT {name}({args}) FROM t")
            n_ok += 1
        except ValueError:
            n_refused += 1
    # sanity: the fuzz hit both outcomes
    assert n_ok > 50 and n_refused > 50, (n_ok, n_refused)
    # every enumerated base x single suffix with the right arity either
    # translates or refuses with ValueError
    for base, suf in itertools.product(bases[:12], sufs):
        for n in (1, 2, 3):
            args = ", ".join(f"c{i}" for i in range(n))
            try:
                translate(f"SELECT {base}{suf}({args}) FROM t")
            except ValueError:
                pass


def test_state_merge_two_phase_equals_direct(spark):
    """-State/-Merge composition (round 8): two-phase through dialect
    SQL equals the one-phase aggregate for EVERY supported base,
    including the sketch estimates (lossless HLL/theta union at fixed
    config) and array collectors; invalid compositions refuse."""
    import pytest as _p

    from clickhouse_clickhouse_spark.ch_sql import ch_sql, translate

    spark.range(100).selectExpr("id AS x", "id % 7 AS g", "id % 5 AS p") \
        .createOrReplaceTempView("sm_t")
    two = {r.g: tuple(r)[1:] for r in ch_sql(spark, """
        SELECT g, toInt64(sumMerge(s)) AS s, countMerge(c) AS c,
               round(avgMerge(a), 6) AS a, uniqMerge(u) AS u,
               uniqThetaMerge(ut) AS ut, uniqExactMerge(ue) AS ue,
               toInt64(maxMerge(mx)) AS mx,
               arraySort(groupUniqArrayMerge(ga)) AS ga
        FROM (SELECT g, p, sumState(x) AS s, countState() AS c,
                     avgState(x) AS a, uniqState(x) AS u,
                     uniqThetaState(x) AS ut, uniqExactState(x) AS ue,
                     maxState(x) AS mx,
                     groupUniqArrayState(x % 3) AS ga
              FROM sm_t GROUP BY g, p) t
        GROUP BY g""").collect()}
    one = {r.g: tuple(r)[1:] for r in ch_sql(spark, """
        SELECT g, toInt64(sum(x)) AS s, count() AS c,
               round(avg(x), 6) AS a, uniq(x) AS u, uniqTheta(x) AS ut,
               uniqExact(x) AS ue, toInt64(max(x)) AS mx,
               arraySort(groupUniqArray(x % 3)) AS ga
        FROM sm_t GROUP BY g""").collect()}
    assert two == one
    # -If composes under -State
    r = ch_sql(spark, """
        SELECT toInt64(sumMerge(s)) AS s FROM (
          SELECT g, sumIfState(x, x % 2 = 0) AS s
          FROM sm_t GROUP BY g) t""").collect()[0]
    assert r.s == sum(i for i in range(100) if i % 2 == 0)
    for bad, msg in [
        ("SELECT corrState(x, p) FROM t", "not supported"),
        ("SELECT sumStateOrNull(x) FROM t", "OrNull"),
        ("SELECT sumStateMerge(x) FROM t", "composes only"),
        # structural AFTER -State is the wrong order (upstream names put
        # the structural combinator before -State: sumMapState)
        ("SELECT sumStateMap(x) FROM t", "structural"),
        ("SELECT avgMapState(x) FROM t", "not supported"),
        ("SELECT quantileTimingState(0.5)(x) FROM t", "not supported"),
    ]:
        with _p.raises(ValueError, match=msg):
            translate(bad)


def test_state_merge_structural_and_parametric(spark):
    """Round 9: -State/-Merge under ONE structural combinator
    (sumMapState, countForEachState, maxArrayState, ...) and for
    parametric quantile bases ([U] src/AggregateFunctions/Combinators/
    AggregateFunctionState.h — quantileState is the canonical
    AggregatingMergeTree column type). Exact bases: two-phase ==
    one-phase bit-for-bit; KLL-backed quantile states: rank-error
    tolerance."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    spark.range(100).selectExpr(
        "id AS x", "id % 7 AS g", "id % 5 AS p",
        "map('a', id % 3, 'b', id % 4) AS m",
        "array(id % 3, id % 5, id % 2) AS arr") \
        .createOrReplaceTempView("smsp_t")
    two = ch_sql(spark, """
      SELECT toInt64(sumMapMerge(sm)['a']) AS sma,
             countMapMerge(cm)['b'] AS cmb,
             toInt64(minMapMerge(mm)['a']) AS mma,
             toInt64(sumArrayMerge(sa)) AS sa,
             toInt64(maxArrayMerge(ma)) AS ma,
             sumForEachMerge(sfe) AS sfe, countForEachMerge(cfe) AS cfe,
             uniqExactArrayMerge(uea) AS uea,
             arraySort(groupArrayArrayMerge(gaa)) AS gaa
      FROM (SELECT g, sumMapState(m) AS sm, countMapState(m) AS cm,
                   minMapState(m) AS mm, sumArrayState(arr) AS sa,
                   maxArrayState(arr) AS ma, sumForEachState(arr) AS sfe,
                   countForEachState(arr) AS cfe,
                   uniqExactArrayState(arr) AS uea,
                   groupArrayArrayState(arr) AS gaa
            FROM smsp_t GROUP BY g) s""").collect()[0]
    one = ch_sql(spark, """
      SELECT toInt64(sumMap(m)['a']) AS sma, countMap(m)['b'] AS cmb,
             toInt64(minMap(m)['a']) AS mma,
             toInt64(sumArray(arr)) AS sa, toInt64(maxArray(arr)) AS ma,
             sumForEach(arr) AS sfe, countForEach(arr) AS cfe,
             uniqExactArray(arr) AS uea,
             arraySort(groupArrayArray(arr)) AS gaa
      FROM smsp_t""").collect()[0]
    assert tuple(two) == tuple(one)
    # parametric: quantileExactState/Merge and medianState/Merge are
    # EXACT (raw-collection state + interpolated readout == PERCENTILE);
    # the KLL-backed family reads an actual element within the sketch's
    # rank-error bound of the exact quantile
    rows = ch_sql(spark, """
      SELECT g, quantileExactMerge(0.5)(qe) AS qe, medianMerge(md) AS md,
             quantileMerge(0.5)(q) AS q,
             quantilesMerge(0.25, 0.75)(qs) AS qs,
             groupBitmapMerge(bm) AS bm
      FROM (SELECT g, p, quantileExactState(0.5)(x) AS qe,
                   medianState(x) AS md, quantileState(0.5)(x) AS q,
                   quantilesState(0.25, 0.75)(x) AS qs,
                   groupBitmapState(x % 11) AS bm
            FROM smsp_t GROUP BY g, p) s GROUP BY g""").collect()
    ones = {r.g: r for r in ch_sql(spark, """
      SELECT g, quantileExact(0.5)(x) AS qe, median(x) AS md,
             groupBitmap(x % 11) AS bm
      FROM smsp_t GROUP BY g""").collect()}
    for r in rows:
        o = ones[r.g]
        assert r.qe == o.qe and r.md == o.md and r.bm == o.bm
        # per-group values stride by 7 over ~14 samples: one stride is
        # the max rank-1 gap for an element-valued median readout
        assert abs(r.q - o.md) <= 7.0
        assert r.qs[0] <= r.qs[1]
    # -If composes under parametric -State
    v = ch_sql(spark, """
      SELECT quantileExactMerge(0.5)(s) AS v FROM (
        SELECT g, quantileExactIfState(0.5)(x, x % 2 = 0) AS s
        FROM smsp_t GROUP BY g) t""").collect()[0].v
    exp = ch_sql(spark, "SELECT quantileExactIf(0.5)(x, x % 2 = 0) AS v "
                        "FROM smsp_t").collect()[0].v
    assert v == exp


def test_state_merge_round9_tail(spark):
    """Round-9 tail: argMin/argMax State/Merge (exact, struct partial),
    var/stddev State/Merge (moment partials, float-tolerance vs the
    numerically-stabilized one-phase), merge arity = 1 state column for
    two-argument bases, and the new aggregate scalar names."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    spark.range(100).selectExpr("id AS x", "id % 7 AS g",
                                "pmod(id * 37, 101) AS k") \
        .createOrReplaceTempView("t9sm")
    two = ch_sql(spark, """
      SELECT argMinMerge(amn) AS amn, argMaxMerge(amx) AS amx,
             round(varPopMerge(vp), 9) AS vp,
             round(varSampMerge(vs), 9) AS vs,
             round(stddevPopMerge(sp), 9) AS sp,
             round(stddevSampMerge(ss), 9) AS ss
      FROM (SELECT g, argMinState(x, k) AS amn, argMaxState(x, k) AS amx,
                   varPopState(x) AS vp, varSampState(x) AS vs,
                   stddevPopState(x) AS sp, stddevSampState(x) AS ss
            FROM t9sm GROUP BY g) s""").collect()[0]
    one = ch_sql(spark, """
      SELECT argMin(x, k) AS amn, argMax(x, k) AS amx,
             round(varPop(x), 9) AS vp, round(varSamp(x), 9) AS vs,
             round(stddevPop(x), 9) AS sp, round(stddevSamp(x), 9) AS ss
      FROM t9sm""").collect()[0]
    assert two.amn == one.amn and two.amx == one.amx
    for f in ("vp", "vs", "sp", "ss"):
        assert abs(two[f] - one[f]) < 1e-6, (f, two[f], one[f])
    r2 = ch_sql(spark, """
      SELECT singleValueOrNull(g) AS sv1,
             boundingRatio(x, x * 2 + 1) AS br,
             anyHeavy(g) IS NOT NULL AS ah,
             groupConcat(',')(g) AS gc, groupConcat(g) AS gc0,
             size(groupArrayLast(3)(x)) AS gal
      FROM (SELECT * FROM t9sm WHERE g = 3) s""").collect()[0]
    assert r2.sv1 == 3 and abs(r2.br - 2.0) < 1e-9 and r2.ah
    assert r2.gc.startswith("3,3") and r2.gc0.startswith("33")
    assert r2.gal == 3
    assert ch_sql(spark, "SELECT singleValueOrNull(g) AS sv "
                         "FROM t9sm").collect()[0].sv is None
    rows = ch_sql(spark, """
      SELECT x, lagInFrame(x, 1) OVER (ORDER BY x) AS lg,
             leadInFrame(x) OVER (ORDER BY x) AS ld
      FROM t9sm ORDER BY x LIMIT 3""").collect()
    assert rows[0].lg is None and rows[1].lg == 0 and rows[0].ld == 1
