"""Float64-literal typing parity battery (round-11 verdict item 1).

Upstream parses bare non-integer numeric literals as Float64 ([U]
src/Parsers/Lexer number tokens -> Field Float64), so literal math is
IEEE double math: ``0.1 + 0.2 = 0.3`` is FALSE, ``toTypeName(2.5)`` is
``Float64``. Spark types the same literals DECIMAL(p,s); the dialect
closes the gap with a final translate pass that suffixes bare
fractional literals with ``D`` (``ch_sql._float_literal_pass``).

Ground truth here is DuckDB computing the SAME expression with
``<lit>e0`` spellings (DuckDB parses exponent literals as DOUBLE while
its bare fractional literals are DECIMAL — verified in-session, so the
oracle must opt in explicitly). The op set is restricted to IEEE-exact
operations (+ - * / abs least greatest floor ceil sqrt comparisons),
which are correctly rounded in both engines, so results are compared
BIT-EXACTLY — no tolerance.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from clickhouse_clickhouse_spark.ch_sql import ch_sql, translate

N_EXPRS = 240          # expressions per run, batched ~80 per SELECT
SEED = 1101


def _gen(rng: random.Random, depth: int) -> tuple[str, str]:
    """One expression tree -> (dialect text, DuckDB-double text)."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.75:
            lit = (f"{rng.randint(0, 999)}."
                   f"{rng.randint(0, 99999):0{rng.randint(1, 5)}d}")
            return lit, f"{lit}e0"
        n = str(rng.randint(0, 99))
        # bare ints stay ints on both sides (promotion rules kick in
        # identically once a double operand appears)
        return n, n
    kind = rng.randrange(8)
    a_ch, a_dk = _gen(rng, depth - 1)
    if kind < 4:
        op = "+-*/"[kind]
        b_ch, b_dk = _gen(rng, depth - 1)
        if op == "/":
            # nonzero literal divisor; both engines: / is float division
            b_ch = f"{rng.randint(1, 99)}.{rng.randint(1, 99)}"
            b_dk = f"{b_ch}e0"
        return f"({a_ch} {op} {b_ch})", f"({a_dk} {op} {b_dk})"
    if kind == 4:
        return f"abs({a_ch})", f"abs({a_dk})"
    if kind == 5:
        b_ch, b_dk = _gen(rng, depth - 1)
        f = rng.choice(["least", "greatest"])
        return (f"{f}({a_ch}, {b_ch})", f"{f}({a_dk}, {b_dk})")
    if kind == 6:
        f = rng.choice(["floor", "ceil"])
        return (f"CAST({f}({a_ch}) AS DOUBLE)",
                f"CAST({f}({a_dk}) AS DOUBLE)")
    return f"sqrt(abs({a_ch}))", f"sqrt(abs({a_dk}))"


def _norm(v):
    if v is None:
        return None
    f = float(v)
    return "nan" if math.isnan(f) else f


@pytest.mark.parametrize("seed", [SEED, SEED + 1, SEED + 2])
def test_float_literal_differential(spark, seed):
    """N random literal-only IEEE expression trees, bit-exact vs DuckDB
    doubles — batched into a handful of wide SELECTs (one Spark action
    each)."""
    rng = random.Random(seed)
    cases = []
    for i in range(N_EXPRS // 3):
        ch, dk = _gen(rng, rng.randint(1, 4))
        cases.append((f"c{i}", f"CAST({ch} AS Float64)",
                      f"CAST({dk} AS DOUBLE)"))
        if i % 5 == 0:       # comparison results as INT, same trees
            ch2, dk2 = _gen(rng, rng.randint(1, 3))
            op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
            dop = "<>" if op == "!=" else op
            cases.append((f"b{i}",
                          f"CAST(({ch} {op} {ch2}) AS Int32)",
                          f"CAST(({dk} {dop} {dk2}) AS INT)"))
    con = duckdb.connect()
    for lo in range(0, len(cases), 80):
        chunk = cases[lo:lo + 80]
        ch_sel = ", ".join(f"{e} AS {n}" for n, e, _ in chunk)
        dk_sel = ", ".join(f"{e} AS {n}" for n, _, e in chunk)
        got = ch_sql(spark, f"SELECT {ch_sel}").collect()[0]
        want = con.execute(f"SELECT {dk_sel}").fetchone()
        for (name, che, dke), w in zip(chunk, want):
            g = got[name]
            assert _norm(g) == _norm(w), (
                f"{name}: dialect {che!r} -> {g!r} (full repr "
                f"{float(g).hex() if g is not None else None}) vs "
                f"DuckDB {dke!r} -> {w!r}")
    con.close()


def test_float_literal_headliners(spark):
    """The specific observables from the round-10 verdict, plus guard
    rails for where the D suffix must NOT apply."""
    r = ch_sql(spark, """
        SELECT 0.1 + 0.2 = 0.3 AS eq,
               0.1 + 0.2 AS s,
               toTypeName(2.5) AS tn,
               toTypeName(2.5 + 1) AS tn2,
               '1.5' AS strlit,
               round(2.5) AS rb,
               round(2.675, 2) AS r2
        """).collect()[0]
    assert r.eq is False                       # Float64 literal math
    assert r.s == 0.30000000000000004
    assert r.tn == "Float64" and r.tn2 == "Float64"
    assert r.strlit == "1.5"                   # string literals masked
    assert r.rb == 2.0                         # banker's on double
    # 2.675*100 snaps to exactly 267.5 in IEEE double (the exact
    # product 267.49999999999998 is within half-ulp of 267.5), so the
    # scaled banker's round gives 2.68 — same as the decimal path
    assert float(r.r2) == 2.68
    # translate-level pins: D lands on bare fractional literals only
    t = translate("SELECT 1.5, x1.5y, 'a 2.5 b', 2.5e3, 0.5D, t.1 "
                  "FROM (SELECT tuple(7, 8) AS t)")
    assert "1.5D" in t and "'a 2.5 b'" in t and "2.5e3" in t \
        and "0.5DD" not in t
    # TABLESAMPLE percentages keep plain numbers (D is a syntax error)
    t = translate("SELECT * FROM nation SAMPLE 0.125")
    assert "12.5 PERCENT" in t and "12.5D" not in t


def test_float_literal_in_predicates_on_table(spark):
    """Literal-typed predicates over a real column: literal x column
    promotes to double either way, but literal-literal subexpressions
    inside the predicate now fold as Float64 (matches upstream)."""
    from clickhouse_clickhouse_spark.tables import load_table

    from conftest import SF_DIR

    load_table(spark, SF_DIR, "nation").createOrReplaceTempView(
        "flit_nation")
    got = ch_sql(spark, """
        SELECT count(*) AS c FROM flit_nation
        WHERE n_nationkey + 0.1 + 0.2 > n_nationkey + 0.3
        """).collect()[0].c
    con = duckdb.connect()
    con.execute(f"CREATE VIEW nation AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/nation.parquet')")
    want = con.execute(
        "SELECT count(*) FROM nation WHERE "
        "n_nationkey + 0.1e0 + 0.2e0 > n_nationkey + 0.3e0").fetchone()[0]
    con.close()
    # which rows satisfy it depends on each n's double rounding — the
    # point is both engines do the SAME Float64 math (n=0 qualifies,
    # so under exact-decimal typing the count would differ)
    assert got == want and 0 < got < 25
