"""DISTINCT ON / LIMIT n BY differential fuzz (round 12).

Ground truth is DuckDB's NATIVE ``SELECT DISTINCT ON (keys) ... ORDER
BY ...`` (same first-row-per-key-in-order contract as upstream), run
over the SAME literal rows. The generator stresses exactly the surface
`_wrap_order_rewrite` owns: select lists that RENAME, DROP, or
expression-wrap the order/partition columns, positional ORDER BY refs,
ASC/DESC mixes, and ties broken by a unique id so the survivor is
fully deterministic in both engines.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from clickhouse_clickhouse_spark.ch_sql import ch_sql

SEED = 1202
N_CASES = 24           # per seed; each case is one Spark action


def _make_rows(rng: random.Random):
    """Small table with planted ties: (id, k, a, b)."""
    rows = []
    for i in range(rng.randint(12, 30)):
        rows.append((i, rng.randint(0, 3), rng.randint(0, 4),
                     rng.choice(["x", "y", "zz", "w"])))
    return rows


def _gen_case(rng: random.Random):
    """Returns (select_items, order_items) over columns k/a/b/id.

    select items may rename (a AS ax) or wrap (a + 10 AS ap); ORDER BY
    items reference SOURCE spellings (the upstream contract) and end
    with the unique id tiebreaker.
    """
    sel = ["k"]
    ren = {}
    if rng.random() < 0.5:
        sel.append("a AS ax")
        ren["a"] = "ax"
    elif rng.random() < 0.7:
        sel.append("a")
    if rng.random() < 0.5:
        sel.append("a + 10 AS ap")
    if rng.random() < 0.6:
        sel.append("b")
    if rng.random() < 0.4:
        sel.append("id")
    order = []
    pool = ["a", "b", "a % 2", "a + 10"]
    rng.shuffle(pool)
    for c in pool[:rng.randint(1, 3)]:
        order.append(c + rng.choice(["", " ASC", " DESC"]))
    if rng.random() < 0.3:
        order.insert(0, "1")     # positional ref to the first item (k)
    order.append("id")           # unique tiebreak -> deterministic
    return sel, order


@pytest.mark.parametrize("seed", [SEED, SEED + 1])
def test_distinct_on_differential(spark, seed):
    rng = random.Random(seed)
    rows = _make_rows(rng)
    vals = ", ".join(f"({i}, {k}, {a}, '{b}')" for i, k, a, b in rows)
    src = f"(SELECT * FROM VALUES {vals} AS t(id, k, a, b))"
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "AS v(id, k, a, b)")
    for ci in range(N_CASES):
        sel, order = _gen_case(rng)
        sel_txt, ord_txt = ", ".join(sel), ", ".join(order)
        ch_q = (f"SELECT DISTINCT ON (k) {sel_txt} FROM {src} "
                f"ORDER BY {ord_txt}")
        dk_q = (f"SELECT DISTINCT ON (k) {sel_txt} FROM t "
                f"ORDER BY {ord_txt}")
        got = [tuple(r) for r in ch_sql(spark, ch_q).collect()]
        want = [tuple(r) for r in con.execute(dk_q).fetchall()]
        assert sorted(map(repr, got)) == sorted(map(repr, want)), (
            f"case {ci} (seed {seed}):\n  {ch_q}\n  got  {sorted(got)}"
            f"\n  want {sorted(want)}")
    con.close()


def test_limit_by_matches_window_replay(spark):
    """LIMIT 2 BY k with renamed/dropped order columns vs a DuckDB
    row_number replay (DuckDB has no LIMIT BY; the window form IS the
    documented upstream semantics)."""
    rng = random.Random(SEED + 7)
    rows = _make_rows(rng)
    vals = ", ".join(f"({i}, {k}, {a}, '{b}')" for i, k, a, b in rows)
    src = f"(SELECT * FROM VALUES {vals} AS t(id, k, a, b))"
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "AS v(id, k, a, b)")
    got = [tuple(r) for r in ch_sql(
        spark, f"SELECT k, b AS bb FROM {src} "
               "ORDER BY a DESC, id LIMIT 2 BY k").collect()]
    want = [tuple(r) for r in con.execute("""
        SELECT k, bb FROM (
          SELECT k, b AS bb,
                 row_number() OVER (PARTITION BY k
                                    ORDER BY a DESC, id) AS rn
          FROM t) WHERE rn <= 2""").fetchall()]
    assert sorted(got) == sorted(want)
    con.close()


@pytest.mark.parametrize("seed", [SEED + 3])
def test_distinct_on_nested_differential(spark, seed):
    """DISTINCT ON inside a derived table (round-12 recursion), with
    an outer aggregate over the survivors — vs DuckDB's native nested
    DISTINCT ON."""
    rng = random.Random(seed)
    rows = _make_rows(rng)
    vals = ", ".join(f"({i}, {k}, {a}, '{b}')" for i, k, a, b in rows)
    src = f"(SELECT * FROM VALUES {vals} AS t(id, k, a, b))"
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "AS v(id, k, a, b)")
    for _ in range(8):
        sel, order = _gen_case(rng)
        sel_txt, ord_txt = ", ".join(sel), ", ".join(order)
        inner_ch = (f"SELECT DISTINCT ON (k) {sel_txt} FROM {src} "
                    f"ORDER BY {ord_txt}")
        inner_dk = (f"SELECT DISTINCT ON (k) {sel_txt} FROM t "
                    f"ORDER BY {ord_txt}")
        got = [tuple(r) for r in ch_sql(
            spark, f"SELECT count(*) AS c, sum(k) AS sk FROM "
                   f"({inner_ch}) s").collect()]
        want = [tuple(r) for r in con.execute(
            f"SELECT CAST(count(*) AS BIGINT) AS c, "
            f"CAST(sum(k) AS BIGINT) AS sk FROM "
            f"({inner_dk}) s").fetchall()]
        assert got == want
    con.close()
