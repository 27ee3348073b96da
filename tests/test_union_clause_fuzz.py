"""Set-operation branch differential fuzz (round 13).

The round-13 advisor fix made QUALIFY / LIMIT n BY / DISTINCT ON
rewrite PER UNION BRANCH (`ch_sql._branch_start`). This battery fuzzes
exactly that machinery: random two-branch unions where EACH branch
carries its own clause, ground-truthed against DuckDB — QUALIFY is
native there; LIMIT BY replays as the documented row_number window
form. Ties are always broken by the unique id, so both engines are
fully deterministic.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from clickhouse_clickhouse_spark.ch_sql import ch_sql

SEED = 1303
N_CASES = 16


def _make_rows(rng: random.Random):
    rows = []
    for i in range(rng.randint(15, 40)):
        rows.append((i, rng.randint(0, 3), rng.randint(0, 5),
                     rng.choice(["x", "y", "zz", "w"])))
    return rows


def _branch(rng: random.Random):
    """One branch: (kind, ch_sql text, duckdb text) over table t."""
    n = rng.randint(1, 3)
    pred = rng.choice(["a >= 0", "a < 4", "b != 'zz'", "id % 2 = 0"])
    desc = rng.choice(["", " DESC"])
    kind = rng.choice(["limit_by", "qualify", "distinct_on"])
    if kind == "limit_by":
        ch = (f"SELECT k, a, id FROM t WHERE {pred} "
              f"ORDER BY a{desc}, id LIMIT {n} BY k")
        dk = (f"SELECT k, a, id FROM ("
              f"SELECT k, a, id, row_number() OVER (PARTITION BY k "
              f"ORDER BY a{desc}, id) AS rn FROM t WHERE {pred}) "
              f"WHERE rn <= {n}")
    elif kind == "qualify":
        ch = (f"SELECT k, a, id, row_number() OVER (PARTITION BY k "
              f"ORDER BY a{desc}, id) AS rn FROM t WHERE {pred} "
              f"QUALIFY rn <= {n}")
        dk = ch  # DuckDB QUALIFY is native, same spelling
        return kind, ch, dk
    else:
        ch = (f"SELECT DISTINCT ON (k) k, a, id FROM t "
              f"WHERE {pred} ORDER BY a{desc}, id")
        dk = ch  # DuckDB DISTINCT ON is native
    return kind, ch, dk


@pytest.mark.parametrize("seed", [SEED, SEED + 1])
def test_union_branch_clauses_differential(spark, seed):
    rng = random.Random(seed)
    rows = _make_rows(rng)
    vals = ", ".join(f"({i}, {k}, {a}, '{b}')" for i, k, a, b in rows)
    spark.sql(f"SELECT * FROM VALUES {vals} AS t(id, k, a, b)"
              ).createOrReplaceTempView("t")
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "AS v(id, k, a, b)")
    try:
        for ci in range(N_CASES):
            k1, ch1, dk1 = _branch(rng)
            k2, ch2, dk2 = _branch(rng)
            # qualify branches project rn (4 cols); others 3 — only
            # union same-arity kinds
            if (k1 == "qualify") != (k2 == "qualify"):
                k2, ch2, dk2 = k1, ch1, dk1
            setop = rng.choice(["UNION ALL", "UNION DISTINCT"])
            ch_q = f"{ch1} {setop} {ch2}"
            dk_q = f"({dk1}) {setop} ({dk2})"
            got = [tuple(r) for r in ch_sql(spark, ch_q).collect()]
            want = [tuple(r) for r in con.execute(dk_q).fetchall()]
            assert sorted(map(repr, got)) == sorted(map(repr, want)), (
                f"case {ci} (seed {seed}, {k1}+{k2}):\n  {ch_q}\n"
                f"  got  {sorted(got)}\n  want {sorted(want)}")
    finally:
        con.close()
