"""SQLancer-style Ternary Logic Partitioning (TLP) fuzz over the
dialect front end (round-5 advice item 6; the reference runs SQLancer in
CI — [U] tests/fuzz, SURVEY.md §5).

Invariant: for ANY predicate p,
    count(WHERE p) + count(WHERE NOT p) + count(WHERE p IS NULL) = count(*)
A translation that mangles a predicate's ternary semantics (dropped
NULL branch, inverted NOT, operator precedence damage) breaks the
partition. Predicates are generated from a grammar over dialect
functions so the TRANSLATOR is what's being fuzzed.

Round-7: the generator is a SEEDED RNG over the same grammar (was
hypothesis) and the per-predicate checks run on a thread pool
(conftest.run_parallel) — identical example counts and invariants,
reproducible cases, ~6x less wall (the per-case Spark actions
overlap; serial execution was the suite's largest cost).
"""

import random

import pytest

from clickhouse_clickhouse_spark.ch_sql import ch_sql
from clickhouse_clickhouse_spark.tables import load_table

from conftest import SF_DIR, run_parallel

# -- predicate grammar (dialect spellings on the events fixture) ----------

_NUM = [
    "value", "user_id", "toFloat64(value)",
    "lengthUTF8(event_type)", "modulo(user_id, 7)",
    "round(value, 1)", "abs(value - 25)",
    "if(value > 25, value, NULL)",            # introduces NULLs
    "nullIf(user_id, 7)",
    "position(event_type, 'i')",
    "toHour(ts)", "toDayOfWeek(ts)",
]

_STR = [
    "event_type", "upper(event_type)", "substring(event_type, 1, 3)",
    "nullIf(event_type, 'click')",            # introduces NULLs
    "concat(event_type, '_x')",
    "if(user_id % 3 == 0, event_type, NULL)",
]

_CMP = ["=", "!=", "<", "<=", ">", ">="]
_NUM_LIT = ["0", "3", "25.5", "7", "100"]
_STR_LIT = ["'click'", "'view'", "'purchase'", "'zz'"]


def _atom(rnd: random.Random) -> str:
    kind = rnd.randrange(5)
    if kind == 0:
        return f"{rnd.choice(_NUM)} {rnd.choice(_CMP)} " \
               f"{rnd.choice(_NUM_LIT)}"
    if kind == 1:
        return f"{rnd.choice(_STR)} {rnd.choice(_CMP)} " \
               f"{rnd.choice(_STR_LIT)}"
    if kind == 2:
        return f"{rnd.choice(_STR)} LIKE {rnd.choice(_STR_LIT)}"
    if kind == 3:
        return (f"{rnd.choice(_NUM)} BETWEEN {rnd.choice(_NUM_LIT)} "
                f"AND {rnd.choice(_NUM_LIT)}")
    return f"has([{rnd.choice(_NUM_LIT)}, 7, 42], {rnd.choice(_NUM)})"


def _pred(rnd: random.Random, depth: int = 2) -> str:
    if depth == 0 or rnd.random() < 0.5:
        return _atom(rnd)
    op = rnd.choice(["AND", "OR"])
    a = _pred(rnd, depth - 1)
    b = _pred(rnd, depth - 1)
    out = f"({a}) {op} ({b})"
    return f"NOT ({out})" if rnd.random() < 0.5 else out


def _preds(seed: int, n: int) -> list[str]:
    rnd = random.Random(seed)
    return [_pred(rnd) for _ in range(n)]


@pytest.fixture(scope="module")
def tlp_env(spark):
    load_table(spark, SF_DIR, "events") \
        .createOrReplaceTempView("events_tlp")
    yield spark
    spark.catalog.dropTempView("events_tlp")


def test_tlp_partition_invariant(tlp_env):
    spark = tlp_env

    def check(p):
        row = ch_sql(spark, f"""
            SELECT count() AS total,
                   countIf({p}) AS t,
                   countIf(NOT ({p})) AS f,
                   countIf(({p}) IS NULL) AS n
            FROM events_tlp""").collect()[0]
        assert row.t + row.f + row.n == row.total, \
            f"TLP violated for predicate: {p!r} -> {row}"
        # and the WHERE form agrees with the countIf form
        w = ch_sql(spark,
                   f"SELECT count() AS c FROM events_tlp WHERE {p}"
                   ).collect()[0]
        assert w.c == row.t, f"WHERE/countIf mismatch for {p!r}"

    run_parallel(_preds(seed=701, n=120), check)


def test_tlp_aggregate_and_norec(tlp_env):
    """Aggregate TLP (sum partitions to the unfiltered sum) + a
    NoREC-style check (WHERE-filtered count == unfiltered sum of
    if(p,1,0) — the optimizer must not change predicate semantics)."""
    spark = tlp_env

    def check(p):
        row = ch_sql(spark, f"""
            SELECT round(sum(value), 4) AS total,
                   round(sumIf(value, {p}), 4) AS s_t,
                   round(sumIf(value, NOT ({p})), 4) AS s_f,
                   round(sumIf(value, ({p}) IS NULL), 4) AS s_n,
                   countIf({p}) AS c_t,
                   toInt64(sum(if({p}, 1, 0))) AS norec
            FROM events_tlp""").collect()[0]
        parts = sum(x for x in (row.s_t, row.s_f, row.s_n)
                    if x is not None)
        assert abs(parts - row.total) < 1e-2, \
            f"aggregate TLP violated for {p!r}: {row}"
        assert row.norec == row.c_t, f"NoREC mismatch for {p!r}: {row}"

    run_parallel(_preds(seed=702, n=60), check)


def test_tlp_grouped_partition(tlp_env):
    """GROUP BY TLP: within every group, the ternary partition must
    tile the group's count (exercises predicate translation under
    grouped aggregation)."""
    spark = tlp_env

    def check(p):
        rows = ch_sql(spark, f"""
            SELECT event_type, count() AS total,
                   countIf({p}) AS t, countIf(NOT ({p})) AS f,
                   countIf(({p}) IS NULL) AS n
            FROM events_tlp GROUP BY event_type""").collect()
        assert rows, "no groups"
        for r in rows:
            assert r.t + r.f + r.n == r.total, \
                f"grouped TLP violated for {p!r} in {r.event_type}: {r}"

    run_parallel(_preds(seed=703, n=40), check)
