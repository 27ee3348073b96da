"""SQLancer-style Ternary Logic Partitioning (TLP) fuzz over the
dialect front end (round-5 advice item 6; the reference runs SQLancer in
CI — [U] tests/fuzz, SURVEY.md §5).

Invariant: for ANY predicate p,
    count(WHERE p) + count(WHERE NOT p) + count(WHERE p IS NULL) = count(*)
A translation that mangles a predicate's ternary semantics (dropped
NULL branch, inverted NOT, operator precedence damage) breaks the
partition. Predicates are generated from a grammar over dialect
functions so the TRANSLATOR is what's being fuzzed.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_clickhouse_spark.ch_sql import ch_sql
from clickhouse_clickhouse_spark.tables import load_table

from conftest import SF_DIR

# -- predicate grammar (dialect spellings on the events fixture) ----------

_NUM = st.sampled_from([
    "value", "user_id", "toFloat64(value)",
    "lengthUTF8(event_type)", "modulo(user_id, 7)",
    "round(value, 1)", "abs(value - 25)",
    "if(value > 25, value, NULL)",            # introduces NULLs
    "nullIf(user_id, 7)",
    "position(event_type, 'i')",
    "toHour(ts)", "toDayOfWeek(ts)",
])

_STR = st.sampled_from([
    "event_type", "upper(event_type)", "substring(event_type, 1, 3)",
    "nullIf(event_type, 'click')",            # introduces NULLs
    "concat(event_type, '_x')",
    "if(user_id % 3 == 0, event_type, NULL)",
])

_CMP = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])

_NUM_LIT = st.sampled_from(["0", "3", "25.5", "7", "100"])
_STR_LIT = st.sampled_from(["'click'", "'view'", "'purchase'", "'zz'"])


@st.composite
def _atom(draw):
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return f"{draw(_NUM)} {draw(_CMP)} {draw(_NUM_LIT)}"
    if kind == 1:
        return f"{draw(_STR)} {draw(_CMP)} {draw(_STR_LIT)}"
    if kind == 2:
        return f"{draw(_STR)} LIKE {draw(_STR_LIT)}"
    if kind == 3:
        return (f"{draw(_NUM)} BETWEEN {draw(_NUM_LIT)} "
                f"AND {draw(_NUM_LIT)}")
    return f"has([{draw(_NUM_LIT)}, 7, 42], {draw(_NUM)})"


@st.composite
def _pred(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(_atom())
    op = draw(st.sampled_from(["AND", "OR"]))
    a = draw(_pred(depth=depth - 1))
    b = draw(_pred(depth=depth - 1))
    neg = draw(st.booleans())
    out = f"({a}) {op} ({b})"
    return f"NOT ({out})" if neg else out


@pytest.fixture(scope="module")
def tlp_env(spark):
    load_table(spark, SF_DIR, "events") \
        .createOrReplaceTempView("events_tlp")
    yield spark
    spark.catalog.dropTempView("events_tlp")


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(p=_pred())
def test_tlp_partition_invariant(tlp_env, p):
    spark = tlp_env
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


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(p=_pred())
def test_tlp_aggregate_and_norec(tlp_env, p):
    """Aggregate TLP (sum partitions to the unfiltered sum) + a
    NoREC-style check (WHERE-filtered count == unfiltered sum of
    if(p,1,0) — the optimizer must not change predicate semantics)."""
    spark = tlp_env
    row = ch_sql(spark, f"""
        SELECT round(sum(value), 4) AS total,
               round(sumIf(value, {p}), 4) AS s_t,
               round(sumIf(value, NOT ({p})), 4) AS s_f,
               round(sumIf(value, ({p}) IS NULL), 4) AS s_n,
               countIf({p}) AS c_t,
               toInt64(sum(if({p}, 1, 0))) AS norec
        FROM events_tlp""").collect()[0]
    parts = sum(x for x in (row.s_t, row.s_f, row.s_n) if x is not None)
    assert abs(parts - row.total) < 1e-2, \
        f"aggregate TLP violated for {p!r}: {row}"
    assert row.norec == row.c_t, f"NoREC mismatch for {p!r}: {row}"


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(p=_pred())
def test_tlp_grouped_partition(tlp_env, p):
    """GROUP BY TLP: within every group, the ternary partition must
    tile the group's count (exercises predicate translation under
    grouped aggregation)."""
    spark = tlp_env
    rows = ch_sql(spark, f"""
        SELECT event_type, count() AS total,
               countIf({p}) AS t, countIf(NOT ({p})) AS f,
               countIf(({p}) IS NULL) AS n
        FROM events_tlp GROUP BY event_type""").collect()
    assert rows, "no groups"
    for r in rows:
        assert r.t + r.f + r.n == r.total, \
            f"grouped TLP violated for {p!r} in {r.event_type}: {r}"
