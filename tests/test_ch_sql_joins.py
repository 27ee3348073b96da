"""Dialect ASOF/ANY JOIN translation (round-5 advice item 2): the
common two-table shape routes through operators.joins; edge shapes keep
the loud refusal. Upstream: src/Interpreters/HashJoin/ kind+strictness.
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.ch_sql import ch_sql, translate


@pytest.fixture(scope="module")
def join_tables(spark):
    spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "k int, ts int, lv string").createOrReplaceTempView("sjl")
    spark.createDataFrame(
        [(1, 8, "r1"), (1, 15, "r2"), (2, 15, "r3"), (9, 1, "rx")],
        "k int, rts int, rv string").createOrReplaceTempView("sjr")
    return "sjl", "sjr"


def test_asof_join_backward_inner(spark, join_tables):
    rows = {(r.k, r.ts): (r.rv, r.m) for r in ch_sql(spark, """
        SELECT l.k, l.ts, r.rv, r.rts AS m
        FROM sjl l ASOF JOIN sjr r ON l.k = r.k AND l.ts >= r.rts
    """).collect()}
    # k=1 ts=10 -> rts=8; k=1 ts=20 -> rts=15; k=2 ts=15 -> rts=15 (ties ok)
    assert rows == {(1, 10): ("r1", 8), (1, 20): ("r2", 15),
                    (2, 15): ("r3", 15)}


def test_asof_left_join_strict_backward(spark, join_tables):
    rows = {(r.k, r.ts): r.rv for r in ch_sql(spark, """
        SELECT l.k, l.ts, r.rv FROM sjl l
        ASOF LEFT JOIN sjr r ON l.k = r.k AND l.ts > r.rts
    """).collect()}
    # strict: k=2 ts=15 must NOT see rts=15; left keeps it as NULL
    assert rows == {(1, 10): "r1", (1, 20): "r2", (2, 15): None,
                    (3, 5): None}


def test_asof_join_using_form(spark, join_tables):
    spark.createDataFrame([(1, 9, "u1"), (1, 25, "u2")],
                          "k int, ts int, uv string") \
        .createOrReplaceTempView("sjru")
    rows = {(r.k, r.ts): r.uv for r in ch_sql(spark, """
        SELECT l.k, l.ts, r.uv FROM sjl l ASOF JOIN sjru r USING (k, ts)
    """).collect()}
    assert rows == {(1, 10): "u1", (1, 20): "u1"}


def test_any_left_join_deterministic(spark, join_tables):
    rows = {r.k: r.rv for r in ch_sql(spark, """
        SELECT l.k, r.rv FROM sjl l ANY LEFT JOIN sjr r ON l.k = r.k
    """).collect()}
    # deterministic pick: lexicographic min over the build row
    assert rows == {1: "r1", 2: "r3", 3: None}


def test_any_join_with_trailing_clauses(spark, join_tables):
    out = ch_sql(spark, """
        SELECT l.k, count() AS c FROM sjl l ANY JOIN sjr r ON l.k = r.k
        GROUP BY l.k ORDER BY l.k
    """).collect()
    assert [(r.k, r.c) for r in out] == [(1, 2), (2, 1)]


def test_asof_two_inequalities_refused(spark, join_tables):
    with pytest.raises(ValueError, match="exactly one inequality"):
        ch_sql(spark, """
            SELECT l.k FROM sjl l ASOF JOIN sjr r
            ON l.k = r.k AND l.ts >= r.rts AND l.ts < r.rts""")


def test_any_right_join_refused(spark, join_tables):
    with pytest.raises(ValueError, match="not supported"):
        ch_sql(spark, "SELECT l.k FROM sjl l ANY RIGHT JOIN sjr r "
                      "ON l.k = r.k")


def test_paste_join_still_refuses():
    with pytest.raises(ValueError, match="paste_join"):
        translate("SELECT * FROM a PASTE JOIN b")


def test_asof_subquery_sides(spark, join_tables):
    # round-6: subquery sides (the common migration shape) translate —
    # each side runs through ch_sql recursively, full dialect inside
    rows = {(r.k, r.ts): r.rv for r in ch_sql(spark, """
        SELECT l.k, l.ts, r.rv
        FROM (SELECT k, ts, lv FROM sjl WHERE k != 3) l
        ASOF JOIN (SELECT k, rts, upper(rv) AS rv FROM sjr) r
          ON l.k = r.k AND l.ts >= r.rts
    """).collect()}
    assert rows == {(1, 10): "R1", (1, 20): "R2", (2, 15): "R3"}


def test_asof_subquery_needs_alias(spark, join_tables):
    with pytest.raises(ValueError, match="alias"):
        ch_sql(spark, "SELECT 1 FROM (SELECT * FROM sjl) "
                      "ASOF JOIN sjr r ON sjl.k = r.k AND sjl.ts >= r.rts")


def test_global_any_join_translates(spark, join_tables):
    # GLOBAL is distribution advice, not semantics
    rows = {r.k: r.rv for r in ch_sql(spark, """
        SELECT l.k, r.rv FROM sjl l GLOBAL ANY LEFT JOIN sjr r
        ON l.k = r.k
    """).collect()}
    assert rows == {1: "r1", 2: "r3", 3: None}


def test_strictness_join_then_plain_join(spark, join_tables):
    spark.createDataFrame([(1, "x1"), (2, "x2"), (3, "x3")],
                          "k int, extra string") \
        .createOrReplaceTempView("sjc")
    rows = {(r.k, r.ts): (r.rv, r.extra) for r in ch_sql(spark, """
        SELECT l.k, l.ts, r.rv, sjc.extra
        FROM sjl l ASOF JOIN sjr r ON l.k = r.k AND l.ts >= r.rts
        JOIN sjc ON l.k = sjc.k
        WHERE l.k < 3
    """).collect()}
    assert rows == {(1, 10): ("r1", "x1"), (1, 20): ("r2", "x1"),
                    (2, 15): ("r3", "x2")}


def test_chained_strictness_joins(spark, join_tables):
    spark.createDataFrame([(1, "c1"), (1, "c0"), (3, "c3")],
                          "k int, cv string") \
        .createOrReplaceTempView("sjd")
    rows = {r.k: (r.rv, r.cv) for r in ch_sql(spark, """
        SELECT l.k, r.rv, sjd.cv
        FROM sjl l ANY LEFT JOIN sjr r ON l.k = r.k
        ANY LEFT JOIN sjd ON l.k = sjd.k
    """).collect()}
    # second ANY join also dedups (lexicographic min -> c0)
    assert rows == {1: ("r1", "c0"), 2: ("r3", None), 3: (None, "c3")}


def test_explain_asof_join_shows_operator_route(spark, join_tables):
    from clickhouse_clickhouse_spark.ch_sql import ch_statement

    out = ch_statement(spark, """
        EXPLAIN SELECT l.k FROM sjl l ASOF JOIN sjr r
        ON l.k = r.k AND l.ts >= r.rts""").collect()[0].plan
    assert "Strictness join" in out and "Physical Plan" in out


def test_final_modifier_refuses_loudly(spark, join_tables):
    # FINAL must not be swallowed as a table alias (round-6 review):
    # the scanner bails and translate() refuses with the operator name
    with pytest.raises(ValueError, match="any_join|ANY JOIN"):
        ch_sql(spark, "SELECT l.k FROM sjl FINAL ANY LEFT JOIN sjr r "
                      "USING (k)")


def test_same_named_payload_columns(spark, join_tables):
    # both sides carry `lv`-like same-named payloads: the build side's
    # copy prefixes and r.<col> maps onto it (round-6 review:
    # AMBIGUOUS_REFERENCE before)
    spark.createDataFrame([(1, 8, "R")], "k int, rts int, lv string") \
        .createOrReplaceTempView("sjr2")
    rows = {(r.k, r.ts): (r.left_lv, r.right_lv)
            for r in ch_sql(spark, """
        SELECT l.k, l.ts, l.lv AS left_lv, r.lv AS right_lv
        FROM sjl l ASOF JOIN sjr2 r ON l.k = r.k AND l.ts >= r.rts
    """).collect()}
    assert rows == {(1, 10): ("a", "R"), (1, 20): ("b", "R")}


def test_on_keys_with_differing_names(spark, join_tables):
    # ON l.k = r.k2 renames the right key to the left name; SELECT/WHERE
    # references to the ORIGINAL right name must still resolve (round-6
    # advice: they previously rewrote to a nonexistent column)
    spark.createDataFrame([(1, "x1"), (2, "x2")],
                          "k2 int, xv string").createOrReplaceTempView("sjk2")
    rows = {(r.k, r.rk): r.xv for r in ch_sql(spark, """
        SELECT l.k, r.k2 AS rk, r.xv FROM sjl l
        ANY JOIN sjk2 r ON l.k = r.k2
        WHERE r.k2 < 2
    """).collect()}
    assert rows == {(1, 1): "x1"}
