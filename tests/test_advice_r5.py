"""Regression tests for the round-5 advisor findings (ADVICE.md):
3-arg locate/position, insert-dedup window lifecycle, rightUTF8 clamp,
MV source substitution inside string literals, toWeek mode validation.
"""

import pytest

from clickhouse_clickhouse_spark.ch_sql import (
    ch_statement,
    translate,
)


def test_locate_three_arg_start_pos(spark):
    # ClickHouse locate(needle, haystack, start_pos) — MySQL arg order;
    # previously start_pos was silently dropped (wrong answer: 2)
    row = spark.sql(translate(
        "SELECT locate('b', 'abcabc', 4) AS p, "
        "position('abcabc', 'b', 4) AS p2, "
        "position('abcabc', 'b') AS p3")).collect()[0]
    assert row.p == 5 and row.p2 == 5 and row.p3 == 2


def test_template_extra_args_raise():
    # _apply_template must fail loudly instead of dropping arguments
    with pytest.raises(ValueError, match="supplied"):
        translate("SELECT lengthUTF8('a', 'b')")


def test_right_utf8_clamps_when_n_exceeds_length(spark):
    from clickhouse_clickhouse_spark import ch_functions as chf
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit("abc").alias("s"))
    got = df.select(chf.rightUTF8("s", 5).alias("r"),
                    chf.rightUTF8("s", 2).alias("r2")).collect()[0]
    assert got.r == "abc" and got.r2 == "bc"
    # and the SQL template agrees
    row = spark.sql(translate(
        "SELECT rightUTF8('abc', 5) AS r, rightUTF8('abc', 2) AS r2"
    )).collect()[0]
    assert row.r == "abc" and row.r2 == "bc"


def test_toweek_unsupported_mode_raises():
    from clickhouse_clickhouse_spark import ch_functions as chf

    with pytest.raises(ValueError, match="mode"):
        chf.toWeek("d", mode=7)
    with pytest.raises(ValueError, match="mode"):
        chf.toYearWeek("d", mode=5)


def test_toweek_modes_match_mysql_vectors(spark):
    # MySQL WEEK()/YEARWEEK() documented vectors (the reference's toWeek
    # follows MySQL mode semantics)
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark import ch_functions as chf

    def week(day, mode):
        return spark.range(1).select(
            chf.toWeek(F.lit(day).cast("date"), mode).alias("w")
        ).collect()[0].w

    def yearweek(day, mode=0):
        return spark.range(1).select(
            chf.toYearWeek(F.lit(day).cast("date"), mode).alias("w")
        ).collect()[0].w

    assert week("2008-02-20", 0) == 7
    assert week("2008-02-20", 1) == 8
    assert week("2008-02-20", 2) == 7
    assert week("2008-02-20", 3) == 8
    assert week("2000-01-01", 0) == 0
    assert week("2000-01-01", 2) == 52
    assert week("2008-12-31", 1) == 53
    assert yearweek("2000-01-01") == 199952
    assert yearweek("2008-02-20") == 200807
    assert yearweek("2000-01-01", 1) == 199952


def test_insert_dedup_window_cleared_on_truncate(spark):
    # With insert_deduplicate=1, re-inserting identical data AFTER a
    # TRUNCATE must not be skipped (the parts holding the block ids are
    # gone — reference replicated-table semantics)
    spark.conf.set(
        "spark.clickhouse_clickhouse_spark.insertDeduplicate", "true")
    try:
        ch_statement(spark, "DROP TABLE IF EXISTS adv_dedup_t")
        spark.createDataFrame([], "x int").createOrReplaceTempView(
            "adv_dedup_t")
        ch_statement(spark, "INSERT INTO adv_dedup_t VALUES (1), (2)")
        # a true retry IS skipped
        ch_statement(spark, "INSERT INTO adv_dedup_t VALUES (1), (2)")
        assert spark.table("adv_dedup_t").count() == 2
        ch_statement(spark, "TRUNCATE TABLE adv_dedup_t")
        ch_statement(spark, "INSERT INTO adv_dedup_t VALUES (1), (2)")
        assert spark.table("adv_dedup_t").count() == 2, \
            "block-id window must be cleared by TRUNCATE"
    finally:
        spark.conf.set(
            "spark.clickhouse_clickhouse_spark.insertDeduplicate", "false")
        ch_statement(spark, "DROP TABLE IF EXISTS adv_dedup_t")


def test_mv_fire_ignores_source_name_in_string_literal(spark):
    # the MV transform contains the source table's name INSIDE a string
    # literal — the block substitution must leave it untouched
    ch_statement(spark, "DROP TABLE IF EXISTS adv_mv_src")
    ch_statement(spark, "DROP TABLE IF EXISTS adv_mv_tgt")
    spark.createDataFrame([], "x int").createOrReplaceTempView("adv_mv_src")
    spark.createDataFrame([], "tag string, x int") \
        .createOrReplaceTempView("adv_mv_tgt")
    ch_statement(spark, """
        CREATE MATERIALIZED VIEW adv_mv TO adv_mv_tgt AS
        SELECT 'from adv_mv_src' AS tag, x FROM adv_mv_src""")
    ch_statement(spark, "INSERT INTO adv_mv_src VALUES (7)")
    rows = spark.table("adv_mv_tgt").collect()
    assert len(rows) == 1
    assert rows[0].tag == "from adv_mv_src", \
        "literal containing the source name must not be rewritten"
    assert rows[0].x == 7
    ch_statement(spark, "DROP TABLE adv_mv")
    ch_statement(spark, "DROP TABLE adv_mv_src")
    ch_statement(spark, "DROP TABLE adv_mv_tgt")
