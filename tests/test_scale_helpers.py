"""Scale-posture helpers: salted joins, bucketed (shuffle-free) joins,
table-engine analogs."""

import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.skew import salted_join
from clickhouse_clickhouse_spark.sources.engines import (
    join_engine, memory_table, merge_tables, null_write, set_engine,
)
from clickhouse_clickhouse_spark.tables import load_table


def test_salted_join_same_result_as_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o, "l_orderkey").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0]
    salted = salted_join(li, o, ["l_orderkey"], salt=4).agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing = the co-located-join layout (SURVEY.md §2.1 MergeTree
    ORDER BY locality analog): both sides bucketed on the join key ->
    SortMergeJoin with NO Exchange."""
    # spark.sql.warehouse.dir is static — managed tables land in the
    # default warehouse and are dropped (files removed) in the finally.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
         .sortBy("l_orderkey").saveAsTable("li_bucketed"))
        (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
         .sortBy("o_orderkey").saveAsTable("o_bucketed"))
        j = (spark.table("li_bucketed")
             .join(spark.table("o_bucketed"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_memory_and_merge_engines(spark, sf_dir):
    n = memory_table(load_table(spark, sf_dir, "nation"), "mem_nation")
    assert spark.sql("SELECT count(*) AS n FROM mem_nation").collect()[0].n == n.count()
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, 9.5)], "id int, b double")
    m = merge_tables(spark, [a, b])
    assert m.count() == 2 and set(m.columns) == {"id", "a", "b"}


def test_set_and_join_engines(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    keys = set_engine(nation, "n_nationkey")
    sup = load_table(spark, sf_dir, "supplier")
    assert sup.filter(F.col("s_nationkey").isin(keys)).count() == sup.count()
    with pytest.raises(ValueError):
        set_engine(load_table(spark, sf_dir, "lineitem"), "l_orderkey", max_size=10)
    build = join_engine(nation.select("n_nationkey", "n_name"))
    j = sup.join(build, sup.s_nationkey == build.n_nationkey)
    assert "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan().toString()


def test_null_engine(spark, sf_dir):
    null_write(load_table(spark, sf_dir, "region"))  # must not raise
