"""Set operations (SURVEY.md §2.7 — reference UnionStep /
IntersectOrExceptStep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


def _custkeys(spark, sf, year):
    o = load_table(spark, sf, "orders")
    return (o.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("custkey")))


@register("union_all", oracle="""
SELECT n_name AS name FROM nation
UNION ALL
SELECT r_name FROM region
""")
def union_all(spark, sf):
    n = load_table(spark, sf, "nation").select(F.col("n_name").alias("name"))
    r = load_table(spark, sf, "region").select(F.col("r_name").alias("name"))
    return n.unionByName(r)


@register("union_distinct", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
UNION
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def union_distinct(spark, sf):
    return _custkeys(spark, sf, 1995).union(_custkeys(spark, sf, 1996)).distinct()


@register("intersect_distinct", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def intersect_distinct(spark, sf):
    return _custkeys(spark, sf, 1995).intersect(_custkeys(spark, sf, 1996))


@register("except_distinct", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def except_distinct(spark, sf):
    return _custkeys(spark, sf, 1995).subtract(_custkeys(spark, sf, 1996))


@register("intersect_all", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT ALL
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def intersect_all(spark, sf):
    """INTERSECT ALL — bag semantics (multiplicity = min of the two)."""
    return _custkeys(spark, sf, 1995).intersectAll(_custkeys(spark, sf, 1996))


@register("except_all", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT ALL
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def except_all(spark, sf):
    """EXCEPT ALL — bag difference."""
    return _custkeys(spark, sf, 1995).exceptAll(_custkeys(spark, sf, 1996))
