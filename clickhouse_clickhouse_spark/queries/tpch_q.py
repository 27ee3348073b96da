"""TPC-H-shaped analytics over the star schema — the reference's
benchmark-workload shapes (SURVEY.md §5-6: SSB/TPC-H derived), adapted to
the fixture's column subset. Exercises multi-way join planning, semi
joins, correlated subqueries, pivot."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("tpch_q6_revenue_forecast", oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""")
def tpch_q6_revenue_forecast(spark, sf):
    """Q6: pure scan+filter+agg — the pushdown showcase (all four
    predicates reach the Parquet scan)."""
    li = load_table(spark, sf, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01") &
                      (F.col("l_shipdate") < "1997-01-01") &
                      F.col("l_discount").between(0.05, 0.07) &
                      (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue")))


@register("tpch_q5_local_supplier", oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""")
def tpch_q5_local_supplier(spark, sf):
    """Q5: 6-way join (fact-fact on orderkey, four broadcast dims) with
    the local-supplier constraint c_nationkey = s_nationkey."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") &
        (F.col("o_orderdate") < "1998-01-01"))
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) &
                  (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@register("tpch_q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def tpch_q10_returned_items(spark, sf):
    """Q10: returned-item revenue ranking (join + agg + top-n)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") &
        (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), "c_custkey").limit(20))


@register("tpch_q18_large_orders", oracle="""
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
""")
def tpch_q18_large_orders(spark, sf):
    """Q18: large-volume orders — HAVING-subquery semi join then re-agg."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
           .filter(F.col("sq") > 150).select("l_orderkey"))
    return (li.join(big.withColumnRenamed("l_orderkey", "__bk"),
                    li.l_orderkey == F.col("__bk"), "left_semi")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
            .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty")))


@register("tpch_q4_order_priority", oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def tpch_q4_order_priority(spark, sf):
    """Q4: EXISTS-correlated semi join on a non-equi extra condition."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") &
        (F.col("o_orderdate") < "1996-10-01"))
    li = load_table(spark, sf, "lineitem")
    return (o.join(li, (o.o_orderkey == li.l_orderkey) &
                   (li.l_shipdate > o.o_orderdate), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))


@register("correlated_scalar_subquery", oracle="""
SELECT c_custkey, round(c_acctbal, 4) AS bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
""")
def correlated_scalar_subquery(spark, sf):
    """Correlated scalar subquery — Catalyst decorrelates it into a join
    (SURVEY.md §4.1: Spark is stronger than the reference here). Run
    through the SQL API so the decorrelation rule actually fires."""
    load_table(spark, sf, "customer").createOrReplaceTempView("__cust_corr")
    return spark.sql("""
        SELECT c_custkey, round(c_acctbal, 4) AS bal
        FROM __cust_corr c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM __cust_corr c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """)


@register("pivot_status_by_flag", oracle="""
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
FROM lineitem GROUP BY l_returnflag
""")
def pivot_status_by_flag(spark, sf):
    """PIVOT (Spark-native; the reference reaches the same shape with
    sumIf columns — both forms produce identical plans)."""
    li = load_table(spark, sf, "lineitem")
    p = (li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"])
         .agg(F.sum("l_quantity")))
    return p.select("l_returnflag",
                    F.round("O", 2).alias("O"), F.round("F", 2).alias("F"))


@register("json_typed_extract", oracle="""
SELECT event_id,
       cast(json_extract(props, '$.k') AS INT) AS k_typed,
       json_extract_string(props, '$.k')       AS k_str,
       json_valid(props)                       AS is_valid
FROM events WHERE event_id <= 60
""")
def json_typed_extract(spark, sf):
    """Typed JSON extraction: from_json with an explicit schema (the
    reference's JSONExtract<T>), raw string extraction, validity check."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") <= 60)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.isNotNull().alias("is_valid"))


@register("agg_quantiles_multi", oracle="""
SELECT l_returnflag, 0.25 AS q, round(quantile_cont(l_quantity, 0.25), 6) AS v
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 0.5, round(quantile_cont(l_quantity, 0.5), 6)
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 0.75, round(quantile_cont(l_quantity, 0.75), 6)
FROM lineitem GROUP BY l_returnflag
""")
def agg_quantiles_multi(spark, sf):
    """quantiles(0.25,0.5,0.75) — array-returning percentile exploded to
    (flag, q, value) rows (arrays stay out of compared output)."""
    li = load_table(spark, sf, "lineitem")
    qs = [0.25, 0.5, 0.75]
    g = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity",
                     F.array(*[F.lit(q) for q in qs])).alias("vs"))
    return (g.select("l_returnflag", F.posexplode("vs").alias("i", "v"))
            .select("l_returnflag",
                    F.element_at(F.array(*[F.lit(q) for q in qs]),
                                 F.col("i") + 1).alias("q"),
                    F.round("v", 6).alias("v")))


@register("nested_collect_first", oracle="""
WITH r AS (
  SELECT o_orderkey, l_linenumber, l_quantity,
         count(*) OVER (PARTITION BY o_orderkey) AS n_items,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY l_linenumber, l_quantity) AS rn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderkey, cast(n_items AS INT) AS n_items,
       l_linenumber AS first_ln, l_quantity AS first_qty
FROM r WHERE rn = 1
""")
def nested_collect_first(spark, sf):
    """Nested(...) analog: per-order array<struct> assembled with
    collect_list, then fields projected from the sorted head element
    (reference Nested columns = parallel arrays; §1.2)."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    g = (li.join(o, li.l_orderkey == o.o_orderkey)
         .groupBy("o_orderkey")
         .agg(F.array_sort(F.collect_list(
             F.struct(F.col("l_linenumber").alias("ln"),
                      F.col("l_quantity").alias("qty")))).alias("items")))
    return g.select(
        "o_orderkey",
        F.size("items").alias("n_items"),
        F.col("items").getItem(0).getField("ln").alias("first_ln"),
        F.col("items").getItem(0).getField("qty").alias("first_qty"))


@register("tpch_q1_dialect", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1_dialect(spark, sf):
    """TPC-H Q1 written in the reference dialect (PREWHERE, count(),
    multiply) through the ch_sql front end — proof the translator carries
    a real reporting query, with pushdown intact."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return ch_sql(spark, """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(multiply(l_extendedprice, minus(1, l_discount))), 2)
                 AS sum_disc_price,
               count() AS count_order
        FROM lineitem
        PREWHERE l_shipdate <= toDateTime('1998-09-02')
        GROUP BY l_returnflag, l_linestatus""")


@register("tpch_q3_dialect", oracle="""
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
""")
def tpch_q3_dialect(spark, sf):
    """TPC-H Q3 (three-way join, top-10) through the dialect front end —
    joins pass through the rewriter untouched, CH function names and the
    LIMIT land in the same TakeOrderedAndProject plan as the DataFrame
    form."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return ch_sql(spark, """
        SELECT l_orderkey,
               round(sum(multiply(l_extendedprice, minus(1, l_discount))), 2)
                 AS revenue,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < toDateTime('1997-03-15')
          AND l_shipdate  > toDateTime('1997-03-15')
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")


@register("tpch_q12_dialect", oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_late,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_late
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY l_linestatus
""")
def tpch_q12_dialect(spark, sf):
    """TPC-H Q12 shape in the dialect: countIf combinators + addDays date
    arithmetic, translated to COUNT_IF / INTERVAL by the front end."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    for t in ("orders", "lineitem"):
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return ch_sql(spark, """
        SELECT l_linestatus,
               countIf(o_orderpriority IN ('1-URGENT', '2-HIGH')
                       AND l_shipdate > addDays(o_orderdate, 90))
                 AS high_late,
               countIf(o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       AND l_shipdate > addDays(o_orderdate, 90))
                 AS low_late
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY l_linestatus""")


@register("tpch_q14_dialect", oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""")
def tpch_q14_dialect(spark, sf):
    """TPC-H Q14 in the dialect: sumIf ratio (the CH idiom for the promo
    share) over a broadcast dimension join."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    for t in ("lineitem", "part"):
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return ch_sql(spark, """
        SELECT round(100.0 * coalesce(sumIf(
                 multiply(l_extendedprice, minus(1, l_discount)),
                 p_type = 'PROMO'), 0)
               / sum(multiply(l_extendedprice, minus(1, l_discount))), 4)
                 AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        PREWHERE l_shipdate >= toDateTime('1996-09-01')
          AND l_shipdate < toDateTime('1996-10-01')""")


@register("tpch_q5_dialect", oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""")
def tpch_q5_dialect(spark, sf):
    """TPC-H Q5 (six-way join) through the dialect front end — the
    full local-supplier join graph survives translation with the same
    broadcast-dim plan as the DataFrame form."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.tables import TABLES

    for t in TABLES[:7]:
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return ch_sql(spark, """
        SELECT n_name,
               round(sum(multiply(l_extendedprice, minus(1, l_discount))), 2)
                 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= toDateTime('1996-01-01')
          AND o_orderdate < toDateTime('1998-01-01')
        GROUP BY n_name""")
