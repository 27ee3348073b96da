"""The remaining TPC-H queries THROUGH THE DIALECT FRONT END (round-5:
Q1/Q3/Q5/Q6/Q12/Q14 landed earlier — this file adds the other sixteen).

Each query is the reference-dialect text a ClickHouse user would write
(count()/countIf/sumIf/uniqExact, toYear/toDateTime/addDays, multiply/
minus, CTEs, correlated scalar subqueries, EXISTS/NOT EXISTS, IN+HAVING
subqueries) run through ``ch_sql.translate`` → Catalyst, oracled against
the SAME DuckDB SQL as its DataFrame twin in ``tpch_full_q.py`` /
``tpch_q.py`` (fixture adaptations documented there: the part-supplier
relation derives from lineitem, late = shipped >N days after order,
Q22 country codes are c_nationkey values).

Correlated subqueries (Q2/Q17/Q21/Q22) pass through the translator
untouched — Catalyst decorrelates them into joins (SURVEY.md §4.1:
Spark is strictly stronger than the reference here, which evaluates
scalar subqueries once and refuses correlated forms).
"""

from __future__ import annotations

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


def _views(spark, sf, *tables):
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    for t in tables:
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return lambda q: ch_sql(spark, q)


@register("tpch_q2_dialect", oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_type
FROM part
JOIN ps       ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT max(s2.s_acctbal)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
""")
def tpch_q2_dialect(spark, sf):
    """Q2 in the dialect: CTE + correlated max scalar subquery, passed
    through to Catalyst's decorrelation."""
    run = _views(spark, sf, "part", "supplier", "nation", "region",
                 "lineitem")
    return run("""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_type
        FROM part
        JOIN ps       ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size <= 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
          AND s_acctbal = (
            SELECT max(s2.s_acctbal)
            FROM ps ps2
            JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
            JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""")


@register("tpch_q4_dialect", oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def tpch_q4_dialect(spark, sf):
    """Q4 in the dialect: correlated EXISTS with a non-equi extra
    condition → left-semi join."""
    run = _views(spark, sf, "orders", "lineitem")
    return run("""
        SELECT o_orderpriority, count() AS n_orders
        FROM orders
        WHERE o_orderdate >= toDateTime('1996-07-01')
          AND o_orderdate < toDateTime('1996-10-01')
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority""")


@register("tpch_q7_dialect", oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem  ON s_suppkey = l_suppkey
  JOIN orders    ON o_orderkey = l_orderkey
  JOIN customer  ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
         (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY supp_nation, cust_nation, l_year
""")
def tpch_q7_dialect(spark, sf):
    """Q7 in the dialect: nation dim self-aliased twice, toYear, the
    bilateral OR pair filter."""
    run = _views(spark, sf, "supplier", "lineitem", "orders", "customer",
                 "nation")
    return run("""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 toYear(l_shipdate) AS l_year,
                 multiply(l_extendedprice, minus(1, l_discount)) AS volume
          FROM supplier
          JOIN lineitem  ON s_suppkey = l_suppkey
          JOIN orders    ON o_orderkey = l_orderkey
          JOIN customer  ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
                 (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate BETWEEN toDateTime('1996-01-01')
                               AND toDateTime('1997-12-31'))
        GROUP BY supp_nation, cust_nation, l_year""")


@register("tpch_q8_dialect", oracle="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem  ON p_partkey = l_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY o_year
""")
def tpch_q8_dialect(spark, sf):
    """Q8 in the dialect: 8-table join with the nation dim in two roles,
    sumIf market-share ratio."""
    run = _views(spark, sf, "part", "lineitem", "orders", "customer",
                 "nation", "region", "supplier")
    return run("""
        SELECT o_year,
               round(coalesce(sumIf(volume, nation = 'NATION_2'), 0)
                     / sum(volume), 6) AS mkt_share
        FROM (
          SELECT toYear(o_orderdate) AS o_year,
                 multiply(l_extendedprice, minus(1, l_discount)) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem  ON p_partkey = l_partkey
          JOIN orders    ON l_orderkey = o_orderkey
          JOIN customer  ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region    ON n1.n_regionkey = r_regionkey
          JOIN supplier  ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO'
            AND o_orderdate BETWEEN toDateTime('1996-01-01')
                                AND toDateTime('1997-12-31'))
        GROUP BY o_year""")


@register("tpch_q9_dialect", oracle="""
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1
           AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
""")
def tpch_q9_dialect(spark, sf):
    """Q9 in the dialect: profit by supplier nation/year with nested
    multiply/minus arithmetic and a LIKE pattern."""
    run = _views(spark, sf, "lineitem", "part", "supplier", "orders",
                 "nation")
    return run("""
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (
          SELECT n_name AS nation, toYear(o_orderdate) AS o_year,
                 minus(multiply(l_extendedprice, minus(1, l_discount)),
                       multiply(multiply(p_retailprice, l_quantity), 0.1))
                   AS amount
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%')
        GROUP BY nation, o_year""")


@register("tpch_q10_dialect", oracle="""
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
def tpch_q10_dialect(spark, sf):
    """Q10 in the dialect: returned-item revenue top-20 — PREWHERE on the
    cheap flag, TakeOrderedAndProject for the LIMIT."""
    run = _views(spark, sf, "customer", "orders", "lineitem", "nation")
    return run("""
        SELECT c_custkey, c_name,
               round(sum(multiply(l_extendedprice, minus(1, l_discount))),
                     2) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= toDateTime('1996-10-01')
          AND o_orderdate < toDateTime('1997-01-01')
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")


@register("tpch_q11_dialect", oracle="""
WITH rv AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey)
SELECT l_partkey, round_even(v, 2) AS part_value
FROM rv WHERE v > (SELECT sum(v) * 0.0008 FROM rv)
""")
def tpch_q11_dialect(spark, sf):
    """Q11 in the dialect: CTE reused by both the probe and the scalar
    grand-total threshold subquery."""
    run = _views(spark, sf, "lineitem", "supplier", "nation", "region")
    return run("""
        WITH rv AS (
          SELECT l_partkey,
                 sum(multiply(l_extendedprice, minus(1, l_discount))) AS v
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
          GROUP BY l_partkey)
        SELECT l_partkey, round(v, 2) AS part_value
        FROM rv WHERE v > (SELECT sum(v) * 0.0008 FROM rv)""")


@register("tpch_q13_dialect", oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS INT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
GROUP BY c_count
""")
def tpch_q13_dialect(spark, sf):
    """Q13 in the dialect: double aggregation over a filtered LEFT
    JOIN (extra ON condition) — toInt32 keeps the histogram key INT."""
    run = _views(spark, sf, "customer", "orders")
    return run("""
        SELECT c_count, count() AS custdist
        FROM (
          SELECT c_custkey, toInt32(count(o_orderkey)) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority != '5-LOW'
          GROUP BY c_custkey)
        GROUP BY c_count""")


@register("tpch_q15_dialect", oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def tpch_q15_dialect(spark, sf):
    """Q15 in the dialect: the CREATE VIEW pattern as a CTE + scalar max
    subquery (shared subplan reused by Catalyst)."""
    run = _views(spark, sf, "lineitem", "supplier")
    return run("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(multiply(l_extendedprice, minus(1, l_discount)))
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= toDateTime('1996-01-01')
            AND l_shipdate < toDateTime('1996-04-01')
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               round(total_revenue, 2) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""")


@register("tpch_q16_dialect", oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
""")
def tpch_q16_dialect(spark, sf):
    """Q16 in the dialect: uniqExact distinct-supplier counts per part
    classification."""
    run = _views(spark, sf, "lineitem", "part")
    return run("""
        SELECT p_brand, p_type, p_size,
               uniqExact(l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand != 'Brand#5' AND p_type != 'PROMO'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY p_brand, p_type, p_size""")


@register("tpch_q17_dialect", oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""")
def tpch_q17_dialect(spark, sf):
    """Q17 in the dialect: the correlated per-part average subquery, left
    for Catalyst to decorrelate into an aggregate+join."""
    run = _views(spark, sf, "lineitem", "part")
    return run("""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (SELECT multiply(0.5, avg(l2.l_quantity))
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")


@register("tpch_q18_dialect", oracle="""
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
def tpch_q18_dialect(spark, sf):
    """Q18 in the dialect: IN + HAVING subquery semi join, then
    re-aggregation of the surviving orders."""
    run = _views(spark, sf, "customer", "orders", "lineitem")
    return run("""
        SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150)
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice""")


@register("tpch_q19_dialect", oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
""")
def tpch_q19_dialect(spark, sf):
    """Q19 in the dialect: the disjunctive brand/size/quantity predicate
    straddling both join sides."""
    run = _views(spark, sf, "lineitem", "part")
    return run("""
        SELECT round(sum(multiply(l_extendedprice, minus(1, l_discount))),
                     2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30
               AND p_size BETWEEN 1 AND 15)""")


@register("tpch_q20_dialect", oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
""")
def tpch_q20_dialect(spark, sf):
    """Q20 in the dialect: IN subquery with aggregation threshold →
    left-semi join on the aggregated side."""
    run = _views(spark, sf, "supplier", "lineitem", "part")
    return run("""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= toDateTime('1996-01-01')
            AND l_shipdate < toDateTime('1997-01-01')
          GROUP BY l_suppkey HAVING sum(l_quantity) > 100)""")


@register("tpch_q21_dialect", oracle="""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders      ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 10
""")
def tpch_q21_dialect(spark, sf):
    """Q21 in the dialect: the EXISTS + NOT EXISTS pair with a
    correlated non-equi predicate (late = shipped >60 days after
    order) — the hardest decorrelation in the suite."""
    run = _views(spark, sf, "supplier", "lineitem", "orders")
    return run("""
        SELECT s_name, count() AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders      ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > addDays(o_orderdate, 60)
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey != l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey != l1.l_suppkey
                            AND l3.l_shipdate > addDays(o_orderdate, 60))
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 10""")


@register("tpch_q22_dialect", oracle="""
SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""")
def tpch_q22_dialect(spark, sf):
    """Q22 in the dialect: scalar average threshold + NOT EXISTS
    anti join (idle customers)."""
    run = _views(spark, sf, "customer", "orders")
    return run("""
        SELECT c_nationkey AS cntrycode, count() AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0
                             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey""")
