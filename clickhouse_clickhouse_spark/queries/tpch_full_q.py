"""The remaining TPC-H query shapes (Q2,Q3,Q7,Q8,Q9,Q11-Q17,Q19-Q22),
adapted to the fixture's column subset (FIXTURES.md).

The fixture has no ``partsupp`` table and no comment/phone/shipmode/
commitdate/receiptdate columns, so:

- part-supplier relations derive from ``SELECT DISTINCT l_partkey,
  l_suppkey FROM lineitem`` (the Q2/Q11/Q16/Q20 rewrites);
- "late" lineitems are ``l_shipdate > o_orderdate + INTERVAL`` (Q12/Q21);
- Q22's phone-prefix country codes become ``c_nationkey`` values.

Every query keeps the reference shape that matters — the join topology,
subquery style (scalar / correlated / EXISTS+NOT EXISTS), and aggregation
pattern of the upstream benchmark queries the reference ships under
[U] tests/performance and docs/benchmark (SURVEY.md §5-6). Scale notes
per query: dims broadcast, fact-fact joins shuffle on the join key, and
scalar subqueries become broadcast crossJoins (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


# ---------------------------------------------------------------------------
# Q2 — best supplier per part (min-cost supplier, acctbal-adapted)
# ---------------------------------------------------------------------------

@register("tpch_q2_best_supplier", oracle="""
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
def tpch_q2_best_supplier(spark, sf):
    """Q2 shape: correlated max-per-group subquery over the part-supplier
    relation. DF form: one window ``max`` over the regional candidates,
    filter to the rows that attain it — a single shuffle on l_partkey
    instead of a correlated re-scan per part."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    cand = (ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    w = Window.partitionBy("l_partkey")
    best = cand.withColumn("__mx", F.max("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("__mx"))
    return (best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
            .select(F.round("s_acctbal", 2).alias("s_acctbal"),
                    "s_name", "n_name", "p_partkey", "p_type"))


# ---------------------------------------------------------------------------
# Q3 — shipping priority
# ---------------------------------------------------------------------------

@register("tpch_q3_shipping_priority", oracle="""
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
def tpch_q3_shipping_priority(spark, sf):
    """Q3: unshipped-order revenue top-10. Segment filter broadcasts into
    the orders⋈lineitem shuffle join; top-10 is TakeOrderedAndProject
    (heap, no full sort)."""
    c = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < "1997-03-15")
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > "1997-03-15")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate")
            .orderBy(F.col("revenue").desc(), "l_orderkey").limit(10))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@register("tpch_q7_volume_shipping", oracle="""
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
def tpch_q7_volume_shipping(spark, sf):
    """Q7: bilateral trade volume by year — the same nation dim joined
    twice under different roles (supplier side / customer side)."""
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00"))
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | \
           ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
            .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2).alias("revenue")))


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@register("tpch_q8_market_share", oracle="""
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
def tpch_q8_market_share(spark, sf):
    """Q8: a nation's share of regional promo-part revenue per year —
    conditional-sum ratio over an 8-table join (nation joined twice)."""
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00"))
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk"))
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
            .join(F.broadcast(r), F.col("n1_rk") == r.r_regionkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(F.lit(0.0)))
                / F.sum(vol), 6).alias("mkt_share")))


# ---------------------------------------------------------------------------
# Q9 — product-type profit (retailprice stands in for supplycost)
# ---------------------------------------------------------------------------

@register("tpch_q9_product_profit", oracle="""
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
def tpch_q9_product_profit(spark, sf):
    """Q9: profit by supplier nation and year for a part-name pattern.
    (No partsupp fixture → cost = 10% of retailprice per unit.)"""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf, "supplier")
    o = load_table(spark, sf, "orders")
    n = load_table(spark, sf, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * 0.1)
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(amount), 2).alias("sum_profit")))


# ---------------------------------------------------------------------------
# Q11 — important parts (value concentration with a scalar-subquery HAVING)
# ---------------------------------------------------------------------------

@register("tpch_q11_important_parts", oracle="""
WITH rv AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey)
SELECT l_partkey, round(v, 2) AS part_value
FROM rv WHERE v > (SELECT sum(v) * 0.0008 FROM rv)
""")
def tpch_q11_important_parts(spark, sf):
    """Q11 shape: per-part value filtered against a fraction of the grand
    total (scalar subquery in HAVING). DF form: the grand total is a
    1-row aggregate crossJoin-broadcast onto the per-part aggregate —
    no driver-side collect, so the plan is identical at 100 TB."""
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    v = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    rv = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
          .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .groupBy("l_partkey").agg(v))
    total = rv.agg((F.sum("v") * 0.0008).alias("__thr"))
    return (rv.crossJoin(F.broadcast(total))
            .filter(F.col("v") > F.col("__thr"))
            .select("l_partkey", F.round("v", 2).alias("part_value")))


# ---------------------------------------------------------------------------
# Q12 — late lines by priority class (shipmode → linestatus adaptation)
# ---------------------------------------------------------------------------

@register("tpch_q12_late_lines", oracle="""
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
def tpch_q12_late_lines(spark, sf):
    """Q12 shape: conditional counts of late shipments split by order
    priority class. (No commitdate/receiptdate → late means shipped more
    than 90 days after the order date.)"""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high & late, 1).otherwise(0)).alias("high_late"),
                 F.sum(F.when(~high & late, 1).otherwise(0)).alias("low_late")))


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

@register("tpch_q13_customer_distribution", oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS INT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
GROUP BY c_count
""")
def tpch_q13_customer_distribution(spark, sf):
    """Q13: double aggregation — orders per customer (left outer join so
    zero-order customers survive), then the histogram of those counts."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "5-LOW")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").cast("int").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion effect
# ---------------------------------------------------------------------------

@register("tpch_q14_promo_effect", oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""")
def tpch_q14_promo_effect(spark, sf):
    """Q14: promo revenue share for one month — conditional-sum ratio,
    part dim broadcast."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") &
        (F.col("l_shipdate") < "1996-10-01"))
    p = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                              .otherwise(F.lit(0.0))) / F.sum(rev),
                4).alias("promo_revenue")))


# ---------------------------------------------------------------------------
# Q15 — top supplier (revenue view + scalar max)
# ---------------------------------------------------------------------------

@register("tpch_q15_top_supplier", oracle="""
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
def tpch_q15_top_supplier(spark, sf):
    """Q15: the CREATE VIEW + scalar-max pattern. The revenue aggregate
    is computed once and reused for both the max and the final probe
    (Spark reuses the shuffle output of the common subplan)."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1996-04-01"))
    s = load_table(spark, sf, "supplier")
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum(F.col("l_extendedprice") *
                          (1 - F.col("l_discount"))).alias("total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (revenue.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("__mx"))
            .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.round("total_revenue", 2).alias("total_revenue")))


# ---------------------------------------------------------------------------
# Q16 — supplier-part relationship counts
# ---------------------------------------------------------------------------

@register("tpch_q16_supplier_parts", oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
""")
def tpch_q16_supplier_parts(spark, sf):
    """Q16 shape: distinct-supplier counts per part classification (the
    lineitem-derived part-supplier relation stands in for partsupp)."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO") &
        F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg)
# ---------------------------------------------------------------------------

@register("tpch_q17_small_quantity", oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""")
def tpch_q17_small_quantity(spark, sf):
    """Q17: rows below half their part's average quantity — the
    correlated average becomes a per-part aggregate joined back
    (broadcast: the part-level aggregate is tiny relative to the fact)."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = (li.groupBy(F.col("l_partkey").alias("__pk"))
                .agg((0.5 * F.avg("l_quantity")).alias("__half_avg")))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(per_part), li.l_partkey == F.col("__pk"))
            .filter(F.col("l_quantity") < F.col("__half_avg"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")))


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive range predicates)
# ---------------------------------------------------------------------------

@register("tpch_q19_discounted_revenue", oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
""")
def tpch_q19_discounted_revenue(spark, sf):
    """Q19: OR of three brand/size/quantity conjunctions — the predicate
    straddles both join sides, so it runs as a post-join filter (same as
    the reference's filter-after-join handling of mixed ON conditions)."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (((br == "Brand#12") & q.between(1, 11) & sz.between(1, 5)) |
            ((br == "Brand#23") & q.between(10, 20) & sz.between(1, 10)) |
            ((br == "Brand#3") & q.between(20, 30) & sz.between(1, 15)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2).alias("revenue")))


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess promo shipments
# ---------------------------------------------------------------------------

@register("tpch_q20_promo_suppliers", oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
""")
def tpch_q20_promo_suppliers(spark, sf):
    """Q20 shape: IN-subquery with a HAVING threshold → aggregate then
    left-semi join (the aggregate side is small, so it broadcasts)."""
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1997-01-01"))
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    heavy = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
             .groupBy("l_suppkey").agg(F.sum("l_quantity").alias("__sq"))
             .filter(F.col("__sq") > 100).select("l_suppkey"))
    return (s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"),
                   "left_semi")
            .select("s_suppkey", "s_name"))


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

@register("tpch_q21_waiting_suppliers", oracle="""
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
def tpch_q21_waiting_suppliers(spark, sf):
    """Q21: the sole-late-supplier-in-a-multi-supplier-order query. The
    EXISTS/NOT EXISTS pair collapses into ONE per-order aggregate
    (distinct suppliers, distinct late suppliers) joined back to the
    late rows — one shuffle on l_orderkey instead of two correlated
    probes of the fact table. (Late = shipped >60 days after order.)"""
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (li.join(o, li.l_orderkey == o.o_orderkey)
          .withColumn("__late", F.col("l_shipdate") >
                      F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    per_order = (lo.groupBy(F.col("l_orderkey").alias("__ok"))
                 .agg(F.countDistinct("l_suppkey").alias("__nsupp"),
                      F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey")))
                      .alias("__nlate")))
    return (lo.filter(F.col("__late"))
            .join(per_order, lo.l_orderkey == F.col("__ok"))
            .filter((F.col("__nsupp") > 1) & (F.col("__nlate") == 1))
            .join(F.broadcast(s), lo.l_suppkey == s.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name").limit(10))


# ---------------------------------------------------------------------------
# Q22 — idle customers with above-average balances
# ---------------------------------------------------------------------------

@register("tpch_q22_idle_customers", oracle="""
SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""")
def tpch_q22_idle_customers(spark, sf):
    """Q22 shape: scalar-average threshold + NOT EXISTS anti join.
    (Phone-prefix country codes → c_nationkey values.)"""
    codes = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf, "customer").filter(
        F.col("c_nationkey").isin(codes))
    o = load_table(spark, sf, "orders")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("__avg")))
    return (c.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("__avg"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))
