"""M1 — join surface (SURVEY.md §2.3).

Every reference join kind/strictness: native Spark kinds where they exist,
the helpers in operators/joins.py for ANY / ASOF / PASTE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.joins import any_join, asof_join, paste_join
from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("join_inner_3way", oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def join_inner_3way(spark, sf):
    """TPC-H-Q3-style 3-way equi-join + agg + top-10. customer is
    broadcast (dimension ≪ fact); lineitem⋈orders shuffles on the order
    key — the layout both tables share, so at 100 TB a bucketed layout
    makes this shuffle-free."""
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


@register("join_left", oracle="""
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""")
def join_left(spark, sf):
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders")))


@register("join_right", oracle="""
SELECT n_name, count(c_custkey) AS n_customers
FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def join_right(spark, sf):
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (c.join(n, c.c_nationkey == n.n_nationkey, "right")
            .groupBy("n_name")
            .agg(F.count("c_custkey").alias("n_customers")))


@register("join_full", oracle="""
WITH cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
     sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
""")
def join_full(spark, sf):
    """FULL OUTER between two aggregated sides (some nations have only
    customers or only suppliers)."""
    c = (load_table(spark, sf, "customer").groupBy("c_nationkey")
         .agg(F.count("*").alias("n_cust")))
    s = (load_table(spark, sf, "supplier").groupBy("s_nationkey")
         .agg(F.count("*").alias("n_supp")))
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full")
    return j.select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"))


@register("join_semi", oracle="""
SELECT c_custkey, c_acctbal FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""")
def join_semi(spark, sf):
    """SEMI JOIN / IN-subquery (reference CreatingSetsStep + semi
    strictness): left_semi — build side never duplicates left rows."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_acctbal"))


@register("join_anti", oracle="""
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def join_anti(spark, sf):
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register("join_cross", oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""")
def join_cross(spark, sf):
    """CROSS JOIN (tiny×tiny here; Spark BroadcastNestedLoop)."""
    r = load_table(spark, sf, "region").select("r_name")
    n = load_table(spark, sf, "nation").select("n_name")
    return r.crossJoin(n)


@register("join_theta", oracle="""
SELECT s_suppkey, count(*) AS n_richer_customers
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
GROUP BY s_suppkey
""")
def join_theta(spark, sf):
    """Theta join — equi key + inequality in ON (reference mixed-condition
    HashJoin): Spark equi-joins on the nation key and filters the
    inequality post-probe, no cartesian explosion."""
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    return (s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
            .groupBy("s_suppkey")
            .agg(F.count("*").alias("n_richer_customers")))


@register("join_any", oracle="""
SELECT o_orderkey, l.l_linenumber, l.l_quantity
FROM orders
JOIN (
  SELECT l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity, l_partkey) AS rn
  FROM lineitem
) l ON l.l_orderkey = o_orderkey AND l.rn = 1
""")
def join_any(spark, sf):
    """ANY JOIN (strictness=Any): at most one lineitem per order. The
    fixture has duplicate (orderkey, linenumber) pairs, so the helper gets
    a full deterministic tiebreak (reference ANY is arrival-order-
    dependent; we require a total order — SURVEY.md §2.3)."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    j = any_join(o.select("o_orderkey"),
                 li.select("o_orderkey", "l_linenumber", "l_quantity", "l_partkey"),
                 on=["o_orderkey"],
                 order_by=["l_linenumber", "l_quantity", "l_partkey"])
    return j.select("o_orderkey", "l_linenumber", "l_quantity")


@register("join_asof", oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""")
def join_asof(spark, sf):
    """ASOF JOIN: each purchase matched to the user's most recent click at
    or before it (union-tag window algorithm — one shuffle, O(n log n);
    SURVEY.md §4.3 item 2). DuckDB's native ASOF JOIN is the oracle."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("user_id", F.col("ts").alias("c_ts"), "value")
    j = asof_join(purchases, clicks, on=["user_id"], left_ts="ts", right_ts="c_ts",
                  direction="backward", how="inner", right_cols=["value"])
    return j.select("event_id", "user_id", "ts",
                    F.col("asof_c_ts").alias("click_ts"),
                    F.col("value").alias("click_value"))


@register("join_paste", oracle="""
WITH s AS (SELECT s_suppkey, s_name,
                  row_number() OVER (ORDER BY s_suppkey) AS rn FROM supplier),
     n AS (SELECT n_name,
                  row_number() OVER (ORDER BY n_nationkey) AS rn FROM nation)
SELECT s_suppkey, s_name, n_name FROM s JOIN n USING (rn)
""")
def join_paste(spark, sf):
    """PASTE JOIN — positional zip under an explicit order (reference
    PasteJoinTransform; order required because Spark has no stable row id)."""
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    j = paste_join(s, n, left_order=["s_suppkey"], right_order=["n_nationkey"])
    return j.select("s_suppkey", "s_name", "n_name")


@register("join_dict_broadcast", oracle="""
SELECT n_name, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""")
def join_dict_broadcast(spark, sf):
    """dictGet analog (reference external dictionaries §2.8): a broadcast
    dimension join — the RAM-resident key→value lookup, Spark-style."""
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum("s_acctbal"), 2).alias("total_bal")))


@register("join_in_subquery", oracle="""
SELECT count(*) AS n FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
""")
def join_in_subquery(spark, sf):
    """IN (subquery) → left_semi (reference Set/CreatingSetsStep §2.2)."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_size") > 40)
    return (li.join(p, li.l_partkey == p.p_partkey, "left_semi")
            .agg(F.count("*").alias("n")))


@register("dict_get_map_literal", oracle="""
SELECT s_suppkey, n_name AS nation, s_nationkey IN (SELECT n_nationkey FROM nation) AS known
FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
""")
def dict_get_map_literal(spark, sf):
    """dictGet via compiled map literal (reference RAM dictionary §2.8):
    the lookup becomes a pure expression — zero joins in the plan."""
    from clickhouse_clickhouse_spark.operators.dictionary import Dictionary

    nation = load_table(spark, sf, "nation")
    d = Dictionary(nation, "n_nationkey", "n_name")
    sup = load_table(spark, sf, "supplier")
    key = F.col("s_nationkey").cast("int")
    return sup.select("s_suppkey",
                      d.get(key).alias("nation"),
                      d.has(key).alias("known"))


@register("join_asof_forward", oracle="""
SELECT c.event_id, c.user_id, c.ts, p.ts AS next_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""")
def join_asof_forward(spark, sf):
    """ASOF JOIN forward direction: each click matched to the user's next
    purchase at-or-after it (same union-tag algorithm, reversed order)."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("user_id", F.col("ts").alias("p_ts"))
    j = asof_join(clicks, purchases, on=["user_id"], left_ts="ts",
                  right_ts="p_ts", direction="forward", how="inner",
                  right_cols=[])
    return j.select("event_id", "user_id", "ts",
                    F.col("asof_p_ts").alias("next_purchase_ts"))


@register("join_asof_left_outer", oracle="""
SELECT s.event_id, s.user_id, c.ts AS prior_click_ts
FROM (SELECT * FROM events WHERE event_type = 'signup') s
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON s.user_id = c.user_id AND s.ts >= c.ts
""")
def join_asof_left_outer(spark, sf):
    """ASOF LEFT JOIN: signups keep a NULL match when the user has no
    prior click (outer variant of the union-tag window)."""
    ev = load_table(spark, sf, "events")
    signups = ev.filter(F.col("event_type") == "signup") \
                .select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("user_id", F.col("ts").alias("c_ts"))
    j = asof_join(signups, clicks, on=["user_id"], left_ts="ts",
                  right_ts="c_ts", direction="backward", how="left",
                  right_cols=[])
    return j.select("event_id", "user_id",
                    F.col("asof_c_ts").alias("prior_click_ts"))


@register("join_null_safe", oracle="""
WITH a AS (SELECT event_id, CASE WHEN value > 100 THEN event_type END AS k
           FROM events WHERE event_id < 200),
b AS (SELECT CASE WHEN value > 100 THEN event_type END AS k, count(*) AS n
      FROM events GROUP BY 1)
SELECT a.event_id, a.k, b.n
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""")
def join_null_safe(spark, sf):
    """NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping (§2.3 semantics edge)."""
    ev = load_table(spark, sf, "events")
    k = F.when(F.col("value") > 100, F.col("event_type"))
    a = ev.filter(F.col("event_id") < 200).select("event_id", k.alias("k"))
    b = ev.select(k.alias("k")).groupBy("k").agg(F.count("*").alias("n"))
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.event_id, a.k, b.n)


@register("dict_hierarchy", oracle="""
SELECT c_custkey,
       CAST(c_nationkey AS BIGINT) || ',' ||
       CAST(n_regionkey + 100 AS BIGINT) AS hierarchy,
       n_regionkey + 100 = 102 AS in_asia
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey <= 80
""")
def dict_hierarchy(spark, sf):
    """dictGetHierarchy/dictIsIn over a customer→nation→region parent
    chain (region ids offset by 100 into the shared id space): the
    ancestor walk compiles to nested map lookups — zero joins in the
    plan (the oracle spells the same chain as a join)."""
    from clickhouse_clickhouse_spark.operators.dictionary import (
        HierarchicalDictionary,
    )

    n = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"),
        (F.col("n_regionkey").cast("long") + 100).alias("p"))
    d = HierarchicalDictionary(n, "k", "p", max_depth=4)
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") <= 80)
    key = F.col("c_nationkey").cast("long")
    return c.select(
        "c_custkey",
        F.array_join(F.transform(d.get_hierarchy(key),
                                 lambda x: x.cast("string")), ",")
        .alias("hierarchy"),
        d.is_in(key, F.lit(102)).alias("in_asia"))


@register("ch_sql_asof_join", oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
       round(c.value, 6) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""")
def ch_sql_asof_join(spark, sf):
    """ASOF JOIN written in the reference DIALECT and executed through
    the ch_sql front end (round-5 advice item 2 — the refusal is gone
    for the common migration shape). Routes to operators.joins.asof_join
    (union-tag single-window, one shuffle); DuckDB native ASOF JOIN is
    the oracle. Upstream: src/Interpreters/HashJoin/ strictness=Asof."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    # subquery sides — paste-your-reference-SQL form (round-6: sides may
    # be (SELECT ...) subqueries, themselves full dialect)
    return ch_sql(spark, """
        SELECT p.event_id, p.user_id, p.ts, c.c_ts AS click_ts,
               round(c.value, 6) AS click_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type == 'purchase') p
        ASOF JOIN (SELECT user_id, ts AS c_ts, value FROM events
                   WHERE event_type == 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.c_ts""")


@register("ch_sql_asof_left_strict", oracle="""
SELECT c.event_id, c.user_id, p.ts AS next_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts < p.ts
""")
def ch_sql_asof_left_strict(spark, sf):
    """ASOF LEFT JOIN with a STRICT forward inequality (<) through the
    dialect: each click's strictly-later next purchase, unmatched clicks
    kept with NULL."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    ev = load_table(spark, sf, "events")
    ev.filter(F.col("event_type") == "click") \
      .select("event_id", "user_id", "ts") \
      .createOrReplaceTempView("asofs_l")
    ev.filter(F.col("event_type") == "purchase") \
      .select("user_id", F.col("ts").alias("p_ts")) \
      .createOrReplaceTempView("asofs_r")
    return ch_sql(spark, """
        SELECT l.event_id, l.user_id, r.p_ts AS next_ts
        FROM asofs_l l ASOF LEFT JOIN asofs_r r
          ON l.user_id = r.user_id AND l.ts < r.p_ts""")


@register("ch_sql_any_join", oracle="""
SELECT n_name, s.s_name
FROM nation LEFT JOIN (
  SELECT s_nationkey, min(s_name) AS s_name
  FROM supplier GROUP BY s_nationkey) s
ON n_nationkey = s.s_nationkey
""")
def ch_sql_any_join(spark, sf):
    """ANY LEFT JOIN through the dialect: at most one build-side row per
    key. The reference's pick is arrival-order-arbitrary; this engine
    makes it DETERMINISTIC (lexicographic minimum over the build row),
    which the oracle mirrors with min(). Routes to
    operators.joins.any_join (per-key row_number dedup, one shuffle)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf, "supplier") \
        .select("s_nationkey", "s_name").createOrReplaceTempView("any_r")
    return ch_sql(spark, """
        SELECT l.n_name, r.s_name
        FROM nation l ANY LEFT JOIN any_r r
          ON l.n_nationkey = r.s_nationkey""")
