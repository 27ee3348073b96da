"""M3 — window functions, sorts, fills (SURVEY.md §2.5, §2.6)."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.fill import with_fill
from clickhouse_clickhouse_spark.operators.windows import limit_with_ties, qualify
from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("window_ranks", oracle="""
SELECT o_custkey, o_orderkey,
       cast(row_number() OVER w AS INT) AS rn,
       cast(rank() OVER w AS INT) AS rk,
       cast(dense_rank() OVER w AS INT) AS drk,
       cast(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS prk,
       round(cume_dist()    OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""")
def window_ranks(spark, sf):
    """Ranking family over a deterministic total order per partition."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey"))
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"))


@register("window_lag_lead", oracle="""
SELECT user_id, event_id,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       lag(value, 2, -1.0) OVER w AS prev2_or_default
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_lag_lead(spark, sf):
    """lag/lead incl. offset+default (reference lagInFrame/leadInFrame)."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"))


@register("window_running_agg", oracle="""
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_sum,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
           AS moving_avg3,
       cast(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS running_n
FROM events
""")
def window_running_agg(spark, sf):
    """Aggregates over ROWS frames: running sum, moving average
    (runningAccumulate / ROWS BETWEEN idioms §2.5)."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
        .alias("running_sum"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg3"),
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_n"))


@register("window_range_frame", oracle="""
SELECT o_orderkey, o_totalprice,
       cast(count(*) OVER (ORDER BY o_totalprice
                           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_within_10k
FROM orders
""")
def window_range_frame(spark, sf):
    """RANGE BETWEEN value frame (§2.5) over the global order — computed
    per range-bucket with halo-exchanged ghost rows
    (operators/grank.global_range_count); no single-partition window."""
    from clickhouse_clickhouse_spark.operators.grank import global_range_count

    o = load_table(spark, sf, "orders")
    return global_range_count(o.select("o_orderkey", "o_totalprice"),
                              "o_totalprice", 10000, out="n_within_10k")


@register("window_value_funcs", oracle="""
SELECT user_id, event_id,
       first_value(event_type) OVER w AS first_ev,
       last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS last_ev,
       nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS second_ev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_value_funcs(spark, sf):
    """first_value/last_value/nth_value with explicit full frames."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id", "event_id",
        F.first("event_type").over(w).alias("first_ev"),
        F.last("event_type").over(full).alias("last_ev"),
        F.nth_value("event_type", 2).over(full).alias("second_ev"))


@register("qualify_latest_order", oracle="""
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) t WHERE rn = 1
""")
def qualify_latest_order(spark, sf):
    """QUALIFY row_number() = 1 — latest order per customer (also the
    FINAL/ReplacingMergeTree dedup-on-read shape, §4.3 item 6)."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(),
                                                F.col("o_orderkey").desc())
    return qualify(o.select("o_custkey", "o_orderkey", "o_orderdate"),
                   F.row_number().over(w), lambda q: q == 1)


@register("limit_with_ties_q", oracle="""
SELECT o_orderkey, o_orderpriority FROM (
  SELECT o_orderkey, o_orderpriority,
         rank() OVER (ORDER BY o_orderpriority) AS rk
  FROM orders) t WHERE rk <= 5
""")
def limit_with_ties_q(spark, sf):
    """LIMIT 5 WITH TIES: everything tying the 5th row's sort key stays."""
    o = load_table(spark, sf, "orders")
    return limit_with_ties(o.select("o_orderkey", "o_orderpriority"),
                           5, ["o_orderpriority"])


@register("ch_sql_limit_with_ties", oracle="""
SELECT o_custkey, o_totalprice FROM (
  SELECT o_custkey, o_totalprice,
         rank() OVER (ORDER BY o_custkey DESC) AS rk
  FROM orders WHERE o_totalprice > 400000) t WHERE rk <= 3
""")
def ch_sql_limit_with_ties(spark, sf):
    """LIMIT n WITH TIES through the dialect front end (round-5:
    translated instead of refused): ch_sql strips the trailing clause and
    applies the two-pass boundary filter — no single-partition RANK
    exchange. DESC key exercises the direction-aware boundary compare.
    Upstream LimitTransform.cpp ties mode."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return ch_sql(spark, """
        SELECT o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 400000
        ORDER BY o_custkey DESC LIMIT 3 WITH TIES""")


@register("with_fill_days", oracle="""
WITH spine AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                INTERVAL 1 DAY))::DATE AS day
), daily AS (
  SELECT o_orderdate::DATE AS day, count(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  GROUP BY 1)
SELECT cast(spine.day AS TIMESTAMP) AS day, coalesce(n_orders, 0) AS n_orders
FROM spine LEFT JOIN daily ON spine.day = daily.day
""")
def with_fill_days(spark, sf):
    """ORDER BY day WITH FILL — gap-filled daily order counts over Q1-1995
    (reference FillingTransform) via the with_fill helper."""
    o = load_table(spark, sf, "orders")
    daily = (o.filter((F.col("o_orderdate") >= "1995-01-01") &
                      (F.col("o_orderdate") < "1995-04-01"))
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count("*").alias("n_orders")))
    filled = with_fill(daily, "day",
                       datetime.date(1995, 1, 1), datetime.date(1995, 3, 31),
                       F.expr("INTERVAL 1 DAY"))
    return filled.select(F.col("day").cast("timestamp").alias("day"),
                     F.coalesce("n_orders", F.lit(0)).alias("n_orders"))


@register("orderby_nulls_last", oracle="""
SELECT nationkey, n_cust FROM (
  SELECT n_nationkey AS nationkey, cnt AS n_cust
  FROM nation LEFT JOIN (SELECT c_nationkey, count(*) AS cnt
                         FROM customer GROUP BY c_nationkey) c
    ON n_nationkey = c_nationkey) t
ORDER BY n_cust DESC NULLS LAST, nationkey
LIMIT 10
""")
def orderby_nulls_last(spark, sf):
    """Explicit NULLS LAST ordering — the reference defaults to NULLS
    LAST, Spark to NULLS FIRST on asc; builders always say it explicitly
    (SURVEY.md §4.3 item 5)."""
    n = load_table(spark, sf, "nation")
    c = (load_table(spark, sf, "customer").groupBy("c_nationkey")
         .agg(F.count("*").alias("cnt")))
    j = n.join(c, n.n_nationkey == c.c_nationkey, "left")
    return (j.select(F.col("n_nationkey").alias("nationkey"),
                     F.col("cnt").alias("n_cust"))
            .orderBy(F.col("n_cust").desc_nulls_last(), F.col("nationkey"))
            .limit(10))


@register("with_fill_interpolate", oracle="""
WITH spine AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                INTERVAL 1 DAY))::DATE AS day
), daily AS (
  SELECT o_orderdate::DATE AS day, round(sum(o_totalprice), 2) AS revenue
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  GROUP BY 1),
j AS (SELECT spine.day AS day, revenue
      FROM spine LEFT JOIN daily ON spine.day = daily.day)
SELECT cast(day AS TIMESTAMP) AS day,
       last_value(revenue IGNORE NULLS) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS revenue_filled
FROM j
""")
def with_fill_interpolate(spark, sf):
    """WITH FILL ... INTERPOLATE: gap-filled daily revenue with previous
    non-null carried forward (FillingTransform INTERPOLATE §2.6) via the
    with_fill helper's carry_forward."""
    import datetime
    o = load_table(spark, sf, "orders")
    daily = (o.filter((F.col("o_orderdate") >= "1995-01-01") &
                      (F.col("o_orderdate") < "1995-04-01"))
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    filled = with_fill(daily, "day",
                       datetime.date(1995, 1, 1), datetime.date(1995, 3, 31),
                       F.expr("INTERVAL 1 DAY"), carry_forward=["revenue"])
    return filled.select(F.col("day").cast("timestamp").alias("day"),
                         F.col("revenue").alias("revenue_filled"))
