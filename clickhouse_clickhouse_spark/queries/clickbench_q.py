"""ClickBench-style denormalized analytics over the `events` table — the
reference's home workload shape (single wide table, heavy filters +
aggregations; BASELINE.md: ClickBench methodology). All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("cb_counts_by_type", oracle="""
SELECT event_type, count(*) AS n,
       count(DISTINCT user_id) AS uniq_users,
       round(sum(value), 4) AS total_value,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY event_type
""")
def cb_counts_by_type(spark, sf):
    """ClickBench shape: full-scan group-aggregate with distinct count."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("uniq_users"),
                 F.round(F.sum("value"), 4).alias("total_value"),
                 F.round(F.avg("value"), 6).alias("avg_value")))


@register("cb_hourly_activity", oracle="""
SELECT cast(hour(ts) AS INT) AS hr, count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS median_value
FROM events GROUP BY 1
""")
def cb_hourly_activity(spark, sf):
    """Hour-of-day histogram + per-bucket median."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.hour("ts").alias("hr"))
            .agg(F.count("*").alias("n"),
                 F.round(F.percentile("value", F.lit(0.5)), 6)
                 .alias("median_value")))


@register("cb_top_users_by_errors", oracle="""
SELECT user_id, n_errors, n_total FROM (
  SELECT user_id,
         cast(count_if(event_type = 'error') AS BIGINT) AS n_errors,
         count(*) AS n_total,
         row_number() OVER (ORDER BY count_if(event_type = 'error') DESC,
                            user_id) AS rn
  FROM events GROUP BY user_id) t
WHERE rn <= 10
""")
def cb_top_users_by_errors(spark, sf):
    """Top-10 users by error count (conditional agg + global rank)."""
    ev = load_table(spark, sf, "events")
    g = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.count("*").alias("n_total"))
    w = Window.orderBy(F.col("n_errors").desc(), F.col("user_id"))
    return (g.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10).select("user_id", "n_errors", "n_total"))


@register("cb_daily_unique_active", oracle="""
SELECT cast(cast(ts AS DATE) AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events
FROM events GROUP BY 1
""")
def cb_daily_unique_active(spark, sf):
    """DAU series: per-day distinct users (day emitted as midnight
    timestamp — DATE outputs hit the pandas date-vs-datetime64 dtype
    mismatch between the engines)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.col("ts").cast("date").cast("timestamp").alias("day"))
            .agg(F.countDistinct("user_id").alias("dau"),
                 F.count("*").alias("n_events")))


@register("cb_value_deciles", oracle="""
SELECT cast(d AS INT) AS decile, count(*) AS n,
       round(min(value), 4) AS lo, round(max(value), 4) AS hi
FROM (SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS d
      FROM events) t
GROUP BY 1
""")
def cb_value_deciles(spark, sf):
    """Decile profile of the value distribution (global ntile)."""
    ev = load_table(spark, sf, "events")
    w = Window.orderBy("value", "event_id")
    return (ev.select("value", F.ntile(10).over(w).alias("decile"))
            .groupBy("decile")
            .agg(F.count("*").alias("n"),
                 F.round(F.min("value"), 4).alias("lo"),
                 F.round(F.max("value"), 4).alias("hi")))


@register("cb_type_share_per_user", oracle="""
SELECT user_id,
       round(cast(count_if(event_type = 'purchase') AS DOUBLE) / count(*), 6)
           AS purchase_share,
       round(cast(count_if(event_type = 'view') AS DOUBLE) / count(*), 6)
           AS view_share
FROM events GROUP BY user_id
""")
def cb_type_share_per_user(spark, sf):
    """Behavioral mix per user (ratio-of-conditional-counts)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("user_id")
            .agg(F.round(F.count_if(F.col("event_type") == "purchase")
                         .cast("double") / F.count("*"), 6).alias("purchase_share"),
                 F.round(F.count_if(F.col("event_type") == "view")
                         .cast("double") / F.count("*"), 6).alias("view_share")))
