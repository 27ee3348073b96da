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
    """Top-10 users by error count. orderBy().limit() compiles to
    TakeOrderedAndProject (per-partition top-10 heaps merged on the
    driver) — no global rank window, no single-partition exchange."""
    ev = load_table(spark, sf, "events")
    g = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.count("*").alias("n_total"))
    return (g.orderBy(F.col("n_errors").desc(), F.col("user_id")).limit(10)
            .select("user_id", "n_errors", "n_total"))


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
    """Decile profile of the value distribution — exact SQL ntile
    semantics via the distributed bucketed rank (operators/grank.py);
    no single-partition window."""
    from clickhouse_clickhouse_spark.operators.grank import global_ntile

    ev = load_table(spark, sf, "events")
    return (global_ntile(ev.select("value", "event_id"), "value", 10,
                         tiebreaks=["event_id"], out="decile")
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


@register("cb_json_prop_buckets", oracle="""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_bucket,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1
""")
def cb_json_prop_buckets(spark, sf):
    """ClickBench URL-parameter-extraction shape: JSON prop pulled out of
    every row, bucketed, aggregated (scan-heavy string work)."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.filter(k.isNotNull())
            .groupBy((k % 10).cast("int").alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("value"), 6).alias("avg_value")))


@register("cb_weekday_purchase_rate", oracle="""
SELECT CAST(isodow(ts) AS INT) AS weekday,
       count(*) AS n,
       round(count_if(event_type = 'purchase') * 100.0 / count(*), 6)
         AS purchase_pct
FROM events GROUP BY 1
""")
def cb_weekday_purchase_rate(spark, sf):
    """Day-of-week activity profile with a conditional-rate column."""
    ev = load_table(spark, sf, "events")
    wd = F.dayofweek("ts")  # Sun=1..Sat=7 -> ISO Mon=1..Sun=7
    iso = F.when(wd == 1, 7).otherwise(wd - 1).cast("int")
    return (ev.groupBy(iso.alias("weekday"))
            .agg(F.count("*").alias("n"),
                 F.round(F.count_if(F.col("event_type") == "purchase")
                         * 100.0 / F.count("*"), 6).alias("purchase_pct")))


@register("cb_like_filter_topk", oracle="""
SELECT event_type, count(*) AS n
FROM events WHERE props LIKE '%7%'
GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5
""")
def cb_like_filter_topk(spark, sf):
    """ClickBench LIKE-scan shape: substring filter over the payload
    column, then top-k groups (the filter pushes to the Parquet scan)."""
    ev = load_table(spark, sf, "events")
    return (ev.filter(F.col("props").like("%7%"))
            .groupBy("event_type").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "event_type").limit(5))


@register("cb_multi_distinct", oracle="""
SELECT count(DISTINCT user_id) AS u_users,
       count(DISTINCT event_type) AS u_types,
       count(DISTINCT CAST(ts AS DATE)) AS u_days,
       count(*) AS n
FROM events
""")
def cb_multi_distinct(spark, sf):
    """Several exact distinct counts in one statement (Spark expands to
    an expand+two-phase aggregate — one logical pass over the scan)."""
    ev = load_table(spark, sf, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("u_users"),
        F.countDistinct("event_type").alias("u_types"),
        F.countDistinct(F.col("ts").cast("date")).alias("u_days"),
        F.count("*").alias("n"))


@register("cb_value_pow2_histogram", oracle="""
SELECT CAST(CASE WHEN value <= 0 THEN 0
            ELSE power(2, ceil(log2(value))) END AS DOUBLE) AS bucket,
       count(*) AS n
FROM events GROUP BY 1
""")
def cb_value_pow2_histogram(spark, sf):
    """roundToExp2-style histogram: power-of-two value buckets
    (reference FunctionsRound roundToExp2 / ClickBench duration
    histograms)."""
    ev = load_table(spark, sf, "events")
    bucket = (F.when(F.col("value") <= 0, F.lit(0.0))
              .otherwise(F.pow(F.lit(2.0), F.ceil(F.log2("value")))))
    return (ev.groupBy(bucket.cast("double").alias("bucket"))
            .agg(F.count("*").alias("n")))


@register("cb_busiest_10min", oracle="""
SELECT time_bucket(INTERVAL 10 MINUTE, date_trunc('microseconds', ts)) AS bucket,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY n DESC, bucket LIMIT 10
""")
def cb_busiest_10min(spark, sf):
    """Top-10 busiest 10-minute buckets (toStartOfInterval + top-k —
    the reference's traffic-spike query shape)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "10 minutes").getField("start")
                       .alias("bucket"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "bucket").limit(10))


@register("cb_user_value_page2", oracle="""
SELECT user_id, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 10 OFFSET 10
""")
def cb_user_value_page2(spark, sf):
    """Pagination shape: second page of the user-value ranking
    (ORDER BY ... LIMIT n OFFSET m)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("user_id")
            .agg(F.round(F.sum("value"), 4).alias("total_value"))
            .orderBy(F.col("total_value").desc(), "user_id")
            .offset(10).limit(10))


@register("cb_regex_extract_group", oracle="""
SELECT regexp_extract(props, '([0-9])', 1) AS first_digit,
       count(*) AS n, count(DISTINCT user_id) AS u
FROM events WHERE regexp_extract(props, '([0-9])', 1) <> ''
GROUP BY 1
""")
def cb_regex_extract_group(spark, sf):
    """Regex extraction over the payload column feeding the group key
    (ClickBench extract-from-URL shape)."""
    ev = load_table(spark, sf, "events")
    d = F.regexp_extract("props", r"([0-9])", 1)
    return (ev.filter(d != "")
            .groupBy(d.alias("first_digit"))
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("u")))


@register("cb_dialect_top_types", oracle="""
SELECT event_type, count(DISTINCT user_id) AS u, count(*) AS c
FROM events GROUP BY event_type ORDER BY u DESC, event_type LIMIT 10
""")
def cb_dialect_top_types(spark, sf):
    """ClickBench shape written in the reference DIALECT and executed
    through the ch_sql front end (uniqExact/count()/ORDER..LIMIT)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT event_type, uniqExact(user_id) AS u, count() AS c
        FROM events GROUP BY event_type
        ORDER BY u DESC, event_type LIMIT 10""")


@register("cb_dialect_daily", oracle="""
SELECT date_trunc('day', ts) AS d,
       count(DISTINCT user_id) AS dau,
       cast(count_if(event_type = 'purchase') AS BIGINT) AS buys,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY 1
""")
def cb_dialect_daily(spark, sf):
    """Daily-active rollup in dialect SQL (toStartOfDay, uniqExact,
    countIf with the dialect's == operator) via ch_sql."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT toStartOfDay(ts) AS d,
               uniqExact(user_id) AS dau,
               countIf(event_type == 'purchase') AS buys,
               round(sum(value), 4) AS value_sum
        FROM events GROUP BY d""")


@register("cb_wide_sums", oracle="""
SELECT date_trunc('day', ts) AS d,
       round(sum(value), 4) AS total_value,
       cast(count_if(event_type = 'view') AS BIGINT) AS n_view,
       cast(count_if(event_type = 'click') AS BIGINT) AS n_click,
       cast(count_if(event_type = 'purchase') AS BIGINT) AS n_buy,
       cast(count_if(event_type = 'error') AS BIGINT) AS n_err,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4)
           AS buy_value,
       cast(max(cast(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events GROUP BY 1
""")
def cb_wide_sums(spark, sf):
    """The ClickBench 'many aggregates in one pass' shape (Q30-class):
    eight aggregates over one scan — a single two-phase hash agg, every
    conditional count map-side combined; nothing re-reads the table."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.date_trunc("day", "ts").alias("d"))
            .agg(F.round(F.sum("value"), 4).alias("total_value"),
                 F.count_if(F.col("event_type") == "view").alias("n_view"),
                 F.count_if(F.col("event_type") == "click").alias("n_click"),
                 F.count_if(F.col("event_type") == "purchase").alias("n_buy"),
                 F.count_if(F.col("event_type") == "error").alias("n_err"),
                 F.round(F.sum(F.when(F.col("event_type") == "purchase",
                                      F.col("value"))), 4).alias("buy_value"),
                 F.max(F.get_json_object("props", "$.k").cast("int"))
                  .alias("max_k")))


@register("cb_heavy_users", oracle="""
SELECT user_id, n FROM (
  SELECT user_id, count(*) AS n,
         row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn
  FROM events GROUP BY user_id HAVING count(*) > 50) t
WHERE rn <= 20
""")
def cb_heavy_users(spark, sf):
    """Heavy-hitter selection (HAVING over a count) + top-k: hash agg,
    post-agg filter, TakeOrderedAndProject — no global rank window."""
    ev = load_table(spark, sf, "events")
    g = ev.groupBy("user_id").agg(F.count("*").alias("n")).filter("n > 50")
    return g.orderBy(F.col("n").desc(), F.col("user_id")).limit(20)


@register("cb_star_filter_page", oracle="""
SELECT * FROM events
WHERE event_type = 'purchase' AND value > 40
ORDER BY ts, event_id LIMIT 25
""")
def cb_star_filter_page(spark, sf):
    """SELECT * pagination under a pushed filter (ClickBench Q23-class):
    the predicate reaches the parquet scan, the full-width rows ride a
    TakeOrderedAndProject top-25 — wide projection does NOT force a wide
    shuffle."""
    ev = load_table(spark, sf, "events")
    return (ev.filter((F.col("event_type") == "purchase")
                      & (F.col("value") > 40))
            .orderBy("ts", "event_id").limit(25))


@register("cb_minmax_ts", oracle="""
SELECT min(ts) AS first_ts, max(ts) AS last_ts,
       CAST(count(*) AS BIGINT) AS n
FROM events
""")
def cb_minmax_ts(spark, sf):
    """ClickBench Q6 shape: min/max over the time column — answered from
    parquet row-group stats + a count-star (no data columns read)."""
    ev = load_table(spark, sf, "events")
    return ev.agg(F.min("ts").alias("first_ts"),
                  F.max("ts").alias("last_ts"),
                  F.count("*").alias("n"))


@register("cb_point_lookup", oracle="""
SELECT event_id, ts, event_type, round(value, 6) AS value
FROM events WHERE user_id = 42
""")
def cb_point_lookup(spark, sf):
    """ClickBench Q19 shape: point lookup on a key column — the filter
    must reach the parquet scan (PushedFilters), reading only matching
    row groups."""
    ev = load_table(spark, sf, "events")
    return (ev.filter(F.col("user_id") == 42)
            .select("event_id", "ts", "event_type",
                    F.round("value", 6).alias("value")))


@register("cb_user_minute_type", oracle="""
SELECT user_id, CAST(minute(ts) AS INT) AS m, event_type,
       CAST(count(*) AS BIGINT) AS c
FROM events GROUP BY user_id, minute(ts), event_type
ORDER BY c DESC, user_id, m, event_type LIMIT 10
""")
def cb_user_minute_type(spark, sf):
    """ClickBench Q18 shape: multi-key group with a time-part extraction
    key; top-10 via TakeOrderedAndProject (per-partition heaps, no global
    sort)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("user_id", F.minute("ts").alias("m"), "event_type")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "user_id", "m", "event_type")
            .limit(10))


@register("cb_having_avg_len", oracle="""
SELECT event_type, round(avg(len(props)), 6) AS avg_len,
       CAST(count(*) AS BIGINT) AS c
FROM events WHERE props <> ''
GROUP BY event_type HAVING count(*) > 50
ORDER BY avg_len DESC, event_type LIMIT 25
""")
def cb_having_avg_len(spark, sf):
    """ClickBench Q27 shape: aggregate over a string-length expression
    with a HAVING floor and ordered limit."""
    ev = load_table(spark, sf, "events")
    return (ev.filter(F.col("props") != "")
            .groupBy("event_type")
            .agg(F.round(F.avg(F.length("props")), 6).alias("avg_len"),
                 F.count("*").alias("c"))
            .filter(F.col("c") > 50)
            .orderBy(F.desc("avg_len"), "event_type")
            .limit(25))


@register("cb_expr_group_keys", oracle="""
SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, user_id - 3 AS u3,
       CAST(count(*) AS BIGINT) AS c
FROM events GROUP BY user_id, user_id - 1, user_id - 2, user_id - 3
ORDER BY c DESC, user_id LIMIT 10
""")
def cb_expr_group_keys(spark, sf):
    """ClickBench Q35 shape: grouping on derived expressions of one key
    (Catalyst collapses them to a single-key exchange)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(
        F.col("user_id"),
        (F.col("user_id") - 1).alias("u1"),
        (F.col("user_id") - 2).alias("u2"),
        (F.col("user_id") - 3).alias("u3"))
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .limit(10))


@register("cb_case_source_split", oracle="""
SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
            WHEN event_type = 'purchase' THEN 'conversion'
            WHEN event_type = 'error' THEN 'failure'
            ELSE 'other' END AS bucket,
       CAST(count(*) AS BIGINT) AS c,
       round(sum(value), 4) AS total_value
FROM events GROUP BY 1 ORDER BY c DESC, bucket LIMIT 1000
""")
def cb_case_source_split(spark, sf):
    """ClickBench Q39 shape: CASE-bucketed traffic classification."""
    ev = load_table(spark, sf, "events")
    bucket = (F.when(F.col("event_type").isin("click", "view"),
                     "engagement")
              .when(F.col("event_type") == "purchase", "conversion")
              .when(F.col("event_type") == "error", "failure")
              .otherwise("other"))
    return (ev.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("c"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .orderBy(F.desc("c"), "bucket")
            .limit(1000))


@register("cb_like_min_agg", oracle="""
SELECT event_type, min(props) AS first_props,
       CAST(count(*) AS BIGINT) AS c,
       CAST(count(DISTINCT user_id) AS BIGINT) AS u
FROM events WHERE event_type LIKE '%c%' AND value > 0
GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10
""")
def cb_like_min_agg(spark, sf):
    """ClickBench Q21 shape: LIKE + range filter feeding min-string and
    distinct-count aggregates."""
    ev = load_table(spark, sf, "events")
    return (ev.filter(F.col("event_type").like("%c%")
                      & (F.col("value") > 0))
            .groupBy("event_type")
            .agg(F.min("props").alias("first_props"),
                 F.count("*").alias("c"),
                 F.count_distinct("user_id").alias("u"))
            .orderBy(F.desc("c"), "event_type")
            .limit(10))


@register("cb_order_by_string", oracle="""
SELECT event_id, props FROM events WHERE event_type = 'click'
ORDER BY props, event_id LIMIT 10
""")
def cb_order_by_string(spark, sf):
    """ClickBench Q25 shape: filtered string-ordered top rows
    (TakeOrderedAndProject — per-partition heaps)."""
    ev = load_table(spark, sf, "events")
    return (ev.filter(F.col("event_type") == "click")
            .select("event_id", "props")
            .orderBy("props", "event_id")
            .limit(10))


@register("cb_month_type_matrix", oracle="""
SELECT CAST(strftime(ts, '%Y-%m') AS VARCHAR) AS ym, event_type,
       CAST(count(*) AS BIGINT) AS c,
       round(avg(value), 6) AS av
FROM events
GROUP BY ym, event_type
ORDER BY ym, event_type
""")
def cb_month_type_matrix(spark, sf):
    """ClickBench Q35 shape: two-key time-bucket matrix (month x type)
    with count + avg — one hash aggregation, pushed-down scan."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.date_format("ts", "yyyy-MM").alias("ym"),
                       "event_type")
            .agg(F.count("*").alias("c"),
                 F.round(F.avg("value"), 6).alias("av"))
            .orderBy("ym", "event_type"))


@register("cb_json_key_quartiles", oracle="""
WITH j AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
         event_type
  FROM events WHERE props IS NOT NULL)
SELECT event_type,
       CAST(count(*) FILTER (WHERE kv >= 50) AS BIGINT) AS hi,
       CAST(count(*) FILTER (WHERE kv < 50) AS BIGINT) AS lo,
       CAST(max(kv) AS BIGINT) AS mx
FROM j GROUP BY event_type ORDER BY event_type
""")
def cb_json_key_quartiles(spark, sf):
    """ClickBench JSON-param shape: typed JSON extraction feeding
    conditional counts — GetJsonObject stays in codegen, one hash agg."""
    ev = load_table(spark, sf, "events")
    kv = F.get_json_object("props", "$.k").cast("long")
    return (ev.filter(F.col("props").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.when(kv >= 50, 1)).alias("hi"),
                 F.count(F.when(kv < 50, 1)).alias("lo"),
                 F.max(kv).alias("mx"))
            .orderBy("event_type"))


@register("cb_user_retention_week", oracle="""
WITH w AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
              AS BIGINT) AS wk
  FROM events),
f AS (SELECT user_id, min(wk) AS first_wk FROM w GROUP BY user_id),
r AS (SELECT DISTINCT w.user_id, f.first_wk, w.wk
      FROM w JOIN f USING (user_id))
SELECT first_wk, CAST(wk - first_wk AS BIGINT) AS age_weeks,
       CAST(count(*) AS BIGINT) AS users
FROM r GROUP BY first_wk, age_weeks
ORDER BY first_wk, age_weeks
""")
def cb_user_retention_week(spark, sf):
    """Cohort retention matrix (the ClickBench-adjacent product-analytics
    rollup): first-seen week per user (one agg), cohort age per active
    week, user counts — two hash shuffles on user_id then on the cohort
    key, no windows."""
    ev = load_table(spark, sf, "events")
    w = ev.select("user_id",
                  F.floor(F.datediff(F.col("ts").cast("date"),
                                     F.lit("2024-01-01").cast("date"))
                          / 7).cast("long").alias("wk"))
    f = w.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    r = w.join(f, "user_id").select("user_id", "first_wk", "wk").distinct()
    return (r.groupBy("first_wk",
                      (F.col("wk") - F.col("first_wk")).cast("long")
                      .alias("age_weeks"))
            .agg(F.count("*").alias("users"))
            .orderBy("first_wk", "age_weeks"))
