"""ClickBench dialect differential: representative cb_* shapes written
in the REFERENCE DIALECT and executed through ch_sql must produce
exactly the rows of the registered DataFrame implementation — the
paste-your-analytics-SQL migration check over realistic query text.
"""

import pytest

from clickhouse_clickhouse_spark.ch_sql import ch_sql
from clickhouse_clickhouse_spark.registry import all_queries
from clickhouse_clickhouse_spark.tables import load_table

from conftest import SF_DIR

# (registered query, dialect twin) — the twin uses reference spellings
# (count(), uniqExact, countIf, toStartOfDay, ==, LIMIT, multiIf...)
CASES = {
    "cb_counts_by_type": """
        SELECT event_type, count() AS n, uniqExact(user_id) AS uniq_users,
               round(sum(value), 4) AS total_value,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY event_type""",
    "cb_top_users_by_errors": """
        SELECT user_id, countIf(event_type == 'error') AS n_errors,
               count() AS n_total
        FROM events GROUP BY user_id
        ORDER BY n_errors DESC, user_id LIMIT 10""",
    "cb_weekday_purchase_rate": """
        SELECT toDayOfWeek(ts) AS weekday, count() AS n,
               round(countIf(event_type == 'purchase') * 100.0 / count(),
                     6) AS purchase_pct
        FROM events GROUP BY weekday""",
    "cb_like_filter_topk": """
        SELECT event_type, count() AS n FROM events
        WHERE props LIKE '%7%'
        GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5""",
    "cb_multi_distinct": """
        SELECT uniqExact(user_id) AS u_users,
               uniqExact(event_type) AS u_types,
               uniqExact(toDate(ts)) AS u_days, count() AS n
        FROM events""",
    "cb_minute_histogram": """
        SELECT toMinute(ts) AS m, count() AS c,
               round(avg(value), 6) AS av
        FROM events GROUP BY m ORDER BY m""",
    "cb_substr_topk": """
        SELECT substring(props, 1, 8) AS prefix, count() AS c,
               uniqExact(user_id) AS u
        FROM events WHERE props != ''
        GROUP BY prefix ORDER BY c DESC, prefix LIMIT 10""",
    "cb_case_source_split": """
        SELECT multiIf(event_type IN ('click', 'view'), 'engagement',
                       event_type == 'purchase', 'conversion',
                       event_type == 'error', 'failure',
                       'other') AS bucket,
               count() AS c, round(sum(value), 4) AS total_value
        FROM events GROUP BY bucket ORDER BY c DESC, bucket LIMIT 1000""",
    "cb_heavy_users": """
        SELECT user_id, count() AS n FROM events
        GROUP BY user_id HAVING n > 50
        ORDER BY n DESC, user_id LIMIT 20""",
    "cb_regex_heavy_scan": """
        SELECT event_type, count() AS c, round(sum(value), 4) AS tv
        FROM events
        WHERE match(props, '"k": [0-9]*[13579]}')
          AND match(event_type, '^(click|view|purchase)$')
          AND NOT match(props, '"k": 9[0-9]}')
        GROUP BY event_type ORDER BY event_type""",
    # ---- round 7: the remaining 33 shapes, closing the 43/43 dialect
    # differential (round-6 verdict item 1) ----
    "cb_hourly_activity": """
        SELECT toHour(ts) AS hr, count() AS n,
               round(quantileExact(0.5)(value), 6) AS median_value
        FROM events GROUP BY hr""",
    "cb_daily_unique_active": """
        SELECT toStartOfDay(ts) AS day, uniqExact(user_id) AS dau,
               count() AS n_events
        FROM events GROUP BY day""",
    "cb_value_deciles": """
        SELECT toInt32(d) AS decile, count() AS n,
               round(min(value), 4) AS lo, round(max(value), 4) AS hi
        FROM (SELECT value,
                     ntile(10) OVER (ORDER BY value, event_id) AS d
              FROM events) t
        GROUP BY decile""",
    "cb_type_share_per_user": """
        SELECT user_id,
               round(countIf(event_type == 'purchase') / count(), 6)
                   AS purchase_share,
               round(countIf(event_type == 'view') / count(), 6)
                   AS view_share
        FROM events GROUP BY user_id""",
    "cb_json_prop_buckets": """
        SELECT toInt32(toInt32(JSONExtractString(props, 'k')) % 10)
                   AS k_bucket,
               count() AS n, round(avg(value), 6) AS avg_value
        FROM events WHERE JSONExtractString(props, 'k') IS NOT NULL
        GROUP BY k_bucket""",
    "cb_value_pow2_histogram": """
        SELECT toFloat64(multiIf(value <= 0, 0.0,
                                 exp2(ceil(log2(value))))) AS bucket,
               count() AS n
        FROM events GROUP BY bucket""",
    "cb_busiest_10min": """
        SELECT toStartOfInterval(ts, INTERVAL 10 MINUTE) AS bucket,
               count() AS n
        FROM events GROUP BY bucket
        ORDER BY n DESC, bucket LIMIT 10""",
    "cb_user_value_page2": """
        SELECT user_id, round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id LIMIT 10, 10""",
    "cb_regex_extract_group": """
        SELECT extract(props, '([0-9])') AS first_digit,
               count() AS n, uniqExact(user_id) AS u
        FROM events WHERE extract(props, '([0-9])') != ''
        GROUP BY first_digit""",
    "cb_dialect_top_types": """
        SELECT event_type, uniqExact(user_id) AS u, count() AS c
        FROM events GROUP BY event_type
        ORDER BY u DESC, event_type LIMIT 10""",
    "cb_dialect_daily": """
        SELECT toStartOfDay(ts) AS d, uniqExact(user_id) AS dau,
               countIf(event_type == 'purchase') AS buys,
               round(sum(value), 4) AS value_sum
        FROM events GROUP BY d""",
    "cb_wide_sums": """
        SELECT toStartOfDay(ts) AS d,
               round(sum(value), 4) AS total_value,
               countIf(event_type == 'view') AS n_view,
               countIf(event_type == 'click') AS n_click,
               countIf(event_type == 'purchase') AS n_buy,
               countIf(event_type == 'error') AS n_err,
               round(sumIf(value, event_type == 'purchase'), 4)
                   AS buy_value,
               max(toInt32(JSONExtractString(props, 'k'))) AS max_k
        FROM events GROUP BY d""",
    "cb_star_filter_page": """
        SELECT * FROM events
        WHERE event_type == 'purchase' AND value > 40
        ORDER BY ts, event_id LIMIT 25""",
    "cb_minmax_ts": """
        SELECT min(ts) AS first_ts, max(ts) AS last_ts, count() AS n
        FROM events""",
    "cb_point_lookup": """
        SELECT event_id, ts, event_type, round(value, 6) AS value
        FROM events WHERE user_id == 42""",
    "cb_user_minute_type": """
        SELECT user_id, toMinute(ts) AS m, event_type, count() AS c
        FROM events GROUP BY user_id, m, event_type
        ORDER BY c DESC, user_id, m, event_type LIMIT 10""",
    "cb_having_avg_len": """
        SELECT event_type, round(avg(length(props)), 6) AS avg_len,
               count() AS c
        FROM events WHERE props != ''
        GROUP BY event_type HAVING count() > 50
        ORDER BY avg_len DESC, event_type LIMIT 25""",
    "cb_expr_group_keys": """
        SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2,
               user_id - 3 AS u3, count() AS c
        FROM events GROUP BY user_id, u1, u2, u3
        ORDER BY c DESC, user_id LIMIT 10""",
    "cb_like_min_agg": """
        SELECT event_type, min(props) AS first_props, count() AS c,
               uniqExact(user_id) AS u
        FROM events WHERE event_type LIKE '%c%' AND value > 0
        GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10""",
    "cb_order_by_string": """
        SELECT event_id, props FROM events WHERE event_type == 'click'
        ORDER BY props, event_id LIMIT 10""",
    "cb_month_type_matrix": """
        SELECT formatDateTime(ts, '%Y-%m') AS ym, event_type,
               count() AS c, round(avg(value), 6) AS av
        FROM events GROUP BY ym, event_type ORDER BY ym, event_type""",
    "cb_json_key_quartiles": """
        SELECT event_type,
               countIf(toInt64(JSONExtractString(props, 'k')) >= 50)
                   AS hi,
               countIf(toInt64(JSONExtractString(props, 'k')) < 50)
                   AS lo,
               max(toInt64(JSONExtractString(props, 'k'))) AS mx
        FROM events WHERE props IS NOT NULL
        GROUP BY event_type ORDER BY event_type""",
    "cb_user_retention_week": """
        WITH w AS (SELECT user_id,
                          intDiv(dateDiff('day', toDate('2024-01-01'),
                                          toDate(ts)), 7) AS wk
                   FROM events),
             f AS (SELECT user_id, min(wk) AS first_wk
                   FROM w GROUP BY user_id),
             r AS (SELECT DISTINCT w.user_id, f.first_wk, w.wk
                   FROM w JOIN f USING (user_id))
        SELECT first_wk, toInt64(wk - first_wk) AS age_weeks,
               count() AS users
        FROM r GROUP BY first_wk, age_weeks
        ORDER BY first_wk, age_weeks""",
    "cb_url_host_seg_topk": """
        WITH u AS (SELECT concat('https://ex',
                                 toString(user_id % 3), '.com/',
                                 event_type, '/p',
                                 toString(user_id % 20), '?k=',
                                 ifNull(JSONExtractString(props, 'k'),
                                        '0')) AS url, user_id
                   FROM events)
        SELECT domain(url) AS host,
               arrayElement(splitByChar('/', path(url)), 2) AS seg,
               count() AS c, uniqExact(user_id) AS u
        FROM u GROUP BY host, seg ORDER BY c DESC, host, seg LIMIT 10""",
    # the fast twin has IDENTICAL semantics to the parse_url form, so
    # the same reference-dialect text must reproduce its rows too
    "cb_url_query_param_buckets_fast": """
        WITH u AS (SELECT concat('https://ex',
                                 toString(user_id % 3), '.com/',
                                 event_type, '/p',
                                 toString(user_id % 20), '?k=',
                                 ifNull(JSONExtractString(props, 'k'),
                                        '0')) AS url, value
                   FROM events)
        SELECT toInt32(toInt32(extractURLParameter(url, 'k')) % 10)
                   AS k_bucket,
               count() AS c, round(avg(value), 6) AS av
        FROM u WHERE extractURLParameter(url, 'k') != ''
        GROUP BY k_bucket ORDER BY k_bucket""",
    # approx-deciles twin: CH's default quantiles() is approximate too;
    # the summary row (bucket count / total / share gate) is sketch-
    # tolerant by construction, so both approximations agree on it
    "cb_value_deciles_approx": """
        WITH q AS (SELECT quantiles(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
                                    0.8, 0.9)(value) AS e FROM events),
        b AS (SELECT arrayCount(x -> value > x, e) + 1 AS decile
              FROM events, q),
        g AS (SELECT decile, count() AS n FROM b GROUP BY decile)
        SELECT toInt64(count()) AS buckets, toInt64(sum(n)) AS total,
               toInt64(max(n) <= 0.12 * sum(n)
                       AND min(n) >= 0.08 * sum(n)) AS shares_ok
        FROM g""",
    "cb_url_query_param_buckets": """
        WITH u AS (SELECT concat('https://ex',
                                 toString(user_id % 3), '.com/',
                                 event_type, '/p',
                                 toString(user_id % 20), '?k=',
                                 ifNull(JSONExtractString(props, 'k'),
                                        '0')) AS url, value
                   FROM events)
        SELECT toInt32(toInt32(extractURLParameter(url, 'k')) % 10)
                   AS k_bucket,
               count() AS c, round(avg(value), 6) AS av
        FROM u WHERE extractURLParameter(url, 'k') != ''
        GROUP BY k_bucket ORDER BY k_bucket""",
    "cb_url_path_depth": """
        WITH u AS (SELECT concat('https://ex',
                                 toString(user_id % 3), '.com/',
                                 event_type, '/p',
                                 toString(user_id % 20), '?k=',
                                 ifNull(JSONExtractString(props, 'k'),
                                        '0')) AS url, user_id
                   FROM events)
        SELECT toInt32(countSubstrings(path(url), '/')) AS depth,
               count() AS c, uniqExact(user_id) AS u
        FROM u GROUP BY depth ORDER BY depth""",
    "cb_referrer_domain_uniq": """
        SELECT multiIf(user_id % 4 == 0, 'google.com',
                       user_id % 4 == 1, 'bing.com',
                       user_id % 4 == 2, '', 'news.site') AS domain,
               uniqExact(user_id) AS u, count() AS c
        FROM events
        WHERE multiIf(user_id % 4 == 0, 'google.com',
                      user_id % 4 == 1, 'bing.com',
                      user_id % 4 == 2, '', 'news.site') != ''
        GROUP BY domain ORDER BY u DESC, domain""",
    "cb_topn_with_ties": """
        SELECT event_type, user_id, n, toInt64(rnk) AS rnk FROM (
          SELECT event_type, user_id, count() AS n,
                 rank() OVER (PARTITION BY event_type
                              ORDER BY count() DESC) AS rnk
          FROM events GROUP BY event_type, user_id) t
        WHERE rnk <= 3""",
    "cb_top_users_per_type": """
        SELECT event_type, user_id, tv FROM (
          SELECT event_type, user_id, round(sum(value), 4) AS tv,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY round(sum(value), 4) DESC,
                                             user_id) AS rn
          FROM events GROUP BY event_type, user_id) t
        WHERE rn <= 5""",
    "cb_regex_replace_group": """
        SELECT concat(event_type, ':',
                      replaceRegexpAll(props, '[0-9]+', 'N')) AS norm,
               count() AS c, round(avg(value), 6) AS av
        FROM events GROUP BY norm ORDER BY c DESC, norm LIMIT 20""",
    "cb_date_histogram_uniq": """
        SELECT toStartOfDay(ts) AS d, count() AS c,
               uniqExact(user_id) AS u,
               uniqExactIf(user_id, event_type == 'purchase') AS buyers,
               round(sum(if(event_type == 'purchase', value, 0.0)), 4)
                   AS rev
        FROM events GROUP BY d ORDER BY d""",
    "cb_activity_histogram": """
        WITH per_user AS (SELECT user_id, count() AS n
                          FROM events GROUP BY user_id)
        SELECT toInt64(intDiv(n, 10) * 10) AS n_bucket,
               count() AS users
        FROM per_user GROUP BY n_bucket ORDER BY n_bucket""",
    "cb_day_type_uniq_matrix": """
        SELECT toStartOfDay(ts) AS d, event_type,
               uniqExact(user_id) AS u, count() AS c
        FROM events WHERE value > 1
        GROUP BY d, event_type ORDER BY d, event_type""",
}


def test_every_cb_query_has_a_dialect_twin():
    """The 43/43 completeness pin: every registered ClickBench analog
    has a reference-dialect twin here — a new cb_* query without one
    fails this test, keeping the differential exhaustive."""
    cb = {n for n in all_queries() if n.startswith("cb_")}
    assert cb == set(CASES), (
        f"missing twins: {sorted(cb - set(CASES))}; "
        f"stale twins: {sorted(set(CASES) - cb)}")


def _canon(df):
    import decimal

    def norm(v):
        if isinstance(v, decimal.Decimal):
            v = float(v)         # SQL 100.0 literals parse as DECIMAL
        return round(v, 6) if isinstance(v, float) else v

    return sorted((tuple(norm(v) for v in row)
                   for row in df.collect()), key=repr)


def test_cb_dialect_twin_matches(spark):
    """All 43 dialect twins in ONE battery — translation + both
    executions are read-only, so the cases run on the conftest thread
    pool (~43 serial pytest cases → one parallel pass; every mismatch
    is still reported with its case name)."""
    from conftest import run_parallel

    qs = all_queries()
    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")

    def check(name):
        expect = qs[name](spark, SF_DIR)
        got = ch_sql(spark, CASES[name])
        assert sorted(c.lower() for c in got.columns) == \
            sorted(c.lower() for c in expect.columns), name
        got = got.select(*expect.columns)
        assert _canon(got) == _canon(expect), name

    run_parallel(sorted(CASES), check)
