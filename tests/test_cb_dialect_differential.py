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
}


def _canon(df):
    import decimal

    def norm(v):
        if isinstance(v, decimal.Decimal):
            v = float(v)         # SQL 100.0 literals parse as DECIMAL
        return round(v, 6) if isinstance(v, float) else v

    return sorted((tuple(norm(v) for v in row)
                   for row in df.collect()), key=repr)


@pytest.mark.parametrize("name", sorted(CASES))
def test_cb_dialect_twin_matches(spark, name):
    qs = all_queries()
    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")
    expect = qs[name](spark, SF_DIR)
    got = ch_sql(spark, CASES[name])
    assert sorted(c.lower() for c in got.columns) == \
        sorted(c.lower() for c in expect.columns), name
    got = got.select(*expect.columns)
    assert _canon(got) == _canon(expect), name
