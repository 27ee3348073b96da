"""M5/M6 — ordered-event analytics + batch-mode streaming windows
(SURVEY.md §2.4 windowFunnel/retention/sequence*, §2.9 tumble/hop).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.events import (
    retention, sequence_count, sessionize, window_funnel,
)
from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.streaming.windows import hop_agg, tumble_agg
from clickhouse_clickhouse_spark.tables import load_table

# Reference-default windowFunnel replay (round 8): per-level best
# chain-start as a running max over (ts, step)-ordered events — the
# DuckDB mirror of the re-arm algorithm in operators/events
# (funnel_rearm_fold_sql / window_funnel). Shared by the cascade, HOF,
# and dialect-SQL funnel entries so all three gate the SAME semantics.
_FUNNEL_REARM_ORACLE = """
WITH e AS (
  SELECT user_id, ts,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 3 END AS i
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
w1 AS (
  SELECT user_id, ts, i,
         max(CASE WHEN i = 1 THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, i
            ROWS UNBOUNDED PRECEDING) AS s1
  FROM e),
w2 AS (
  SELECT user_id, ts, i, s1,
         max(CASE WHEN i = 2 AND ts <= s1 + INTERVAL 7 DAY THEN s1 END)
           OVER (PARTITION BY user_id ORDER BY ts, i
                 ROWS UNBOUNDED PRECEDING) AS s2
  FROM w1)
SELECT user_id,
       CAST(max(CASE WHEN i = 3 AND ts <= s2 + INTERVAL 7 DAY THEN 3
                     WHEN i = 2 AND ts <= s1 + INTERVAL 7 DAY THEN 2
                     WHEN i = 1 THEN 1 END) AS INT) AS level
FROM w2 GROUP BY user_id
HAVING max(CASE WHEN i = 1 THEN 1 ELSE 0 END) = 1
"""


@register("tumble_hourly", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS w_end,
       event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2, 3
""")
def tumble_hourly(spark, sf):
    """tumble(ts, 1h) aggregation — identical expression batch/streaming
    (reference WindowView tumble §2.9)."""
    ev = load_table(spark, sf, "events")
    return tumble_agg(ev, "ts", "1 hour", ["event_type"],
                      {"n": F.count("*"),
                       "total_value": F.round(F.sum("value"), 4)})


@register("hop_6h_3h", oracle="""
WITH k AS (SELECT unnest([0, 1]) AS k)
SELECT time_bucket(INTERVAL '3 hours', ts) - k * INTERVAL 3 HOUR          AS w_start,
       time_bucket(INTERVAL '3 hours', ts) - k * INTERVAL 3 HOUR + INTERVAL 6 HOUR AS w_end,
       count(*) AS n
FROM events, k
GROUP BY 1, 2
""")
def hop_6h_3h(spark, sf):
    """hop(ts, 3h slide, 6h size): every event lands in size/slide = 2
    windows (reference WindowView hop; Spark window(size, slide))."""
    ev = load_table(spark, sf, "events")
    return hop_agg(ev, "ts", "6 hours", "3 hours", [], {"n": F.count("*")})


@register("funnel_levels", oracle=_FUNNEL_REARM_ORACLE)
def funnel_levels(spark, sf):
    """windowFunnel(7 days)(view→click→purchase): reference-default
    levels per user (re-arm + chain-start propagation) via the
    single-shuffle window-chain form (SURVEY.md §4.3 item 4; semantics
    fixed round 8 — was greedy earliest-chain)."""
    ev = load_table(spark, sf, "events")
    return window_funnel(ev, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"], "7 DAYS")


@register("retention_flags", oracle="""
SELECT user_id,
       max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
       max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r2,
       max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS r3
FROM events GROUP BY user_id
""")
def retention_flags(spark, sf):
    """retention(signup, purchase, error) per user (reference
    AggregateFunctionRetention)."""
    ev = load_table(spark, sf, "events")
    return retention(ev, "user_id",
                     [F.col("event_type") == "signup",
                      F.col("event_type") == "purchase",
                      F.col("event_type") == "error"])


@register("sequence_count_vc", oracle="""
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'v' END, '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id, cast(len(regexp_extract_all(seq, 'vc')) AS INT) AS n_matches
FROM seqs
""")
def sequence_count_vc(spark, sf):
    """sequenceCount('vc'): adjacent view→click occurrences per user over
    the time-ordered event string (reference sequenceCount; collapsed-
    string + regex strategy, §2.4)."""
    ev = load_table(spark, sf, "events")
    return sequence_count(ev, "user_id", "ts", "event_type", "event_id",
                          {"click": "c", "error": "e", "purchase": "p",
                           "signup": "s", "view": "v"}, "vc")


@register("session_stats", oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g)
SELECT user_id,
       cast(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id
""")
def session_stats(spark, sf):
    """Gap-based sessionization (30-min gap): sessions per user."""
    ev = load_table(spark, sf, "events")
    s = sessionize(ev, "user_id", "ts", 1800)
    return (s.groupBy("user_id")
            .agg(F.max("session_id").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events")))


@register("sequence_match_bool", oracle="""
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'v' END, '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id,
       regexp_matches(seq, 'v.*p') AS viewed_then_purchased,
       regexp_matches(seq, 's.*e') AS signup_then_error
FROM seqs
""")
def sequence_match_bool(spark, sf):
    """sequenceMatch('(?1).*(?2)') — boolean pattern over the ordered
    event string (reference sequenceMatch; the .* between steps is the
    events-in-between semantics)."""
    from clickhouse_clickhouse_spark.operators.events import event_string

    ev = load_table(spark, sf, "events")
    seq = event_string(ev, "user_id", "ts", "event_type", "event_id",
                       {"click": "c", "error": "e", "purchase": "p",
                        "signup": "s", "view": "v"})
    return seq.select(
        "user_id",
        F.col("seq").rlike("v.*p").alias("viewed_then_purchased"),
        F.col("seq").rlike("s.*e").alias("signup_then_error"))


@register("funnel_levels_hof", oracle=_FUNNEL_REARM_ORACLE)
def funnel_levels_hof(spark, sf):
    """windowFunnel via the single-shuffle JVM-fold implementation
    (operators/events.window_funnel_hof, reference-default re-arm
    semantics since round 8) — same oracle as the window-chain form,
    proving the two algorithms agree; one shuffle regardless of
    funnel depth."""
    from clickhouse_clickhouse_spark.operators.events import window_funnel_hof

    ev = load_table(spark, sf, "events")
    return window_funnel_hof(ev, "user_id", "ts", "event_type",
                             ["view", "click", "purchase"], 7 * 86400)


@register("funnel_strict_order", oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' ELSE 'x' END, ''
                    ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id),
cut AS (SELECT user_id, substr(s, strpos(s, 'v')) AS t
        FROM seq WHERE strpos(s, 'v') > 0)
SELECT user_id,
       CAST(CASE WHEN t LIKE 'vcp%' THEN 3
                 WHEN t LIKE 'vc%'  THEN 2
                 ELSE 1 END AS INT) AS level
FROM cut
""")
def funnel_strict_order(spark, sf):
    """windowFunnel strict_order mode (reference [U]
    AggregateFunctionWindowFunnel.cpp): after the chain starts, any event
    other than the next expected step freezes the level — so the level
    is the longest exact event-prefix view→click→purchase. Oracle mirrors
    it as a string prefix match over the (ts, event_id)-ordered event
    letters. Window is set beyond the fixture span so ordering alone
    decides (window semantics are covered by the default-mode funnels)."""
    from clickhouse_clickhouse_spark.operators.events import window_funnel_hof

    ev = load_table(spark, sf, "events")
    return window_funnel_hof(ev, "user_id", "ts", "event_type",
                             ["view", "click", "purchase"], 365 * 86400,
                             mode="strict_order", tiebreak="event_id")


@register("funnel_strict_dedup", oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' ELSE 'x' END, ''
                    ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id),
cut AS (SELECT user_id, substr(s, strpos(s, 'v')) AS t
        FROM seq WHERE strpos(s, 'v') > 0)
SELECT user_id,
       CAST(CASE WHEN regexp_matches(t, '^v[^vc]*c[^vcp]*p') THEN 3
                 WHEN regexp_matches(t, '^v[^vc]*c')         THEN 2
                 ELSE 1 END AS INT) AS level
FROM cut
""")
def funnel_strict_dedup(spark, sf):
    """windowFunnel strict_dedup mode: a repeat of an already-matched
    step before the next step freezes the chain (a second 'view' before
    the click, or a view/click repeat before the purchase); unrelated
    events pass through. Greedy: at each level the FIRST
    decision-relevant event (advance or duplicate) settles the outcome.
    Oracle: regex over the ordered event letters whose negated character
    classes admit only decision-irrelevant letters between steps."""
    from clickhouse_clickhouse_spark.operators.events import window_funnel_hof

    ev = load_table(spark, sf, "events")
    return window_funnel_hof(ev, "user_id", "ts", "event_type",
                             ["view", "click", "purchase"], 365 * 86400,
                             mode="strict_dedup", tiebreak="event_id")


@register("funnel_strict_increase", oracle="""
WITH e AS (
  SELECT user_id, ts,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 3 END AS i
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
w1 AS (
  SELECT user_id, ts, i,
         max(CASE WHEN i = 1 THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, i
            ROWS UNBOUNDED PRECEDING) AS s1,
         max(CASE WHEN i = 1 THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, i
            ROWS UNBOUNDED PRECEDING) AS l1
  FROM e),
w2 AS (
  SELECT user_id, ts, i, s1, l1,
         max(CASE WHEN i = 2 AND ts <= s1 + INTERVAL 7 DAY AND ts > l1
                  THEN s1 END) OVER
           (PARTITION BY user_id ORDER BY ts, i
            ROWS UNBOUNDED PRECEDING) AS s2,
         max(CASE WHEN i = 2 AND ts <= s1 + INTERVAL 7 DAY AND ts > l1
                  THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, i
            ROWS UNBOUNDED PRECEDING) AS l2
  FROM w1)
SELECT user_id,
       CAST(max(CASE WHEN i = 3 AND ts <= s2 + INTERVAL 7 DAY
                          AND ts > l2 THEN 3
                     WHEN i = 2 AND ts <= s1 + INTERVAL 7 DAY
                          AND ts > l1 THEN 2
                     WHEN i = 1 THEN 1 END) AS INT) AS level
FROM w2 GROUP BY user_id
HAVING max(CASE WHEN i = 1 THEN 1 ELSE 0 END) = 1
""")
def funnel_strict_increase(spark, sf):
    """windowFunnel strict_increase mode (new round 8 — upstream's
    fourth mode): the re-arm algorithm with each advance requiring a
    STRICTLY greater timestamp than the previous step's event. The
    oracle extends the re-arm running-max replay with per-level
    last-event timestamps (l1/l2); the l-chain dominance argument
    still holds because a later chain start also has a later-or-equal
    last event at each level."""
    from clickhouse_clickhouse_spark.operators.events import window_funnel_hof

    ev = load_table(spark, sf, "events")
    return window_funnel_hof(ev, "user_id", "ts", "event_type",
                             ["view", "click", "purchase"], 7 * 86400,
                             mode="strict_increase")


@register("sequence_next_node", oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END, '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id)
SELECT user_id, regexp_extract(s, 'vc(.)', 1) AS next_node
FROM seq
""")
def sequence_next_node(spark, sf):
    """sequenceNextNode (reference [U] src/AggregateFunctions/
    AggregateFunctionSequenceNextNode.cpp): the event immediately after
    the first consecutive view→click pair per user ('' when the pair
    never occurs). One shuffle: ordered event-letter string + regex."""
    from clickhouse_clickhouse_spark.operators.events import event_string

    ev = load_table(spark, sf, "events")
    seq = event_string(ev, "user_id", "ts", "event_type", "event_id",
                       {"view": "v", "click": "c", "purchase": "p",
                        "signup": "s", "error": "e"})
    return seq.select("user_id",
                      F.regexp_extract("seq", "vc(.)", 1).alias("next_node"))


@register("sequence_match_time", oracle="""
WITH p AS (
  SELECT DISTINCT v.user_id
  FROM events v JOIN events c
    ON v.user_id = c.user_id
   AND v.event_type = 'view' AND c.event_type = 'click'
   AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)
SELECT u.user_id, p.user_id IS NOT NULL AS matched
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN p USING (user_id)
""")
def sequence_match_time(spark, sf):
    """sequenceMatch('(?1)(?t<=3600)(?2)') — time-constrained pattern
    (reference sequenceMatch time conditions): view followed by a click
    within one hour. DF-native single-shuffle form: a forward-looking
    window takes each row's NEXT click timestamp, so no self-join pair
    explosion (the oracle spells the naive pair join)."""
    ev = load_table(spark, sf, "events")
    wf = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing))
    next_click = F.min(F.when(F.col("event_type") == "click",
                              F.col("ts"))).over(wf)
    hit = ((F.col("event_type") == "view") &
           next_click.isNotNull() &
           (next_click <= F.col("ts") + F.expr("INTERVAL 1 HOUR")))
    return (ev.withColumn("__hit", hit)
            .groupBy("user_id")
            .agg(F.max(F.coalesce("__hit", F.lit(False))).alias("matched")))


@register("lttb_downsample", oracle="""
WITH RECURSIVE
src AS (
  SELECT epoch_us(date_trunc('microseconds', ts)) / 1000000.0 AS x, value AS y
  FROM events WHERE event_type = 'click'),
pts AS (SELECT x, y, row_number() OVER (ORDER BY x, y) - 1 AS i FROM src),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              (count(*) - 2) / 18.0 AS every FROM pts),
b AS (
  SELECT k,
         CAST(floor(k * every) AS BIGINT) + 1       AS lo,
         CAST(floor((k + 1) * every) AS BIGINT) + 1 AS hi,
         least(CAST(floor((k + 2) * every) AS BIGINT) + 1, n) AS nhi
  FROM (SELECT unnest(generate_series(0, 17)) AS k), nn),
cent AS (
  SELECT b.k, avg(p.x) AS cx, avg(p.y) AS cy
  FROM b JOIN pts p ON p.i >= b.hi AND p.i < b.nhi
  GROUP BY b.k),
sel(k, a_i, ax, ay) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), x, y FROM pts WHERE i = 0
  UNION ALL
  (SELECT sel.k + 1, c.i, c.x, c.y
   FROM sel
   JOIN b    ON b.k = sel.k
   JOIN cent ON cent.k = sel.k
   JOIN pts c ON c.i >= b.lo AND c.i < b.hi
   WHERE sel.k < 18
   ORDER BY abs((sel.ax - cent.cx) * (c.y - sel.ay)
                - (sel.ax - c.x) * (cent.cy - sel.ay)) DESC, c.i
   LIMIT 1)),
final AS (SELECT a_i AS i FROM sel
          UNION ALL SELECT n - 1 FROM nn)
SELECT 'click' AS event_type, i, round(p.x, 6) AS x, round(p.y, 6) AS y
FROM pts p JOIN final USING (i)
""")
def lttb_downsample(spark, sf):
    """largestTriangleThreeBuckets(20) over the click-event series
    (reference AggregateFunctionLargestTriangleThreeBuckets.cpp). The
    oracle replays the sequential bucket-argmax selection with a
    recursive CTE (ORDER BY area DESC LIMIT 1 per step)."""
    from clickhouse_clickhouse_spark.operators.downsample import lttb
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "click")
    ev = ev.select("event_type", F.col("ts").cast("double").alias("xs"),
                   "value")
    out = lttb(ev, ["event_type"], "xs", "value", 20)
    return out.select("event_type", "i",
                      F.round("x", 6).alias("x"), F.round("y", 6).alias("y"))


@register("ch_sql_window_funnel", oracle=_FUNNEL_REARM_ORACLE)
def ch_sql_window_funnel(spark, sf):
    """``windowFunnel(w)(ts, cond...)`` as DIALECT SQL TEXT — the
    parametric double-call translates through the SHARED re-arm fold
    (operators/events.funnel_rearm_fold_sql; reference-default
    semantics since round 8), same oracle as the operator forms."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT user_id, level FROM (
          SELECT user_id,
                 windowFunnel(604800)(ts, event_type == 'view',
                                      event_type == 'click',
                                      event_type == 'purchase') AS level
          FROM events GROUP BY user_id) t
        WHERE level >= 1""")


@register("ch_sql_retention", oracle="""
SELECT user_id,
       to_json(
       [CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INT),
        CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT),
        CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS INT)]) AS r
FROM events GROUP BY user_id
""")
def ch_sql_retention(spark, sf):
    """``retention(cond...)`` as dialect SQL ([U]
    AggregateFunctionRetention.h): r1 = cond1 met, rk = cond1 AND
    condk met on any rows — one hash aggregate. Array output emitted
    as a JSON string (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.shapes import json_arrays

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return json_arrays(ch_sql(spark, """
        SELECT user_id, retention(event_type == 'view',
                                  event_type == 'click',
                                  event_type == 'purchase') AS r
        FROM events GROUP BY user_id"""), "r")


@register("ch_sql_sequence_count", oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE WHEN event_type = 'view' THEN 'B'
                         WHEN event_type = 'purchase' THEN 'C' END,
                    '' ORDER BY ts)
           FILTER (WHERE event_type IN ('view', 'purchase')) AS s
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(regexp_extract_all(coalesce(s, ''), 'BC')) AS BIGINT)
           AS n,
       regexp_matches(coalesce(s, ''), 'B.*C') AS m
FROM seq
""")
def ch_sql_sequence_count(spark, sf):
    """``sequenceMatch/sequenceCount('pattern')(ts, cond...)`` as
    dialect SQL: events encode to bitmask characters, (?N) becomes a
    character class, the pattern runs as a regex over the group's
    time-sorted event string — the DuckDB oracle builds the IDENTICAL
    string with string_agg and runs the same regexes."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT user_id,
               sequenceCount('(?1)(?2)')(ts, event_type == 'view',
                                         event_type == 'purchase') AS n,
               sequenceMatch('(?1).*(?2)')(ts, event_type == 'view',
                                           event_type == 'purchase') AS m
        FROM events GROUP BY user_id""")


@register("ch_sql_sequence_time", oracle="""
WITH e AS (
  SELECT user_id, ts,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 END AS i
  FROM events WHERE event_type IN ('view', 'click')),
a AS (
  SELECT user_id, ts, i,
         lead(ts) OVER w AS nts, lead(i) OVER w AS ni
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, i)),
adj AS (
  SELECT user_id,
         bool_or(i = 1 AND ni = 2
                 AND epoch(nts) - epoch(ts) <= 3600) AS m1,
         CAST(coalesce(sum(CASE WHEN i = 1 AND ni = 2
                           AND epoch(nts) - epoch(ts) <= 3600
                           THEN 1 END), 0) AS BIGINT) AS c1
  FROM a GROUP BY user_id),
sp AS (
  SELECT user_id,
         coalesce(epoch(max(CASE WHEN i = 2 THEN ts END))
                  - epoch(min(CASE WHEN i = 1 THEN ts END))
                  >= 172800, false) AS m2
  FROM e GROUP BY user_id),
all_u AS (SELECT DISTINCT user_id FROM events)
SELECT all_u.user_id, coalesce(m1, false) AS m1,
       CAST(coalesce(c1, 0) AS BIGINT) AS c1,
       coalesce(m2, false) AS m2
FROM all_u LEFT JOIN adj ON all_u.user_id = adj.user_id
           LEFT JOIN sp ON all_u.user_id = sp.user_id
""")
def ch_sql_sequence_time(spark, sf):
    """``(?t op N)`` time guards in dialect sequenceMatch/sequenceCount
    (new round 8 — previously a loud refusal; [U]
    src/AggregateFunctions/AggregateFunctionSequenceMatch.h): adjacent
    view→click within an hour (match + non-overlapping count — adjacent
    disjoint pairs, so the count equals the plain pair count) and the
    ``.*(?t>=2d)`` spread form (equivalent to max(click) - min(view)
    >= 2d since the guard forces the click after the view). The DuckDB
    oracle replays via lead() windows and min/max epochs."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT user_id,
               sequenceMatch('(?1)(?t<=3600)(?2)')(
                   ts, event_type == 'view',
                   event_type == 'click') AS m1,
               sequenceCount('(?1)(?t<=3600)(?2)')(
                   ts, event_type == 'view',
                   event_type == 'click') AS c1,
               sequenceMatch('(?1).*(?t>=172800)(?2)')(
                   ts, event_type == 'view',
                   event_type == 'click') AS m2
        FROM events GROUP BY user_id""")


@register("ch_sql_sequence_next_node", oracle="""
WITH o AS (
  SELECT user_id, event_type AS e,
         row_number() OVER w AS rn,
         lead(event_type, 1) OVER w AS n1,
         lead(event_type, 2) OVER w AS n2
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts, CASE event_type WHEN 'view' THEN 3
                                 WHEN 'click' THEN 4 ELSE 0 END,
                        event_type))
SELECT user_id,
       nullif(arg_min(coalesce(n2, chr(1)), rn)
              FILTER (e = 'view' AND n1 = 'click'), chr(1))
         AS nxt_first,
       nullif(arg_max(coalesce(n2, chr(1)), rn)
              FILTER (e = 'view' AND n1 = 'click'), chr(1))
         AS nxt_last
FROM o GROUP BY user_id
""")
def ch_sql_sequence_next_node(spark, sf):
    """``sequenceNextNode(direction, base)(ts, event, base_cond,
    cond...)`` as dialect SQL (round 8, [U]
    AggregateFunctionSequenceNextNode.h): the event value directly
    after the first/last consecutive view→click chain. Every event
    (matching or not) joins the token string, so adjacency is true
    consecutiveness — the DuckDB replay uses lead() windows over the
    identically-ordered event sequence (arg_min/arg_max through a
    chr(1) sentinel so a last match with NO next event replays as NULL
    instead of silently skipping to an earlier chain — the sf0.01
    fixture exercises that case)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT user_id,
               sequenceNextNode('forward', 'first_match')(
                   ts, event_type, event_type = 'view',
                   event_type = 'view', event_type = 'click')
                 AS nxt_first,
               sequenceNextNode('forward', 'last_match')(
                   ts, event_type, event_type = 'view',
                   event_type = 'view', event_type = 'click')
                 AS nxt_last
        FROM events GROUP BY user_id""")


@register("ch_sql_interval_calendar", oracle="""
SELECT time_bucket(INTERVAL '2 months', ts, TIMESTAMP '1970-01-01') AS m2,
       time_bucket(INTERVAL '14 days', ts, TIMESTAMP '1970-01-05') AS w2,
       count(*) AS n,
       round(sum(value), 4) AS sv
FROM events GROUP BY m2, w2
""")
def ch_sql_interval_calendar(spark, sf):
    """toStartOfInterval with n>1 CALENDAR grains (round 9, [U]
    src/Functions/toStartOfInterval.cpp): 2-month buckets quantize the
    months-since-1970-01 index, 2-week buckets anchor at 1970-01-05
    (the first epoch Monday, upstream's week origin). The DuckDB oracle
    replays both with time_bucket + explicit epoch origins — the
    default time_bucket origin (2000-01-03) would sit one week out of
    phase for even n, which is exactly the anchoring the test pins."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT toStartOfInterval(ts, INTERVAL 2 MONTH) AS m2,
               toStartOfInterval(ts, INTERVAL 2 WEEK) AS w2,
               count() AS n, round(sum(value), 4) AS sv
        FROM events GROUP BY m2, w2""")


@register("ch_sql_interval_origin", oracle="""
SELECT time_bucket(INTERVAL '2 months', ts, TIMESTAMP '2023-01-15') AS m2o,
       time_bucket(INTERVAL '1 year', ts, TIMESTAMP '2020-07-01') AS y1o,
       time_bucket(INTERVAL '14 days', ts, TIMESTAMP '2024-01-08') AS w2o,
       time_bucket(INTERVAL '90 seconds', ts,
                   TIMESTAMP '2024-01-01 00:00:30') AS s90o,
       count(*) AS n
FROM events GROUP BY m2o, y1o, w2o, s90o
""")
def ch_sql_interval_origin(spark, sf):
    """toStartOfInterval with an ORIGIN across unit classes (round 10,
    [U] src/Functions/toStartOfInterval.cpp origin overload): calendar
    months/years re-anchor the months-since-1970 index at the origin's
    month (DuckDB time_bucket semantics — origin's sub-month part
    ignored); week + sub-day units re-anchor by fixed-width arithmetic
    from the origin instant."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT toStartOfInterval(ts, INTERVAL 2 MONTH,
                   toDateTime('2023-01-15 00:00:00')) AS m2o,
               toStartOfInterval(ts, INTERVAL 1 YEAR,
                   toDateTime('2020-07-01 00:00:00')) AS y1o,
               toStartOfInterval(ts, INTERVAL 2 WEEK,
                   toDateTime('2024-01-08 00:00:00')) AS w2o,
               toStartOfInterval(ts, INTERVAL 90 SECOND,
                   toDateTime('2024-01-01 00:00:30')) AS s90o,
               count() AS n
        FROM events GROUP BY m2o, y1o, w2o, s90o""")


@register("seq_match_events", oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type
            FROM events),
c AS (SELECT user_id, min(t) AS t1 FROM ev
      WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT ev.user_id, min(ev.t) AS t2
      FROM ev JOIN c ON ev.user_id = c.user_id AND ev.t >= c.t1
      WHERE ev.event_type = 'purchase' GROUP BY ev.user_id)
SELECT c.user_id, c.t1 AS first_click, p.t2 AS next_purchase
FROM c JOIN p ON c.user_id = p.user_id
ORDER BY c.user_id
""")
def seq_match_events(spark, sf):
    """sequenceMatchEvents ([U] AggregateFunctionSequenceMatch.h Events
    form): the matched (?N) event timestamps of the leftmost match.
    The DuckDB twin derives the same pair independently — earliest
    click, then earliest purchase at-or-after it (lazy leftmost
    matching binds each step to the earliest satisfying event; the
    condition-filtered token string skips non-matching events, so
    at-or-after is >= on the microsecond-cast timestamps, which are
    tie-free in this fixture)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView(
        "sme_events")
    return ch_sql(spark, """
        SELECT user_id,
               m[1] AS first_click, m[2] AS next_purchase
        FROM (SELECT user_id,
                     sequenceMatchEvents('(?1).*(?2)')(
                         ts, event_type = 'click',
                         event_type = 'purchase') AS m
              FROM sme_events GROUP BY user_id)
        WHERE SIZE(m) = 2
        ORDER BY user_id""")
