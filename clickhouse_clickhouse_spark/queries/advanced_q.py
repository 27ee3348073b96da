"""Advanced operator queries: ARRAY JOIN, star modifiers, EMA, interval
sweeps, entropy/mode/statistics, IP/geo functions, session windows
(SURVEY.md §2.2, §2.4, §2.8, §2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.advanced import (
    contingency, cramers_v, ema, entropy, exp_time_decayed_sum,
    haversine_km, interval_length_sum, ipv4_num_to_string,
    ipv4_string_to_num, max_intersections, mode, rank_corr,
    student_t_statistic, welch_t_statistic,
)
from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("array_join_explode", oracle="""
SELECT token, cnt FROM (
  SELECT token, count(*) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, token) AS rn
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
  GROUP BY token) x
WHERE rn <= 20
""")
def array_join_explode(spark, sf):
    """ARRAY JOIN / arrayJoin → explode: token frequency top-20 with a
    deterministic tiebreak (reference ArrayJoinAction §2.2)."""
    d = load_table(spark, sf, "documents")
    counts = (d.select(F.explode(F.split("text", " ")).alias("token"))
              .groupBy("token").agg(F.count("*").alias("cnt")))
    # top-20 via TakeOrderedAndProject (per-partition heaps) — not a
    # global rank window over the whole token vocabulary
    return (counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(20)
            .select("token", "cnt"))


@register("left_array_join", oracle="""
SELECT count(*) AS n_exploded_rows,
       cast(count_if(len(long_toks) = 0) AS BIGINT) AS n_docs_empty
FROM (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) >= 9) AS long_toks
  FROM documents) t,
  LATERAL (SELECT greatest(len(long_toks), 1) AS m) g,
  LATERAL (SELECT unnest(generate_series(1, m)) AS i) u
""")
def left_array_join(spark, sf):
    """LEFT ARRAY JOIN → explode_outer: docs whose filtered array is empty
    still produce one (null) row (reference LEFT ARRAY JOIN semantics).
    Output: exploded row count + empty-array doc count."""
    d = load_table(spark, sf, "documents")
    arr = F.filter(F.split("text", " "), lambda x: F.length(x) >= 9)
    exploded = d.select("doc_id", arr.alias("a")) \
                .select("doc_id", F.size("a").alias("sz"),
                        F.explode_outer("a").alias("tok"))
    return exploded.agg(
        F.count("*").alias("n_exploded_rows"),
        F.count_if(F.col("tok").isNull()).alias("n_docs_empty"))


@register("star_except_replace", oracle="""
SELECT c_custkey, c_nationkey, round(c_acctbal, 0) AS c_acctbal, c_mktsegment
FROM customer WHERE c_custkey <= 50
""")
def star_except_replace(spark, sf):
    """SELECT * EXCEPT (c_name) REPLACE (round(c_acctbal) AS c_acctbal) —
    the reference's star modifiers via df.columns manipulation (§2.2)."""
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") <= 50)
    cols = []
    for name in c.columns:
        if name == "c_name":            # EXCEPT
            continue
        if name == "c_acctbal":         # REPLACE
            cols.append(F.round("c_acctbal", 0).alias("c_acctbal"))
        else:
            cols.append(F.col(name))
    return c.select(*cols)


@register("agg_ema", oracle="""
WITH o AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*)    OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id,
       round(sum(value * pow(0.7, n - rn) *
                 (CASE WHEN rn = 1 THEN 1.0 ELSE 0.3 END)), 6) AS ema
FROM o GROUP BY user_id
""")
def agg_ema(spark, sf):
    """exponentialMovingAverage(α=0.3) per user over time order."""
    ev = load_table(spark, sf, "events")
    return ema(ev, ["user_id"], F.struct("ts", "event_id"), "value", alpha=0.3)


@register("agg_max_intersections", oracle="""
WITH iv AS (SELECT user_id, epoch(ts) AS s, epoch(ts) + 3600 AS e FROM events),
ev AS (
  SELECT user_id, s AS t, 1 AS d FROM iv
  UNION ALL SELECT user_id, e, -1 FROM iv),
r AS (
  SELECT user_id,
         sum(d) OVER (PARTITION BY user_id ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
  FROM ev)
SELECT user_id, cast(max(open) AS BIGINT) AS max_intersections
FROM r GROUP BY user_id
""")
def agg_max_intersections(spark, sf):
    """maxIntersections: peak number of concurrently open 1-hour event
    intervals per user (event-sweep window)."""
    ev = load_table(spark, sf, "events")
    # fractional epoch seconds (cast, not unix_timestamp: that truncates
    # to whole seconds while the oracle's epoch() keeps the microseconds)
    iv = ev.select("user_id",
                   F.col("ts").cast("double").alias("s"),
                   (F.col("ts").cast("double") + 3600).alias("e"))
    out = max_intersections(iv, ["user_id"], "s", "e")
    return out.select("user_id", F.col("max_intersections").cast("long")
                      .alias("max_intersections"))


@register("agg_interval_length_sum", oracle="""
WITH iv AS (SELECT user_id, epoch(ts) AS s, epoch(ts) + 3600.0 AS e FROM events),
r AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM iv)
SELECT user_id,
       round(sum(greatest(0.0, e - greatest(s, coalesce(pme, s)))), 6)
           AS interval_length_sum
FROM r GROUP BY user_id
""")
def agg_interval_length_sum(spark, sf):
    """intervalLengthSum: covered seconds of the union of 1-hour event
    intervals per user (overlaps counted once)."""
    ev = load_table(spark, sf, "events")
    iv = ev.select("user_id",
                   F.col("ts").cast("double").alias("s"),
                   (F.col("ts").cast("double") + 3600).alias("e"))
    return interval_length_sum(iv, ["user_id"], "s", "e")


@register("agg_entropy", oracle="""
WITH c AS (SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY user_id, event_type),
t AS (SELECT user_id, sum(c) AS t FROM c GROUP BY user_id)
SELECT c.user_id,
       round(-sum((c / t) * log2(c / t)), 6) AS entropy
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
""")
def agg_entropy(spark, sf):
    """entropy: Shannon entropy (bits) of each user's event-type mix."""
    ev = load_table(spark, sf, "events")
    return entropy(ev, ["user_id"], "event_type")


@register("agg_mode", oracle="""
SELECT user_id, mode_value, mode_count FROM (
  SELECT user_id, event_type AS mode_value, count(*) AS mode_count,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type) t
WHERE rn = 1
""")
def agg_mode(spark, sf):
    """anyHeavy/mode: each user's most frequent event type (deterministic
    tiebreak)."""
    ev = load_table(spark, sf, "events")
    return mode(ev, ["user_id"], "event_type")


@register("agg_welch_ttest", oracle="""
WITH s AS (
  SELECT event_type, avg(value) AS m, var_samp(value) AS s2, count(*) AS n
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY event_type)
SELECT round((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS t_statistic
FROM (SELECT * FROM s WHERE event_type = 'click') a,
     (SELECT * FROM s WHERE event_type = 'view') b
""")
def agg_welch_ttest(spark, sf):
    """welchTTest (statistic): click vs view event values."""
    ev = load_table(spark, sf, "events")
    return welch_t_statistic(ev, "value", "event_type", "click", "view")


@register("agg_cramers_v", oracle="""
WITH o AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source),
ra AS (SELECT lang, count(*) AS ra FROM documents GROUP BY lang),
rb AS (SELECT source, count(*) AS rb FROM documents GROUP BY source),
n AS (SELECT count(*) AS n, count(DISTINCT lang) AS r,
             count(DISTINCT source) AS c FROM documents)
SELECT round(sqrt(sum(pow(o - ra * rb / n, 2) / (ra * rb / n))
             / (n * least(r - 1, c - 1))), 6) AS cramers_v
FROM o JOIN ra USING (lang) JOIN rb USING (source), n
GROUP BY n, r, c
""")
def agg_cramers_v(spark, sf):
    """cramersV(lang, source): categorical association on documents."""
    d = load_table(spark, sf, "documents")
    return cramers_v(d, "lang", "source")


@register("agg_categorical_iv", oracle="""
WITH base AS (
  SELECT user_id % 4 AS g, event_type AS c,
         CAST(event_id % 2 AS INT) AS t
  FROM events),
tot AS (
  SELECT g, CAST(sum(t) AS DOUBLE) AS yy,
         CAST(count(*) - sum(t) AS DOUBLE) AS nn
  FROM base GROUP BY g),
cat AS (
  SELECT g, c, CAST(sum(t) AS DOUBLE) AS yc,
         CAST(count(*) - sum(t) AS DOUBLE) AS nc
  FROM base GROUP BY g, c),
ivt AS (
  SELECT cat.g,
         round(sum((yc / yy - nc / nn) * ln((yc / yy) / (nc / nn))),
               6) AS iv
  FROM cat JOIN tot ON cat.g = tot.g GROUP BY cat.g)
SELECT g, to_json(list_transform([iv], x -> printf('%.6f', x + 0.0)))
         AS iv
FROM ivt
""")
def agg_categorical_iv(spark, sf):
    """categoricalInformationValue(event_type, tag) per user cohort
    ([U] AggregateFunctionCategoricalInformationValue.h — round-14
    conversion from a refusal): Information Value of the binary tag
    over event-type categories, computed as per-row window
    contributions (constant per-group state). The DuckDB oracle
    replays the IV sum through independent GROUP BY CTEs. Array
    output emitted as a %.6f-JSON string (shapes.py driver-gate
    note)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.shapes import json_double_arrays

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    out = ch_sql(spark, """
        SELECT user_id % 4 AS g,
               arrayMap(__x -> round(__x, 6),
                        categoricalInformationValue(
                            event_type, event_id % 2)) AS iv
        FROM events GROUP BY g""")
    return json_double_arrays(out, "iv")


@register("ip_funcs", oracle="""
WITH x AS (SELECT event_id, (event_id * 2654435761) % 4294967296 AS ip_num
           FROM events WHERE event_id <= 50)
SELECT event_id, ip_num,
       cast((ip_num // 16777216) % 256 AS VARCHAR) || '.' ||
       cast((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
       cast((ip_num // 256) % 256 AS VARCHAR) || '.' ||
       cast(ip_num % 256 AS VARCHAR) AS ip_str,
       ((ip_num // 16777216) % 256) * 16777216 + ((ip_num // 65536) % 256) * 65536
         + ((ip_num // 256) % 256) * 256 + ip_num % 256 AS roundtrip
FROM x
""")
def ip_funcs(spark, sf):
    """IPv4NumToString / IPv4StringToNum (§2.8 IP family) — integer
    arithmetic, round-trips exactly."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") <= 50)
    x = ev.select("event_id",
                  F.pmod(F.col("event_id") * 2654435761, F.lit(4294967296))
                  .alias("ip_num"))
    x = x.withColumn("ip_str", ipv4_num_to_string(F.col("ip_num")))
    return x.withColumn("roundtrip", ipv4_string_to_num(F.col("ip_str")))


@register("geo_funcs", oracle="""
WITH pts AS (
  SELECT n_nationkey, n_nationkey * 3.0 - 30.0 AS lat,
         n_regionkey * 50.0 - 100.0 AS lon
  FROM nation)
SELECT n_nationkey,
       round(2 * 6371.0 * asin(sqrt(
         pow(sin(radians(48.85 - lat) / 2), 2) +
         cos(radians(lat)) * cos(radians(48.85)) *
         pow(sin(radians(2.35 - lon) / 2), 2))), 4) AS dist_to_paris_km
FROM pts
""")
def geo_funcs(spark, sf):
    """greatCircleDistance (haversine, km) from synthetic nation
    coordinates to a fixed point (§2.8 geo family)."""
    n = load_table(spark, sf, "nation")
    lat = F.col("n_nationkey") * 3.0 - 30.0
    lon = F.col("n_regionkey") * 50.0 - 100.0
    return n.select(
        "n_nationkey",
        F.round(haversine_km(lat, lon, F.lit(48.85), F.lit(2.35)), 4)
        .alias("dist_to_paris_km"))


@register("array_transforms", oracle="""
WITH a AS (
  SELECT vec_id,
         list_transform(embedding[1:8],
                        x -> cast(round(cast(x AS DOUBLE) * 1000, 0) AS INT)) AS v
  FROM embeddings WHERE vec_id <= 30)
SELECT vec_id,
       array_to_string([0] || list_transform(generate_series(2, len(v)),
                                             i -> v[i] - v[i - 1]), ',') AS diffs,
       array_to_string(list_transform(generate_series(1, len(v)),
                                      i -> cast(list_aggregate(v[1:i], 'sum') AS INT)), ',')
           AS cumsum
FROM a
""")
def array_transforms(spark, sf):
    """arrayDifference / arrayCumSum over int-quantized embedding prefixes
    (§2.8 arrays) — emitted as joined int strings (engine-stable)."""
    e = load_table(spark, sf, "embeddings").filter(F.col("vec_id") <= 30)
    v = F.transform(F.slice("embedding", 1, 8),
                    lambda x: F.round(x.cast("double") * 1000, 0).cast("int"))
    a = e.select("vec_id", v.alias("v"))
    diffs = F.concat(
        F.array(F.lit(0)),
        F.zip_with(F.slice("v", 2, 7), F.slice("v", 1, 7), lambda x, y: x - y))
    cumsum = F.transform(
        F.sequence(F.lit(1), F.size("v")),
        lambda i: F.aggregate(F.slice("v", 1, i), F.lit(0), lambda acc, x: acc + x))
    return a.select("vec_id",
                    F.array_join(diffs.cast("array<string>"), ",").alias("diffs"),
                    F.array_join(cumsum.cast("array<string>"), ",").alias("cumsum"))


@register("tuple_null_funcs", oracle="""
SELECT n_nationkey,
       {'name': n_name, 'region': n_regionkey}.name   AS t_name,
       {'name': n_name, 'region': n_regionkey}.region AS t_region,
       cnt IS NULL                                     AS no_customers,
       coalesce(cnt, 0)                                AS cnt_or_zero
FROM nation LEFT JOIN (SELECT c_nationkey, count(*) AS cnt
                       FROM customer GROUP BY c_nationkey) c
  ON n_nationkey = c_nationkey
""")
def tuple_null_funcs(spark, sf):
    """tuple()/tupleElement + NULL family (isNull/ifNull/assumeNotNull)
    over a left join that actually produces NULLs (§2.8)."""
    n = load_table(spark, sf, "nation")
    c = (load_table(spark, sf, "customer").groupBy("c_nationkey")
         .agg(F.count("*").alias("cnt")))
    j = n.join(c, n.n_nationkey == c.c_nationkey, "left")
    tup = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    return j.select(
        "n_nationkey",
        tup.getField("name").alias("t_name"),
        tup.getField("region").alias("t_region"),
        F.col("cnt").isNull().alias("no_customers"),
        F.coalesce("cnt", F.lit(0)).alias("cnt_or_zero"))


@register("session_window_agg", oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g)
SELECT user_id, min(ts) AS w_start, max(ts) + INTERVAL 30 MINUTE AS w_end,
       count(*) AS n
FROM s GROUP BY user_id, sid
""")
def session_window_agg(spark, sf):
    """session_window(ts, 30 min) batch aggregation — Spark-native session
    windows (CH lacks them; §2.9 'free win'); oracle reconstructs sessions
    via the gap-and-cumsum idiom."""
    ev = load_table(spark, sf, "events")
    g = (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
         .agg(F.count("*").alias("n")))
    return g.select("user_id",
                    F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"), "n")


@register("agg_rank_corr", oracle="""
SELECT l_returnflag, round(corr(rx, ry), 6) AS rank_corr
FROM (
  SELECT l_returnflag,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
           AS rx,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1)
             / 2.0 AS ry
  FROM lineitem) t
GROUP BY l_returnflag
""")
def agg_rank_corr(spark, sf):
    """rankCorr(l_quantity, l_extendedprice) per return flag (reference
    AggregateFunctionRankCorrelation.h): Spearman via midranks + Pearson
    corr — two window sorts, one agg, JVM-side throughout."""
    li = load_table(spark, sf, "lineitem")
    return rank_corr(li, ["l_returnflag"], "l_quantity", "l_extendedprice")


@register("agg_student_ttest", oracle="""
WITH s AS (
  SELECT event_type AS g, avg(value) AS m, var_samp(value) AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1)
SELECT round((a.m - b.m)
             / sqrt((((a.n - 1) * a.s2 + (b.n - 1) * b.s2) / (a.n + b.n - 2))
                    * (1.0 / a.n + 1.0 / b.n)), 6) AS t_statistic
FROM s a, s b WHERE a.g = 'click' AND b.g = 'purchase'
""")
def agg_student_ttest(spark, sf):
    """studentTTest (pooled variance) of event value, click vs purchase
    (reference AggregateFunctionTTest.h, studentTTest variant)."""
    ev = load_table(spark, sf, "events")
    return student_t_statistic(ev, "value", "event_type", "click", "purchase")


@register("agg_contingency", oracle="""
WITH obs AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                    CAST(count(*) AS DOUBLE) AS o FROM orders GROUP BY 1, 2),
ma AS (SELECT o_orderstatus AS a, CAST(count(*) AS DOUBLE) AS ca
       FROM orders GROUP BY 1),
mb AS (SELECT o_orderpriority AS b, CAST(count(*) AS DOUBLE) AS cb
       FROM orders GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM orders),
x AS (SELECT sum(pow(o - ca * cb / n, 2) / (ca * cb / n)) AS chi2, max(n) AS n
      FROM obs JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn)
SELECT round(sqrt(chi2 / (chi2 + n)), 6) AS contingency FROM x
""")
def agg_contingency(spark, sf):
    """contingency(o_orderstatus, o_orderpriority) — contingency
    coefficient sqrt(chi2/(chi2+n)) (reference ``contingency`` in
    AggregateFunctionsStatisticsSimple family)."""
    o = load_table(spark, sf, "orders")
    return contingency(o, "o_orderstatus", "o_orderpriority")


@register("window_time_decayed_sum", oracle="""
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(date_trunc('microseconds', ts)) / 1000000.0 AS sec, value
  FROM events WHERE user_id < 10),
d AS (
  SELECT user_id, event_id, value,
         sec - min(sec) OVER (PARTITION BY user_id) AS dt
  FROM e),
r AS (
  SELECT user_id, event_id, dt,
         sum(value * exp(dt / 86400.0))
           OVER (PARTITION BY user_id ORDER BY dt, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM d)
SELECT user_id, event_id, round(run * exp(-dt / 86400.0), 6) AS decayed_sum
FROM r
""")
def window_time_decayed_sum(spark, sf):
    """exponentialTimeDecayedSum(τ = 1 day) per user over event time
    (reference window function ExponentialTimeDecayedSum): O(n·log n)
    running-sum formulation instead of the naive O(n²) pairwise decay."""
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 10)
    out = exp_time_decayed_sum(ev, ["user_id"], "ts", "value", 86400.0,
                               tiebreak="event_id")
    return out.select("user_id", "event_id",
                      F.round("decayed_sum", 6).alias("decayed_sum"))


from clickhouse_clickhouse_spark.functions.geo import (  # noqa: E402
    geohash_decode, geohash_encode, geohash_oracle_expr,
    point_in_polygon, point_in_polygon_oracle_expr,
)

# L-shaped (non-convex) test polygon shared by the Spark expression and
# the generated oracle; grid points chosen off the edges.
_PIP_POLY = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
             (4.0, 10.0), (0.0, 10.0)]

_GH_LON = "CAST((p_partkey % 360) - 180 + 0.5 AS DOUBLE)"
_GH_LAT = "CAST(((p_partkey * 7) % 180) - 90 + 0.25 AS DOUBLE)"
_GH_SCALE = 1 << 15


@register("geo_point_in_polygon", oracle=f"""
SELECT p_partkey,
       {point_in_polygon_oracle_expr('px', 'py', _PIP_POLY)} AS inside
FROM (SELECT p_partkey,
             (p_partkey % 37) * CAST(0.31 AS DOUBLE) AS px,
             ((p_partkey * 13) % 41) * CAST(0.27 AS DOUBLE) AS py
      FROM part) t
""")
def geo_point_in_polygon(spark, sf):
    """pointInPolygon over a non-convex polygon (reference
    src/Functions/pointInPolygon.cpp): even-odd ray casting unrolled to
    constant-folded codegen arithmetic — no UDF, no shuffle."""
    p = load_table(spark, sf, "part")
    px = (F.col("p_partkey") % 37) * 0.31
    py = ((F.col("p_partkey") * 13) % 41) * 0.27
    return p.select(
        "p_partkey",
        point_in_polygon(px, py, _PIP_POLY).alias("inside"))


@register("geo_geohash_roundtrip", oracle=f"""
WITH pts AS (
  SELECT p_partkey, {_GH_LON} AS lon, {_GH_LAT} AS lat FROM part),
q AS (
  SELECT p_partkey, lon, lat,
         least(CAST(floor((lon + 180.0) / 360.0 * {_GH_SCALE}) AS BIGINT),
               {_GH_SCALE - 1}) AS lon_q,
         least(CAST(floor((lat + 90.0) / 180.0 * {_GH_SCALE}) AS BIGINT),
               {_GH_SCALE - 1}) AS lat_q
  FROM pts)
SELECT p_partkey,
       {geohash_oracle_expr('lon', 'lat')} AS gh,
       round((lon_q + 0.5) / {_GH_SCALE} * 360.0 - 180.0, 6) AS dec_lon,
       round((lat_q + 0.5) / {_GH_SCALE} * 180.0 - 90.0, 6) AS dec_lat
FROM q
""")
def geo_geohash_roundtrip(spark, sf):
    """geohashEncode + geohashDecode round-trip (reference
    src/Functions/geohash.cpp): morton bit-interleave + base32, fully
    unrolled constant expressions; decode reads back the cell center
    from the encoded string."""
    p = load_table(spark, sf, "part")
    lon = (F.col("p_partkey") % 360) - 180 + 0.5
    lat = ((F.col("p_partkey") * 7) % 180) - 90 + 0.25
    gh = geohash_encode(lon, lat, 6)
    d = p.select("p_partkey", gh.alias("gh"))
    dec = geohash_decode(F.col("gh"), 6)
    return d.select(
        "p_partkey", "gh",
        F.round(dec["lon"], 6).alias("dec_lon"),
        F.round(dec["lat"], 6).alias("dec_lat"))


from clickhouse_clickhouse_spark.functions.geo import (  # noqa: E402
    hex_bin, hex_bin_oracle_exprs, lat_lng_to_tile, quadkey_oracle_expr,
    tile_center, tile_oracle_exprs, tile_quadkey,
)

_TILE_LAT = "((p_partkey * 37) % 1600) / 10.0 - 80.0 + 0.0137"
_TILE_LON = "((p_partkey * 91) % 3600) / 10.0 - 180.0 + 0.0071"
_TX, _TY = tile_oracle_exprs(_TILE_LAT, _TILE_LON, 7)
_HQ, _HR = hex_bin_oracle_exprs(_TILE_LAT, _TILE_LON, 250_000.0)


@register("geo_tile_quadkey", oracle=f"""
WITH t AS (SELECT p_partkey, {_TX} AS tx, {_TY} AS ty FROM part)
SELECT p_partkey, tx, ty,
       {quadkey_oracle_expr('tx', 'ty', 7)} AS qk,
       round((tx + 0.5) / 128 * 360.0 - 180.0, 6) AS c_lon,
       round(degrees(atan((exp(3.141592653589793 * (1.0 - 2.0 * (ty + 0.5)
                     / 128)) - exp(-(3.141592653589793 * (1.0 - 2.0
                     * (ty + 0.5) / 128)))) / 2.0)), 6) AS c_lat
FROM t
""")
def geo_tile_quadkey(spark, sf):
    """Hierarchical cell indexing, the s2/h3-class capability (upstream
    [U] src/Functions/s2*.cpp, h3*.cpp — see functions/geo.py for the
    public-scheme mapping): slippy tile at z=7, its Bing quadkey (prefix
    = ancestor), and the cell-center inverse. All constant-folded
    arithmetic — no UDF."""
    p = load_table(spark, sf, "part")
    lat = ((F.col("p_partkey") * 37) % 1600) / 10.0 - 80.0 + 0.0137
    lon = ((F.col("p_partkey") * 91) % 3600) / 10.0 - 180.0 + 0.0071
    d = p.select("p_partkey", lat_lng_to_tile(lat, lon, 7).alias("t"))
    d = d.select("p_partkey", F.col("t.tx").alias("tx"),
                 F.col("t.ty").alias("ty"))
    c = tile_center(F.col("tx"), F.col("ty"), 7)
    return d.select(
        "p_partkey", "tx", "ty",
        tile_quadkey(F.col("tx"), F.col("ty"), 7).alias("qk"),
        F.round(c["lon"], 6).alias("c_lon"),
        F.round(c["lat"], 6).alias("c_lat"))


@register("geo_hex_bin_counts", oracle=f"""
SELECT hq, hr, count(*) AS n_points
FROM (SELECT {_HQ} AS hq, {_HR} AS hr FROM part) t
GROUP BY hq, hr
""")
def geo_hex_bin_counts(spark, sf):
    """Hex binning at scale (the h3 use-case): points bucketed into
    250 km axial hex cells on the Web-Mercator plane (cube rounding),
    then a plain hash aggregation per cell — one shuffle keyed by the
    cell id, the same plan shape an h3ToParent rollup would have."""
    p = load_table(spark, sf, "part")
    lat = ((F.col("p_partkey") * 37) % 1600) / 10.0 - 80.0 + 0.0137
    lon = ((F.col("p_partkey") * 91) % 3600) / 10.0 - 180.0 + 0.0071
    return (p.select(hex_bin(lat, lon, 250_000.0).alias("h"))
            .groupBy(F.col("h.hq").alias("hq"), F.col("h.hr").alias("hr"))
            .agg(F.count("*").alias("n_points")))


@register("window_time_decayed_avg", oracle="""
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(date_trunc('microseconds', ts)) / 1000000.0 AS sec, value
  FROM events WHERE user_id < 10),
d AS (
  SELECT user_id, event_id, value,
         sec - min(sec) OVER (PARTITION BY user_id) AS dt
  FROM e),
r AS (
  SELECT user_id, event_id, dt,
         sum(value * exp(dt / 86400.0))
           OVER (PARTITION BY user_id ORDER BY dt, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         sum(exp(dt / 86400.0))
           OVER (PARTITION BY user_id ORDER BY dt, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM d)
SELECT user_id, event_id, round(s / c, 6) AS decayed_avg
FROM r
""")
def window_time_decayed_avg(spark, sf):
    """exponentialTimeDecayedAvg (decayed sum / decayed count, both via
    the piecewise-renormalized epoch machinery that stays finite past
    709*tau — operators/advanced.exp_time_decayed_avg; the anchored
    ratio cancels the common exp(-dt/tau) factor, which the oracle
    exploits directly)."""
    from clickhouse_clickhouse_spark.operators.advanced import (
        exp_time_decayed_avg,
    )

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 10)
    out = exp_time_decayed_avg(ev, ["user_id"], "ts", "value", 86400.0,
                               tiebreak="event_id")
    return out.select("user_id", "event_id",
                      F.round("decayed_avg", 6).alias("decayed_avg"))


@register("geo_hex_smooth", oracle=f"""
WITH cells AS (
  SELECT hq, hr, count(*) AS n
  FROM (SELECT {_HQ} AS hq, {_HR} AS hr FROM part) t GROUP BY hq, hr),
ring AS (
  SELECT c.hq, c.hr, d.dq, d.dr
  FROM cells c, (VALUES (0,0),(1,0),(1,-1),(0,-1),(-1,0),(-1,1),(0,1))
       AS d(dq, dr))
SELECT r.hq, r.hr,
       any_value(c0.n) AS n_self,
       cast(sum(coalesce(cn.n, 0)) AS BIGINT) AS n_ring
FROM ring r
JOIN cells c0 ON c0.hq = r.hq AND c0.hr = r.hr
LEFT JOIN cells cn ON cn.hq = r.hq + r.dq AND cn.hr = r.hr + r.dr
GROUP BY r.hq, r.hr
""")
def geo_hex_smooth(spark, sf):
    """kRing-1 spatial smoothing — the distributed use of hex
    neighborhoods: per-cell counts, each cell exploded to its 7-cell
    disc (hex_kring), re-joined on the cell id and summed. One hash agg
    + one self-equi-join on (hq, hr) — the plan shape of any h3-based
    density/rollup query; the ring expansion is a constant 7x explode,
    not a shuffle multiplier."""
    from clickhouse_clickhouse_spark.functions.geo import hex_bin, hex_kring

    p = load_table(spark, sf, "part")
    lat = ((F.col("p_partkey") * 37) % 1600) / 10.0 - 80.0 + 0.0137
    lon = ((F.col("p_partkey") * 91) % 3600) / 10.0 - 180.0 + 0.0071
    cells = (p.select(hex_bin(lat, lon, 250_000.0).alias("h"))
             .groupBy(F.col("h.hq").alias("hq"), F.col("h.hr").alias("hr"))
             .agg(F.count("*").alias("n")))
    ring = (cells.select("hq", "hr", F.col("n").alias("n_self"),
                         F.explode(hex_kring(F.col("hq"), F.col("hr"), 1))
                          .alias("nb")))
    nb = cells.select(F.col("hq").alias("nq"), F.col("hr").alias("nr"),
                      F.col("n").alias("nn"))
    return (ring.join(nb, (F.col("nb.hq") == F.col("nq"))
                      & (F.col("nb.hr") == F.col("nr")), "left")
            .groupBy("hq", "hr")
            .agg(F.any_value("n_self").alias("n_self"),
                 F.sum(F.coalesce(F.col("nn"), F.lit(0))).alias("n_ring")))


@register("agg_mean_z_test", oracle="""
WITH s AS (
  SELECT event_type, avg(value) AS m, count(*) AS n
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY event_type),
j AS (
  SELECT a.m AS ma, a.n AS na, b.m AS mb, b.n AS nb
  FROM (SELECT * FROM s WHERE event_type = 'click') a
  CROSS JOIN (SELECT * FROM s WHERE event_type = 'view') b),
zc AS (
  SELECT ma, mb, sqrt(2.0 / na + 2.0 / nb) AS se,
         (ma - mb) / sqrt(2.0 / na + 2.0 / nb) AS z
  FROM j),
pv AS (
  SELECT z, se, ma, mb,
         1 / (1 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zc)
SELECT round(z, 6) AS z_stat,
       round(1 - (1 - (0.254829592 * t - 0.284496736 * power(t, 2)
                       + 1.421413741 * power(t, 3)
                       - 1.453152027 * power(t, 4)
                       + 1.061405429 * power(t, 5))
                      * exp(-(abs(z) / sqrt(2.0))
                            * (abs(z) / sqrt(2.0)))), 6) AS p_value,
       round((ma - mb) - 1.959963984540054 * se, 6) AS ci_low,
       round((ma - mb) + 1.959963984540054 * se, 6) AS ci_high
FROM pv
""")
def agg_mean_z_test(spark, sf):
    """meanZTest with known population variances (=2.0 for the uniform-ish
    fixture values; reference AggregateFunctionMeanZTest.h): z statistic,
    two-sided p via the erf-based normal CDF (ch_functions.erf — the
    Abramowitz–Stegun 7.1.26 polynomial, replayed identically in the
    oracle), and the 95% CI on the mean difference."""
    from clickhouse_clickhouse_spark.operators.advanced import mean_z_test

    ev = load_table(spark, sf, "events")
    return mean_z_test(ev, "value", "event_type", "click", "view",
                       2.0, 2.0, confidence=0.95)


@register("proportions_z_test_q", oracle="""
WITH c AS (
  SELECT
    CAST(sum(CASE WHEN event_type = 'purchase' AND value > 50
             THEN 1 ELSE 0 END) AS DOUBLE) AS s1,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS DOUBLE) AS t1,
    CAST(sum(CASE WHEN event_type = 'click' AND value > 50
             THEN 1 ELSE 0 END) AS DOUBLE) AS s2,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS DOUBLE) AS t2
  FROM events),
z AS (
  SELECT s1 / t1 AS p1, s2 / t2 AS p2,
         (s1 + s2) / (t1 + t2) AS pp, t1, t2 FROM c),
zz AS (
  SELECT (p1 - p2) / sqrt(pp * (1 - pp) * (1 / t1 + 1 / t2)) AS z,
         sqrt(p1 * (1 - p1) / t1 + p2 * (1 - p2) / t2) AS sed,
         p1 - p2 AS d
  FROM z),
pv AS (
  SELECT z, sed, d,
         1 / (1 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zz)
SELECT round(z, 6) AS z_stat,
       round(1 - (1 - (0.254829592 * t - 0.284496736 * power(t, 2)
                       + 1.421413741 * power(t, 3)
                       - 1.453152027 * power(t, 4)
                       + 1.061405429 * power(t, 5))
                      * exp(-(abs(z) / sqrt(2.0))
                            * (abs(z) / sqrt(2.0)))), 6) AS p_value,
       round(d - 1.959963984540054 * sed, 6) AS ci_low,
       round(d + 1.959963984540054 * sed, 6) AS ci_high
FROM pv
""")
def proportions_z_test_q(spark, sf):
    """proportionsZTest (reference src/Functions/proportionsZTest.cpp):
    pooled two-proportion z, two-sided erf-based p, unpooled-SE CI —
    conversion-rate (value>50) comparison purchase vs click."""
    from clickhouse_clickhouse_spark import ch_functions as ch

    ev = load_table(spark, sf, "events")
    counts = ev.agg(
        F.sum(F.when((F.col("event_type") == "purchase")
                     & (F.col("value") > 50), 1).otherwise(0))
         .cast("double").alias("s1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
         .cast("double").alias("t1"),
        F.sum(F.when((F.col("event_type") == "click")
                     & (F.col("value") > 50), 1).otherwise(0))
         .cast("double").alias("s2"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
         .cast("double").alias("t2"))
    st = counts.select(
        ch.proportionsZTest("s1", "t1", "s2", "t2", 0.95).alias("r"))
    return st.select(F.round(F.col("r.z_stat"), 6).alias("z_stat"),
                     F.round(F.col("r.p_value"), 6).alias("p_value"),
                     F.round(F.col("r.ci_low"), 6).alias("ci_low"),
                     F.round(F.col("r.ci_high"), 6).alias("ci_high"))


@register("ch_sql_stochastic_linreg", oracle="""
WITH d AS (
  SELECT CAST(event_id % 100 AS DOUBLE) AS x,
         CAST(user_id % 7 AS DOUBLE) AS x2,
         CAST(value AS DOUBLE) AS y
  FROM events WHERE event_id < 5000)
SELECT round(regr_slope(y, x), 6) AS w1,
       round(regr_intercept(y, x), 6) AS b1,
       CAST(1 AS BIGINT) AS grad_zero_2f
FROM d
""")
def ch_sql_stochastic_linreg(spark, sf):
    """Round 13 (former survey out-of-scope row):
    stochasticLinearRegression as the closed-form ridge minimizer
    (functions/ml.py — deterministic where upstream's SGD is
    row-order-dependent). Oracle: the 1-feature λ=0 coefficients equal
    DuckDB's native regr_slope/regr_intercept exactly; the 2-feature
    fit is verified by the optimality condition itself (gradient of
    the objective at the solution == 0: residuals orthogonal to every
    regressor and to the intercept), evaluated in-plan with
    evalMLMethod."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("slr_events")
    return ch_sql(spark, """
        WITH d AS (
          SELECT CAST(event_id % 100 AS Float64) AS x,
                 CAST(user_id % 7 AS Float64) AS x2,
                 CAST(value AS Float64) AS y
          FROM slr_events WHERE event_id < 5000),
        m1 AS (SELECT stochasticLinearRegression(y, x) AS c FROM d),
        m2 AS (SELECT stochasticLinearRegression(0.1, 0.0, 5, 'SGD')
                          (y, x, x2) AS c FROM d),
        chk AS (
          SELECT round(abs(sum((y - evalMLMethod((SELECT c FROM m2),
                                                 x, x2)) * x)), 4) AS gx,
                 round(abs(sum((y - evalMLMethod((SELECT c FROM m2),
                                                 x, x2)) * x2)), 4) AS gx2,
                 round(abs(sum(y - evalMLMethod((SELECT c FROM m2),
                                                x, x2))), 4) AS gb
          FROM d)
        SELECT round((SELECT c FROM m1)[1], 6) AS w1,
               round((SELECT c FROM m1)[2], 6) AS b1,
               CAST(gx < 0.01 AND gx2 < 0.01 AND gb < 0.01 AS BIGINT)
                   AS grad_zero_2f
        FROM chk""")


@register("logistic_irls_gate", oracle="""
SELECT CAST(1 AS BIGINT) AS grad_zero,
       CAST(1 AS BIGINT) AS separates
""")
def logistic_irls_gate(spark, sf):
    """stochasticLogisticRegression analog: deterministic IRLS
    (operators/advanced.logistic_regression_irls — one distributed
    moment aggregation per Newton step, driver solves the tiny
    system). Oracle pins the optimality condition (score equations at
    the fitted coefficients ~ 0) and that the fitted model actually
    separates the planted signal (higher mean predictor on the
    positive class)."""
    from clickhouse_clickhouse_spark.operators.advanced import (
        logistic_regression_irls,
    )

    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 5000)
    d = ev.select(
        (F.col("value") / 50.0 - 1.0).alias("x"),
        # planted deterministic label correlated with x
        (F.xxhash64(F.col("event_id")) % 100 <
         30 + F.least(F.greatest((F.col("value") / 50.0 - 1.0) * 20,
                                 F.lit(-30)), F.lit(30)))
        .cast("double").alias("y"))
    w = logistic_regression_irls(d, "y", ["x"], iterations=8)
    mu = 1.0 / (1.0 + F.exp(-(F.lit(w[0]) * F.col("x") + F.lit(w[1]))))
    chk = d.agg(
        F.abs(F.sum((F.col("y") - mu) * F.col("x"))).alias("gx"),
        F.abs(F.sum(F.col("y") - mu)).alias("gb"),
        F.avg(F.when(F.col("y") == 1.0, mu)).alias("mu_pos"),
        F.avg(F.when(F.col("y") == 0.0, mu)).alias("mu_neg"))
    return chk.select(
        ((F.col("gx") < 1e-4) & (F.col("gb") < 1e-4))
        .cast("long").alias("grad_zero"),
        (F.col("mu_pos") > F.col("mu_neg")).cast("long")
        .alias("separates"))
