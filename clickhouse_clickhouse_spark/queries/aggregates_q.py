"""M2 — aggregation function surface (SURVEY.md §2.4).

DuckDB sums of integers return HUGEINT — every integer sum in an oracle is
CAST to BIGINT so schemas line up with Spark's LongType.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.aggregates import (
    group_array_moving,
    delta_sum, histogram, limit_by, sum_map, top_k_per_group, with_totals,
)
from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("agg_argminmax", oracle="""
SELECT c_nationkey,
       arg_max(c_name, c_acctbal) AS richest,
       arg_min(c_name, c_acctbal) AS poorest,
       round(max(c_acctbal), 4) AS max_bal,
       round(min(c_acctbal), 4) AS min_bal
FROM customer GROUP BY c_nationkey
""")
def agg_argminmax(spark, sf):
    """argMin/argMax → min_by/max_by (§2.4 table)."""
    c = load_table(spark, sf, "customer")
    return (c.groupBy("c_nationkey")
            .agg(F.max_by("c_name", "c_acctbal").alias("richest"),
                 F.min_by("c_name", "c_acctbal").alias("poorest"),
                 F.round(F.max("c_acctbal"), 4).alias("max_bal"),
                 F.round(F.min("c_acctbal"), 4).alias("min_bal")))


@register("agg_uniq_exact", oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS uniq_orders,
       count(DISTINCT l_partkey)  AS uniq_parts
FROM lineitem GROUP BY l_returnflag
""")
def agg_uniq_exact(spark, sf):
    """uniqExact → countDistinct (exact dedup-count, shuffle on
    group+value with partial dedup)."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("uniq_orders"),
                 F.countDistinct("l_partkey").alias("uniq_parts")))


@register("agg_uniq_approx", oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
""")
def agg_uniq_approx(spark, sf):
    """uniq/uniqHLL12 → approx_count_distinct (HLL++). The estimate itself
    cannot hash-match any oracle, so the hash-checked surface is the
    ACCURACY INVARIANT the sketch contract promises: relative error vs the
    exact distinct count within 0.20 (default rsd 0.05; measured max
    0.086 across sf0.001/0.01/0.1 — 2.3× margin). The raw estimate stays
    visible in the rows-only twin agg_uniq_approx_estimate."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("exact_orders"),
                 F.approx_count_distinct("l_orderkey").alias("__ap"))
            .select("l_returnflag", "exact_orders",
                    (F.abs(F.col("__ap") - F.col("exact_orders"))
                     / F.col("exact_orders") <= 0.20).alias("approx_ok")))


@register("agg_quantiles", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6)  AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6)  AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
FROM lineitem GROUP BY l_returnflag
""")
def agg_quantiles(spark, sf):
    """quantileExact/median → percentile (exact, linear interpolation —
    same definition as DuckDB quantile_cont)."""
    li = load_table(spark, sf, "lineitem")
    # round 14: the two l_quantity percentiles share one buffer via the
    # array form (bit-identical; separate aggregates each built their
    # own per-group sorted state)
    return (li.groupBy("l_returnflag")
            .agg(F.percentile("l_quantity",
                              F.array(F.lit(0.5), F.lit(0.9))).alias("__q"),
                 F.round(F.percentile("l_extendedprice", F.lit(0.25)),
                         6).alias("p25_price"))
            .select("l_returnflag",
                    F.round(F.element_at("__q", 1), 6).alias("median_qty"),
                    F.round(F.element_at("__q", 2), 6).alias("p90_qty"),
                    "p25_price"))


@register("agg_group_array", oracle="""
SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
""")
def agg_group_array(spark, sf):
    """groupUniqArray → collect_set, emitted as a sorted joined string so
    the comparison is order-proof."""
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    return (r.join(n, r.r_regionkey == n.n_regionkey)
            .groupBy("r_name")
            .agg(F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")))


@register("agg_count_if", oracle="""
SELECT cast(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2)
           AS returned_value,
       round(avg(CASE WHEN l_quantity > 25 THEN l_extendedprice END), 6)
           AS avg_price_bulk
FROM lineitem
""")
def agg_count_if(spark, sf):
    """-If combinator family: countIf/sumIf/avgIf → count_if / sum(when) /
    avg(when) (§2.4)."""
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
                      .otherwise(0)), 2).alias("returned_value"),
        F.round(F.avg(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 6)
        .alias("avg_price_bulk"))


@register("agg_stats", oracle="""
SELECT round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
       round(stddev_samp(l_extendedprice), 4)            AS std_price,
       round(var_pop(l_quantity), 6)                     AS var_qty
FROM lineitem
""")
def agg_stats(spark, sf):
    """Statistical aggregates: corr/covar/stddev/var (§2.4)."""
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_pop("l_quantity"), 6).alias("var_qty"))


@register("agg_skew_kurt", oracle="""
WITH s AS (SELECT avg(l_quantity) AS mu, stddev_pop(l_quantity) AS sig,
                  count(*) AS n FROM lineitem)
SELECT round(avg(pow(l_quantity - mu, 3)) / pow(sig, 3), 6) AS skew_qty,
       round(avg(pow(l_quantity - mu, 4)) / pow(sig, 4) - 3, 6) AS kurt_qty
FROM lineitem, s
GROUP BY mu, sig
""")
def agg_skew_kurt(spark, sf):
    """skewPop/kurtPop → skewness/kurtosis. Spark's definitions are the
    population moments (m3/σ³, m4/σ⁴−3); the oracle spells the same
    formula out (DuckDB's named functions use the sample-corrected
    variant — SURVEY.md §2.4 note)."""
    li = load_table(spark, sf, "lineitem")
    return li.agg(F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
                  F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"))


@register("agg_weighted_avg", oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS w_avg_price
FROM lineitem GROUP BY l_returnflag
""")
def agg_weighted_avg(spark, sf):
    """avgWeighted → sum(x*w)/sum(w)."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                         / F.sum("l_quantity"), 6).alias("w_avg_price")))


@register("agg_uniq_up_to", oracle="""
SELECT o_orderstatus, least(count(DISTINCT o_custkey), 51) AS uniq_upto_50
FROM orders GROUP BY o_orderstatus
""")
def agg_uniq_up_to(spark, sf):
    """uniqUpTo(N): exact distinct count clamped at N+1."""
    o = load_table(spark, sf, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.least(F.countDistinct("o_custkey"), F.lit(51)).alias("uniq_upto_50")))


@register("agg_rollup", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def agg_rollup(spark, sf):
    """WITH ROLLUP (reference RollupStep)."""
    li = load_table(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count("*").alias("n")))


@register("agg_cube", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def agg_cube(spark, sf):
    """WITH CUBE (reference CubeStep)."""
    li = load_table(spark, sf, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


@register("agg_grouping_sets", oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       cast(grouping(l_returnflag) AS INT) AS g_flag,
       cast(grouping(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""")
def agg_grouping_sets(spark, sf):
    """GROUPING SETS + grouping() marker (reference grouping()/
    AggregatingStep grouping-sets support)."""
    li = load_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               cast(grouping(l_returnflag) AS INT) AS g_flag,
               cast(grouping(l_linestatus) AS INT) AS g_status
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register("agg_with_totals", oracle="""
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), ())
""")
def agg_with_totals(spark, sf):
    """GROUP BY ... WITH TOTALS via the with_totals helper (grouped rows +
    grand-total row, one pass)."""
    li = load_table(spark, sf, "lineitem")
    return with_totals(li, ["l_returnflag", "l_linestatus"],
                       {"sum_qty": F.round(F.sum("l_quantity"), 2),
                        "n": F.count("*")})


@register("agg_limit_by", oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t WHERE rn <= 2
""")
def agg_limit_by(spark, sf):
    """LIMIT 2 BY custkey (reference LimitByTransform) via limit_by helper."""
    o = load_table(spark, sf, "orders")
    return limit_by(o.select("o_custkey", "o_orderkey", "o_totalprice"),
                    2, ["o_custkey"],
                    [F.col("o_totalprice").desc(), F.col("o_orderkey")])


@register("agg_topk_per_group", oracle="""
SELECT p_brand, p_partkey, p_retailprice FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part) t WHERE rn <= 3
""")
def agg_topk_per_group(spark, sf):
    """Exact topK(3) per group (reference topK exact path)."""
    p = load_table(spark, sf, "part")
    return top_k_per_group(
        p.select("p_brand", "p_partkey", "p_retailprice"),
        3, ["p_brand"],
        F.struct(F.col("p_retailprice"), (-F.col("p_partkey")).alias("neg")))


@register("agg_histogram", oracle="""
WITH b AS (
  SELECT cast(least(greatest(cast(floor(o_totalprice / 60000.0) AS INT), 0), 9) AS INT)
             AS bucket
  FROM orders WHERE o_totalprice IS NOT NULL)
SELECT bucket, count(*) AS cnt,
       round(bucket * 60000.0, 6)       AS bucket_lo,
       round((bucket + 1) * 60000.0, 6) AS bucket_hi
FROM b GROUP BY bucket
""")
def agg_histogram(spark, sf):
    """histogram(10) over [0, 600000) (fixed-bound deterministic variant)."""
    o = load_table(spark, sf, "orders")
    return histogram(o, "o_totalprice", 0.0, 600000.0, 10)


@register("agg_delta_sum", oracle="""
SELECT user_id, round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 6) AS delta_sum
FROM (SELECT user_id, value - lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS d
      FROM events) t
GROUP BY user_id
""")
def agg_delta_sum(spark, sf):
    """deltaSum: sum of positive consecutive diffs in time order."""
    ev = load_table(spark, sf, "events")
    return delta_sum(ev, ["user_id"], "ts", "value")


@register("agg_sum_map", oracle="""
SELECT user_id, event_type AS map_key, round(sum(value), 4) AS map_value
FROM events GROUP BY user_id, event_type
""")
def agg_sum_map(spark, sf):
    """sumMap (relational form): build a map per event, explode,
    re-aggregate per (entity, key) — reference AggregateFunctionSumMap."""
    ev = load_table(spark, sf, "events")
    mapped = ev.select("user_id",
                       F.create_map(F.col("event_type"), F.col("value")).alias("m"))
    out = sum_map(mapped, ["user_id"], "m", assemble=False)
    return out.select("user_id", "map_key", F.round("map_value", 4).alias("map_value"))


@register("agg_two_phase_state_merge", oracle="""
WITH partial AS (
  SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS s, count(*) AS c
  FROM lineitem GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag,
       round(sum(s), 2) AS sum_qty,
       cast(sum(c) AS BIGINT) AS n,
       round(sum(s) / sum(c), 6) AS avg_qty
FROM partial GROUP BY l_returnflag
""")
def agg_two_phase_state_merge(spark, sf):
    """-State/-Merge combinator semantics (SURVEY.md §4.3 item 1): partial
    aggregate at a finer grouping, then merge to a coarser one — the
    storable-aggregate-state pattern restructured as two DF aggregations
    (sum-of-sums / sum-of-counts reconstitutes avg exactly)."""
    li = load_table(spark, sf, "lineitem")
    partial = (li.groupBy("l_returnflag", "l_linestatus")
               .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("c")))
    return (partial.groupBy("l_returnflag")
            .agg(F.round(F.sum("s"), 2).alias("sum_qty"),
                 F.sum("c").cast("long").alias("n"),
                 F.round(F.sum("s") / F.sum("c"), 6).alias("avg_qty")))


@register("agg_bit", oracle="""
SELECT event_type,
       bit_and(event_id) AS band,
       bit_or(event_id)  AS bor,
       bit_xor(event_id) AS bxor
FROM events GROUP BY event_type
""")
def agg_bit(spark, sf):
    """groupBitAnd/Or/Xor → bit_and/bit_or/bit_xor (§2.4)."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.bit_and("event_id").alias("band"),
                 F.bit_or("event_id").alias("bor"),
                 F.bit_xor("event_id").alias("bxor")))


@register("agg_mannwhitney_u", oracle="""
WITH v AS (SELECT event_type, value FROM events
           WHERE event_type IN ('click', 'view')),
r AS (SELECT event_type, value,
             rank()    OVER (ORDER BY value) AS rk,
             count(*)  OVER (PARTITION BY value) AS ties
      FROM v),
s AS (SELECT event_type,
             sum(rk + (ties - 1) / 2.0) AS rsum, count(*) AS n
      FROM r GROUP BY event_type)
SELECT round(a.n * b.n + a.n * (a.n + 1) / 2.0 - a.rsum, 4) AS u_statistic
FROM (SELECT * FROM s WHERE event_type = 'click') a,
     (SELECT * FROM s WHERE event_type = 'view') b
""")
def agg_mannwhitney_u(spark, sf):
    """mannWhitneyUTest (U statistic, average-rank tie handling):
    click vs view event values. Round 14: rank sums reduce to
    per-DISTINCT-value counts first — the average rank of a tie group
    is cum_ties_before + (ties + 1)/2, so one hash aggregate per value
    plus the distributed bucketed prefix sum (operators/grank.py) over
    the |distinct| relation replaces a raw-row global rank + a
    value-partitioned min/max window over every row. All intermediate
    values are exact halves (< 2^52), so the group rank sum
    Σ count·avg_rank is bit-equal to the old per-row Σ avg_rank."""
    from clickhouse_clickhouse_spark.operators.grank import (
        global_prefix_sums,
    )

    ev = load_table(spark, sf, "events")
    v = ev.filter(F.col("event_type").isin("click", "view")) \
          .select("event_type", "value")
    cnt = v.groupBy("value").agg(
        F.count_if(F.col("event_type") == "click").alias("__a"),
        F.count_if(F.col("event_type") == "view").alias("__b"))
    ps = global_prefix_sums(
        cnt, "value", {"__cum": F.col("__a") + F.col("__b")},
        kernel=False)
    ar = (F.col("__cum") - (F.col("__a") + F.col("__b"))
          + ((F.col("__a") + F.col("__b") + 1) / 2.0))
    s = ps.agg(F.sum(F.col("__a") * ar).alias("r1"),
               F.sum("__a").alias("n1"),
               F.sum("__b").alias("n2"))
    return s.select(
        F.round(F.col("n1") * F.col("n2") + F.col("n1") * (F.col("n1") + 1) / 2.0
                - F.col("r1"), 4).alias("u_statistic"))


@register("agg_sum_distinct", oracle="""
SELECT l_returnflag,
       round(sum(DISTINCT l_quantity), 2) AS sum_dist_qty,
       round(avg(DISTINCT l_quantity), 6) AS avg_dist_qty
FROM lineitem GROUP BY l_returnflag
""")
def agg_sum_distinct(spark, sf):
    """-Distinct combinator: sumDistinct/avgDistinct (§2.4)."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_dist_qty"),
                 F.round(F.expr("avg(DISTINCT l_quantity)"), 6).alias("avg_dist_qty")))


@register("agg_array_combinator", oracle="""
SELECT label,
       round(sum(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum')), 6) AS sum_all_dims,
       cast(sum(len(embedding)) AS BIGINT) AS total_elems
FROM embeddings GROUP BY label
""")
def agg_array_combinator(spark, sf):
    """-Array combinator (sumArray): aggregate each row's array with a
    HOF fold, then aggregate across rows — no explode needed (§2.4)."""
    e = load_table(spark, sf, "embeddings")
    row_sum = F.aggregate(F.col("embedding"), F.lit(0.0),
                          lambda acc, x: acc + x.cast("double"))
    return (e.groupBy("label")
            .agg(F.round(F.sum(row_sum), 6).alias("sum_all_dims"),
                 F.sum(F.size("embedding")).cast("long").alias("total_elems")))


@register("agg_quantile_approx", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
""")
def agg_quantile_approx(spark, sf):
    """quantileTDigest/quantileBFloat16 → approx_percentile (Greenwald-
    Khanna, accuracy 1000 → rank error ≤ 0.1%). The hash-checked surface
    is the sketch's accuracy invariant: |approx − exact| within 2% of the
    group's value range (measured max 0.14% across the three SFs — 14×
    margin). Exact variants are value-checked in agg_quantiles."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("__ex"),
                 F.percentile_approx("l_extendedprice", 0.5, 1000).alias("__ap"),
                 (F.max("l_extendedprice")
                  - F.min("l_extendedprice")).alias("__rng"))
            .select("l_returnflag",
                    F.round("__ex", 4).alias("exact_median"),
                    (F.abs(F.col("__ap") - F.col("__ex"))
                     <= 0.02 * F.col("__rng") + 1e-9).alias("approx_ok")))


@register("agg_freq_items", oracle="""
SELECT cast(count(*) AS BIGINT) AS n_heavy, TRUE AS all_heavy_found
FROM (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
      HAVING count(*) >= 0.15 * (SELECT count(*) FROM orders)) t
""")
def agg_freq_items(spark, sf):
    """topK (approximate heavy hitters) → DataFrame.stat.freqItems
    (Karp-Shenker-Papadimitriou). The sketch's contract — every value with
    frequency ≥ support appears in the result (false positives allowed) —
    IS the hash-checked invariant: the exact heavy-hitter set, computed
    alongside, must be a subset of the sketch output. Exact topK is
    value-checked in agg_topk_per_group/agg_mode."""
    o = load_table(spark, sf, "orders")
    fi = (o.stat.freqItems(["o_orderpriority"], support=0.15)
          .select(F.col("o_orderpriority_freqItems").alias("items")))
    total = o.count()
    heavy = (o.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
             .filter(F.col("n") >= 0.15 * total)
             .agg(F.collect_list("o_orderpriority").alias("heavy"),
                  F.count("*").alias("n_heavy")))
    return (heavy.crossJoin(fi)
            .select("n_heavy",
                    F.forall("heavy",
                             lambda v: F.array_contains(F.col("items"), v))
                    .alias("all_heavy_found")))


@register("agg_weighted_median", oracle="""
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem)
SELECT l_returnflag, round(min(v), 4) AS weighted_median
FROM w WHERE cw >= tw / 2.0
GROUP BY l_returnflag
""")
def agg_weighted_median(spark, sf):
    """quantileExactWeighted(0.5): first value whose cumulative weight
    crosses half the total (deterministic tiebreak on the sort). Two
    windows over one key shuffle (§2.4)."""
    li = load_table(spark, sf, "lineitem")
    w = (Window.partitionBy("l_returnflag")
         .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
         .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("l_returnflag")
    d = li.select("l_returnflag",
                  F.col("l_extendedprice").alias("v"),
                  F.sum("l_quantity").over(w).alias("cw"),
                  F.sum("l_quantity").over(wt).alias("tw"))
    return (d.filter(F.col("cw") >= F.col("tw") / 2.0)
            .groupBy("l_returnflag")
            .agg(F.round(F.min("v"), 4).alias("weighted_median")))


@register("agg_decimal_path", oracle="""
SELECT l_returnflag,
       round(cast(sum(cast(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE), 2)
           AS sum_dec
FROM lineitem GROUP BY l_returnflag
""")
def agg_decimal_path(spark, sf):
    """Decimal(P,S) arithmetic (§1.2 type mapping): exact decimal
    summation, surfaced as double for engine-neutral comparison."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                         .cast("double"), 2).alias("sum_dec")))


@register("agg_limit_by_offset", oracle="""
SELECT o_custkey, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t WHERE rn > 1 AND rn <= 3
""")
def agg_limit_by_offset(spark, sf):
    """LIMIT 2 OFFSET 1 BY custkey (reference LIMIT BY offset form)."""
    o = load_table(spark, sf, "orders")
    return limit_by(o.select("o_custkey", "o_orderkey", "o_totalprice"),
                    2, ["o_custkey"],
                    [F.col("o_totalprice").desc(), F.col("o_orderkey")],
                    offset=1).select("o_custkey", "o_orderkey")


@register("agg_resample", oracle="""
SELECT l_returnflag,
       cast(least(cast(floor(l_quantity / 10.0) AS INT), 4) AS INT) AS qty_bucket,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, 2
""")
def agg_resample(spark, sf):
    """-Resample combinator (sumResample(0,50,10)): aggregate per value
    bucket of a second column — relational form: the bucket joins the
    grouping key (SURVEY.md §2.4 combinators)."""
    li = load_table(spark, sf, "lineitem")
    bucket = F.least(F.floor(F.col("l_quantity") / 10.0).cast("int"),
                     F.lit(4)).cast("int")
    return (li.groupBy("l_returnflag", bucket.alias("qty_bucket"))
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                 F.count("*").alias("n")))


@register("agg_group_bitmap", oracle="""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT event_type,
       CAST(count(*) AS INT) AS card,
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM c)
                     THEN 1 ELSE 0 END) AS INT) AS and_card,
       CAST(count(*) + (SELECT count(*) FROM c)
            - sum(CASE WHEN user_id IN (SELECT user_id FROM c)
                       THEN 1 ELSE 0 END) AS INT) AS or_card,
       CAST(count(*) + (SELECT count(*) FROM c)
            - 2 * sum(CASE WHEN user_id IN (SELECT user_id FROM c)
                           THEN 1 ELSE 0 END) AS INT) AS xor_card,
       sum(CASE WHEN user_id IN (SELECT user_id FROM c)
                THEN 1 ELSE 0 END) > 0 AS has_any_click
FROM u GROUP BY event_type
""")
def agg_group_bitmap(spark, sf):
    """groupBitmapState + bitmapAnd/Or/Xor/HasAny cardinalities
    (operators/bitmap.py — sorted-distinct-array bitmaps, all JVM array
    kernels): per event-type audience bitmap intersected with the
    'click' audience. The reference does this with roaring bitmaps;
    the sorted-array state gives the same algebra with built-ins."""
    from clickhouse_clickhouse_spark.operators import bitmap as B

    ev = load_table(spark, sf, "events")
    bm = (ev.groupBy("event_type")
          .agg(B.group_bitmap_state("user_id").alias("bm")))
    clicks = (bm.filter(F.col("event_type") == "click")
              .select(F.col("bm").alias("cb")))
    return (bm.crossJoin(F.broadcast(clicks))
            .select("event_type",
                    B.bitmap_cardinality(F.col("bm")).alias("card"),
                    B.bitmap_cardinality(
                        B.bitmap_and(F.col("bm"), F.col("cb"))).alias("and_card"),
                    B.bitmap_cardinality(
                        B.bitmap_or(F.col("bm"), F.col("cb"))).alias("or_card"),
                    B.bitmap_cardinality(
                        B.bitmap_xor(F.col("bm"), F.col("cb"))).alias("xor_card"),
                    B.bitmap_has_any(F.col("bm"), F.col("cb"))
                    .alias("has_any_click")))


@register("agg_group_bitmap_and", oracle="""
SELECT CAST(count(*) AS INT) AS and_cardinality
FROM (SELECT user_id FROM (SELECT DISTINCT event_type, user_id FROM events)
      GROUP BY user_id
      HAVING count(*) = (SELECT count(DISTINCT event_type) FROM events))
""")
def agg_group_bitmap_and(spark, sf):
    """groupBitmapAnd across groups: users present in EVERY event-type
    audience — the cross-group bitmap intersection computed as a
    distinct-count-per-value aggregate (one shuffle; nothing collected
    but the group count)."""
    from clickhouse_clickhouse_spark.operators.bitmap import group_bitmap_and

    ev = load_table(spark, sf, "events")
    return group_bitmap_and(ev, "event_type", "user_id")


@register("agg_min_max_map", oracle="""
SELECT user_id, event_type AS map_key,
       round(min(value), 4) AS map_min, round(max(value), 4) AS map_max
FROM events GROUP BY user_id, event_type
""")
def agg_min_max_map(spark, sf):
    """minMap/maxMap (reference AggregateFunctionSumMap variants):
    per-key map minima/maxima via the same explode→re-aggregate shape as
    sumMap (one partial/final hash agg on the composite key)."""
    ev = load_table(spark, sf, "events")
    mapped = ev.select(
        "user_id", F.explode(F.create_map(F.col("event_type"),
                                          F.col("value"))).alias("map_key", "v"))
    return (mapped.groupBy("user_id", "map_key")
            .agg(F.round(F.min("v"), 4).alias("map_min"),
                 F.round(F.max("v"), 4).alias("map_max")))


@register("agg_topk_weighted", oracle="""
WITH w AS (SELECT c_mktsegment, o_orderpriority, sum(o_totalprice) AS wt
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, o_orderpriority),
r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY wt DESC, o_orderpriority) AS rn
      FROM w)
SELECT c_mktsegment, o_orderpriority, round(wt, 2) AS weight
FROM r WHERE rn <= 3
""")
def agg_topk_weighted(spark, sf):
    """topKWeighted(3)(priority, totalprice): heaviest values by summed
    weight per group — exact form (weight agg + ranked window;
    SURVEY.md §2.4 topK row). Deterministic tiebreak on the value."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    w = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .groupBy("c_mktsegment", "o_orderpriority")
         .agg(F.sum("o_totalprice").alias("wt")))
    win = Window.partitionBy("c_mktsegment").orderBy(
        F.col("wt").desc(), "o_orderpriority")
    return (w.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= 3)
            .select("c_mktsegment", "o_orderpriority",
                    F.round("wt", 2).alias("weight")))


@register("agg_any_heavy", oracle="""
WITH f AS (SELECT l_returnflag, l_partkey, count(*) AS c
           FROM lineitem GROUP BY l_returnflag, l_partkey),
r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY c DESC, l_partkey) AS rn FROM f)
SELECT l_returnflag, l_partkey AS heavy FROM r WHERE rn = 1
""")
def agg_any_heavy(spark, sf):
    """anyHeavy ≈ heavy hitter = the modal value per group (reference
    AggregateFunctionAnyHeavy — approximate majority element; we give
    the exact mode with a deterministic smallest-value tiebreak): count
    per candidate then max_by over (count, -value)."""
    li = load_table(spark, sf, "lineitem")
    f = li.groupBy("l_returnflag", "l_partkey").agg(F.count("*").alias("c"))
    return (f.groupBy("l_returnflag")
            .agg(F.max_by("l_partkey",
                          F.struct(F.col("c"), (-F.col("l_partkey"))))
                 .alias("heavy")))


@register("agg_bounding_ratio", oracle="""
WITH e AS (SELECT user_id, value, date_trunc('microseconds', ts) AS tus,
                event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn_a,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn_d
           FROM events)
SELECT user_id,
       round((max(CASE WHEN rn_d = 1 THEN value END)
              - max(CASE WHEN rn_a = 1 THEN value END))
             / (epoch(max(tus)) - epoch(min(tus))) * 86400, 6) AS slope_per_day
FROM e GROUP BY user_id HAVING epoch(max(tus)) > epoch(min(tus))
""")
def agg_bounding_ratio(spark, sf):
    """boundingRatio(ts, value): slope between the first and last point
    of each series — (last value - first value)/(time span); one hash
    agg with min_by/max_by, no sort. Scaled to per-day units."""
    ev = load_table(spark, sf, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    g = (ev.groupBy("user_id")
         .agg(F.max_by("value", key).alias("vl"),
              F.min_by("value", key).alias("vf"),
              F.max(F.col("ts").cast("double")).alias("tl"),
              F.min(F.col("ts").cast("double")).alias("tf")))
    return (g.filter(F.col("tl") > F.col("tf"))
            .select("user_id",
                    F.round((F.col("vl") - F.col("vf"))
                            / (F.col("tl") - F.col("tf")) * 86400, 6)
                    .alias("slope_per_day")))


@register("agg_theils_u", oracle="""
WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y, count(*)::DOUBLE AS c
           FROM lineitem GROUP BY 1, 2),
tot AS (SELECT sum(c) AS n FROM j),
hx AS (SELECT -sum(p * ln(p)) AS h
       FROM (SELECT sum(c) / (SELECT n FROM tot) AS p FROM j GROUP BY x)),
yc AS (SELECT y, sum(c) AS cy FROM j GROUP BY y),
hxy AS (SELECT sum((cy / (SELECT n FROM tot)) * hc) AS h FROM (
          SELECT j.y, max(cy) AS cy,
                 -sum((c / cy) * ln(c / cy)) AS hc
          FROM j JOIN yc USING (y) GROUP BY j.y))
SELECT round(((SELECT h FROM hx) - (SELECT h FROM hxy))
             / (SELECT h FROM hx), 8) AS theils_u
""")
def agg_theils_u(spark, sf):
    """theilsU(x, y) = (H(X) - H(X|Y)) / H(X) — the uncertainty
    coefficient (reference AggregateFunctionTheilsU): three small
    aggregates over the joint-count table, combined with DF math
    (the joint table is tiny — everything after the first groupBy is a
    broadcast-sized computation)."""
    li = load_table(spark, sf, "lineitem")
    j = (li.groupBy(F.col("l_returnflag").alias("x"),
                    F.col("l_linestatus").alias("y"))
         .agg(F.count("*").cast("double").alias("c")))
    tot = j.agg(F.sum("c").alias("n"))
    jn = j.crossJoin(F.broadcast(tot))
    hx = (jn.groupBy("x").agg((F.sum("c") / F.first("n")).alias("p"))
          .agg((-F.sum(F.col("p") * F.log("p"))).alias("hx")))
    wy = Window.partitionBy("y")
    hxy = (jn.withColumn("pxy", F.col("c") / F.sum("c").over(wy))
           .groupBy("y")
           .agg((F.first("n")).alias("n"),
                F.sum("c").alias("cy"),
                (-F.sum(F.col("pxy") * F.log("pxy"))).alias("hc"))
           .agg(F.sum((F.col("cy") / F.col("n")) * F.col("hc")).alias("hxy")))
    return (hx.crossJoin(F.broadcast(hxy))
            .select(F.round((F.col("hx") - F.col("hxy")) / F.col("hx"), 8)
                    .alias("theils_u")))


@register("agg_quantile_exact_low_high", oracle="""
WITH r AS (SELECT l_returnflag, l_quantity,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_quantity) AS rn,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
SELECT l_returnflag,
  max(CASE WHEN rn - 1 = CAST(floor(0.5 * (n - 1)) AS BIGINT)
           THEN l_quantity END) AS median_low,
  max(CASE WHEN rn - 1 = CAST(ceil(0.5 * (n - 1)) AS BIGINT)
           THEN l_quantity END) AS median_high,
  max(CASE WHEN rn - 1 = CAST(floor(0.9 * (n - 1)) AS BIGINT)
           THEN l_quantity END) AS p90_low
FROM r GROUP BY l_returnflag
""")
def agg_quantile_exact_low_high(spark, sf):
    """quantileExactLow/quantileExactHigh (element picks at
    floor/ceil(q*(n-1)) of the sorted group — the reference's exact
    quantile family, distinct from interpolating percentile)."""
    from clickhouse_clickhouse_spark.operators.aggregates import (
        quantile_exact_pick,
    )

    li = load_table(spark, sf, "lineitem")
    return quantile_exact_pick(
        li, ["l_returnflag"], "l_quantity",
        {"median_low": (0.5, "low"), "median_high": (0.5, "high"),
         "p90_low": (0.9, "low")})


@register("agg_auc", oracle="""
WITH r AS (SELECT event_type = 'purchase' AS pos, value,
                  row_number() OVER (ORDER BY value, event_id) AS rk
           FROM events),
s AS (SELECT sum(CASE WHEN pos THEN rk ELSE 0 END) AS pos_rank_sum,
             count_if(pos)::DOUBLE AS p, count_if(NOT pos)::DOUBLE AS n
      FROM r)
SELECT round((pos_rank_sum - p * (p + 1) / 2) / (p * n), 8) AS auc
FROM s
""")
def agg_auc(spark, sf):
    """arrayAUC as a table aggregate (reference [U]
    src/Functions/array/arrayAUC.cpp computes it over array pairs): AUC
    of value as a score for the 'purchase' class via the Mann-Whitney
    rank-sum identity — distributed global rank (bucketed, no
    single-partition window — operators/grank.py) + one aggregate, no
    pairwise comparison. Deterministic tiebreak on event_id."""
    from clickhouse_clickhouse_spark.operators.grank import global_row_number

    ev = load_table(spark, sf, "events")
    r = (global_row_number(
            ev.select("value", "event_id", "event_type"),
            "value", ["event_id"], out="rk")
         .select((F.col("event_type") == "purchase").alias("pos"), "rk"))
    return (r.agg(F.sum(F.when(F.col("pos"), F.col("rk")).otherwise(0))
                  .cast("double").alias("prs"),
                  F.count_if("pos").cast("double").alias("p"),
                  F.count_if(~F.col("pos")).cast("double").alias("n"))
            .select(F.round((F.col("prs") - F.col("p") * (F.col("p") + 1) / 2)
                            / (F.col("p") * F.col("n")), 8).alias("auc")))


@register("agg_ks_test", oracle="""
WITH r AS (
  SELECT l_quantity AS v, l_linestatus = 'O' AS g1 FROM lineitem),
tot AS (SELECT count_if(g1)::DOUBLE AS n1, count_if(NOT g1)::DOUBLE AS n2
        FROM r),
e AS (SELECT v,
             sum(CASE WHEN g1 THEN 1 ELSE 0 END) OVER w AS c1,
             sum(CASE WHEN g1 THEN 0 ELSE 1 END) OVER w AS c2
      FROM r WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))
SELECT round(max(abs(c1 / (SELECT n1 FROM tot)
                    - c2 / (SELECT n2 FROM tot))), 8) AS ks_d
FROM (SELECT v, max(c1) AS c1, max(c2) AS c2 FROM e GROUP BY v)
""")
def agg_ks_test(spark, sf):
    """kolmogorovSmirnovTest (reference [U] src/AggregateFunctions/
    AggregateFunctionKolmogorovSmirnovTest.cpp) — the D statistic
    between the 'O' and 'F' l_quantity distributions: distributed
    running ECDF counts (bucketed prefix sums, operators/grank.py — no
    single-partition window), max gap taken at each distinct value. No
    per-group collect. Round 6: the asymptotic p-value is now available
    too — operators/advanced.kolmogorov_smirnov_test (agg_ks_test_pvalue
    exercises it with a full-series oracle)."""
    from clickhouse_clickhouse_spark.operators.grank import global_prefix_sums

    li = load_table(spark, sf, "lineitem")
    r = li.select(F.col("l_quantity").alias("v"),
                  (F.col("l_linestatus") == "O").alias("g1"))
    tot = r.agg(F.count_if("g1").cast("double").alias("n1"),
                F.count_if(~F.col("g1")).cast("double").alias("n2"))
    # round 14: the ECDF only needs counts per DISTINCT value, so the
    # raw rows reduce FIRST (one pass, map-side partial agg) and the
    # prefix-sum machinery (3 full passes: bounds, window, counts) runs
    # over the ~|distinct| relation instead of every row — the window
    # sort shrinks from |rows| to |distinct values|, and the inclusive
    # prefix over one-row-per-value IS the tie-correct max the old
    # groupBy(v).max(...) reduction recovered (dropped — identity now).
    cnt = r.groupBy("v").agg(
        F.count_if("g1").alias("__a1"),
        F.count_if(~F.col("g1")).alias("__a2"))
    per_v = global_prefix_sums(
        cnt, "v", {"c1": F.col("__a1"), "c2": F.col("__a2")},
        kernel=False).select("v", "c1", "c2")
    return (per_v.crossJoin(F.broadcast(tot))
            .agg(F.round(F.max(F.abs(F.col("c1") / F.col("n1")
                                     - F.col("c2") / F.col("n2"))), 8)
                 .alias("ks_d")))


@register("agg_or_null_or_default", oracle="""
SELECT max(CASE WHEN l_quantity > 1e9 THEN l_quantity END) AS max_or_null,
       coalesce(sum(CASE WHEN l_quantity > 1e9 THEN l_quantity END), 0)
         AS sum_or_default,
       CAST(coalesce(count(CASE WHEN l_quantity > 1e9 THEN 1 END), 0)
            AS BIGINT) AS count_if_empty
FROM lineitem
""")
def agg_or_null_or_default(spark, sf):
    """-OrNull / -OrDefault combinators (reference Combinators/
    AggregateFunctionOrFill.h): aggregates over an empty-by-filter set
    yield NULL (OrNull) vs the type default (OrDefault) — spelled as
    conditional aggregation + coalesce."""
    li = load_table(spark, sf, "lineitem")
    empty = F.when(F.col("l_quantity") > 1e9, F.col("l_quantity"))
    return li.agg(
        F.max(empty).alias("max_or_null"),
        F.coalesce(F.sum(empty), F.lit(0.0)).alias("sum_or_default"),
        F.coalesce(F.count(empty), F.lit(0)).alias("count_if_empty"))


@register("agg_group_array_moving", oracle="""
WITH m AS (
  SELECT user_id, ts, event_id,
         round(sum(value) OVER w3, 6)  AS mv_sum,
         round(sum(value) OVER w3 / 3.0, 6) AS mv_avg
  FROM events WHERE user_id < 8
  WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
SELECT user_id,
       to_json(list_transform(list(mv_sum ORDER BY ts, event_id),
                              x -> printf('%.6f', x + 0.0))) AS moving_sums,
       to_json(list_transform(list(mv_avg ORDER BY ts, event_id),
                              x -> printf('%.6f', x + 0.0))) AS moving_avgs
FROM m GROUP BY user_id
""")
def agg_group_array_moving(spark, sf):
    """groupArrayMovingSum(3) + groupArrayMovingAvg(3) of event value per
    user (reference AggregateFunctionGroupArrayMoving.h): one window pass
    each, deterministic array order via sorted (ts, event_id) structs.
    Arrays emitted as %.6f-JSON strings (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.shapes import json_double_arrays
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 8)
    sums = group_array_moving(ev, ["user_id"], ["ts", "event_id"],
                              "value", 3, kind="sum")
    avgs = group_array_moving(ev, ["user_id"], ["ts", "event_id"],
                              "value", 3, kind="avg")
    return json_double_arrays(sums.join(avgs, "user_id"),
                              "moving_sums", "moving_avgs")


@register("agg_uniq_merge_two_phase", oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS merge_consistent
FROM lineitem GROUP BY l_returnflag
""")
def agg_uniq_merge_two_phase(spark, sf):
    """uniqCombined -State/-Merge algebra (reference [U]
    src/AggregateFunctions/UniqCombined, AggregateFunctionUniq.h) via
    Spark Datasketches HLL: union-merge partial sketches of two DIFFERENT
    granularities ((returnflag, linestatus) vs (returnflag, suppkey mod
    8)) up to the same coarse key and compare. In dense HLL mode union is
    register-wise max — associative and order-invariant — so the two
    estimates agree exactly; below the sparse->dense promotion boundary
    the per-split promotion points can differ, so ``merge_consistent``
    asserts agreement within 1% rather than bit equality, plus both the
    direct (HIP) and post-union (composite) estimates within 20% of the
    exact distinct count. Sketch values can't hash-match an oracle, so
    these invariants + the exact count ARE the hash-checked surface."""
    li = load_table(spark, sf, "lineitem")
    via_ls = (li.groupBy("l_returnflag", "l_linestatus")
              .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
              .groupBy("l_returnflag")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("est_via_linestatus")))
    via_sm = (li.groupBy("l_returnflag",
                         (F.col("l_suppkey") % 8).alias("bucket"))
              .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
              .groupBy("l_returnflag")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("est_via_suppbucket")))
    direct = (li.groupBy("l_returnflag")
              .agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey"))
                   .alias("est_direct")))
    exact = (li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_orderkey").alias("exact_orders")))
    return (via_ls.join(via_sm, "l_returnflag").join(direct, "l_returnflag")
            .join(exact, "l_returnflag")
            .select("l_returnflag", "exact_orders",
                    ((F.abs(F.col("est_via_linestatus")
                            - F.col("est_via_suppbucket"))
                      <= 0.01 * F.col("est_via_linestatus") + 1)
                     & (F.abs(F.col("est_direct") - F.col("exact_orders"))
                        / F.col("exact_orders") <= 0.20)
                     & (F.abs(F.col("est_via_linestatus")
                              - F.col("exact_orders"))
                        / F.col("exact_orders") <= 0.20))
                    .alias("merge_consistent")))


@register("agg_uniq_theta", oracle="""
SELECT count(DISTINCT CASE WHEN l_linestatus = 'O' THEN l_orderkey END)
           AS exact_o,
       count(DISTINCT CASE WHEN l_linestatus = 'F' THEN l_orderkey END)
           AS exact_f,
       TRUE AS algebra_ok
FROM lineitem
""")
def agg_uniq_theta(spark, sf):
    """uniqTheta + its set algebra (reference uniqThetaUnion/Intersect/Not,
    [U] src/AggregateFunctions/AggregateFunctionUniq.h theta variant) via
    Spark theta sketches: distinct orderkeys of the 'O' vs 'F'
    linestatus populations, then union / intersection / difference
    estimates between the two sketches. Sketch values can't hash-match an
    oracle; the hash-checked surface is the algebra's invariants —
    union ≥ max(side), intersect ≤ min(side), difference ≤ side,
    inclusion-exclusion within 10%, and both side estimates within 5% of
    the exact distinct counts (measured max 1.1% across the three SFs)."""
    li = load_table(spark, sf, "lineitem")
    sides = (li.filter(F.col("l_linestatus").isin("O", "F"))
             .groupBy("l_linestatus")
             .agg(F.theta_sketch_agg("l_orderkey").alias("sk")))
    o = sides.filter(F.col("l_linestatus") == "O") \
             .select(F.col("sk").alias("sk_o"))
    f = sides.filter(F.col("l_linestatus") == "F") \
             .select(F.col("sk").alias("sk_f"))
    exact = li.agg(
        F.countDistinct(F.when(F.col("l_linestatus") == "O",
                               F.col("l_orderkey"))).alias("exact_o"),
        F.countDistinct(F.when(F.col("l_linestatus") == "F",
                               F.col("l_orderkey"))).alias("exact_f"))
    j = o.crossJoin(f).crossJoin(exact)
    est = j.select(
        "exact_o", "exact_f",
        F.theta_sketch_estimate(F.col("sk_o")).alias("uniq_o"),
        F.theta_sketch_estimate(F.col("sk_f")).alias("uniq_f"),
        F.theta_sketch_estimate(F.theta_union(F.col("sk_o"), F.col("sk_f")))
        .alias("uniq_union"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_o"), F.col("sk_f")))
        .alias("uniq_intersect"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_o"), F.col("sk_f")))
        .alias("uniq_o_not_f"))
    return est.select(
        "exact_o", "exact_f",
        ((F.col("uniq_union") >= F.greatest("uniq_o", "uniq_f") - 1e-6)
         & (F.col("uniq_intersect") <= F.least("uniq_o", "uniq_f") + 1e-6)
         & (F.col("uniq_o_not_f") <= F.col("uniq_o") + 1e-6)
         & (F.abs(F.col("uniq_union") + F.col("uniq_intersect")
                  - F.col("uniq_o") - F.col("uniq_f"))
            <= 0.10 * F.col("uniq_union") + 1)
         & (F.abs(F.col("uniq_o") - F.col("exact_o"))
            / F.col("exact_o") <= 0.05)
         & (F.abs(F.col("uniq_f") - F.col("exact_f"))
            / F.col("exact_f") <= 0.05)).alias("algebra_ok"))


@register("agg_quantile_kll_merge", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_exact,
       TRUE AS within_tol
FROM lineitem GROUP BY l_returnflag
""")
def agg_quantile_kll_merge(spark, sf):
    """Mergeable quantile sketch (reference quantileTDigest-class -State/
    -Merge, [U] src/AggregateFunctions/QuantileTDigest.h) via Spark KLL
    doubles sketches: partial sketches per (l_returnflag, l_linestatus)
    merged up to l_returnflag, median read from the merged sketch, exact
    median alongside; the hash-checked surface is the exact median plus
    ``within_tol`` — the KLL error bound (~1.7% rank error at default k,
    gated at 5% of the value range) that the sketch contract promises."""
    li = load_table(spark, sf, "lineitem")
    partial = (li.groupBy("l_returnflag", "l_linestatus")
               .agg(F.kll_sketch_agg_double(
                   F.col("l_quantity").cast("double")).alias("sk")))
    # kll_sketch_merge_double is a binary scalar merge (no aggregate
    # form) — fold the per-group sketch list pairwise
    merged = (partial.groupBy("l_returnflag")
              .agg(F.collect_list("sk").alias("sks"))
              .select("l_returnflag",
                      F.kll_sketch_get_quantile_double(
                          F.aggregate(
                              F.slice(F.col("sks"), 2,
                                      F.greatest(F.size("sks") - 1, F.lit(0))),
                              F.element_at(F.col("sks"), 1),
                              lambda acc, x:
                              F.call_function("kll_sketch_merge_double",
                                              acc, x)),
                          F.lit(0.5)).alias("median_kll")))
    exact = (li.groupBy("l_returnflag")
             .agg(F.percentile("l_quantity", F.lit(0.5)).alias("median_exact"),
                  F.max("l_quantity").alias("max_qty"),
                  F.min("l_quantity").alias("min_qty")))
    return (merged.join(exact, "l_returnflag")
            .select("l_returnflag",
                    F.round("median_exact", 4).alias("median_exact"),
                    (F.abs(F.col("median_kll") - F.col("median_exact"))
                     <= 0.05 * (F.col("max_qty") - F.col("min_qty")) + 1e-9)
                    .alias("within_tol")))


@register("agg_simple_linreg", oracle="""
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag
""")
def agg_simple_linreg(spark, sf):
    """simpleLinearRegression (reference [U]
    AggregateFunctionSimpleLinearRegression.cpp): least-squares (k, b)
    of extendedprice ~ quantity per return flag via Spark's native
    regr_slope / regr_intercept / regr_r2 aggregates."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6)
                 .alias("slope"),
                 F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4)
                 .alias("intercept"),
                 F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6)
                 .alias("r2")))


@register("agg_sum_foreach", oracle="""
WITH x AS (
  SELECT label, i, round(sum(CAST(embedding[i] AS DOUBLE)), 6) AS s,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, 8)) AS i) g
  GROUP BY label, i)
SELECT label,
       to_json(list_transform(list(s ORDER BY i),
                              x -> printf('%.6f', x + 0.0))) AS sum_foreach,
       to_json(list_transform(list(m ORDER BY i),
                              x -> printf('%.6f', x + 0.0))) AS avg_foreach
FROM x GROUP BY label
""")
def agg_sum_foreach(spark, sf):
    """-ForEach combinator (reference sumForEach/avgForEach,
    Combinators/AggregateFunctionForEach.h): element-wise aggregation
    across rows of array columns — posexplode + per-position hash-agg +
    ordered reassembly (first 8 dims of the embedding). Arrays emitted
    as %.6f-JSON strings (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.shapes import json_double_arrays
    e = load_table(spark, sf, "embeddings")
    per_pos = (e.select("label", F.posexplode(F.slice("embedding", 1, 8))
                        .alias("i", "v"))
               .groupBy("label", "i")
               .agg(F.round(F.sum(F.col("v").cast("double")), 6).alias("s"),
                    F.round(F.avg(F.col("v").cast("double")), 6).alias("m")))
    packed = F.array_sort(F.collect_list(F.struct("i", "s", "m")))
    out = (per_pos.groupBy("label")
           .agg(F.transform(packed, lambda t: t["s"]).alias("sum_foreach"),
                F.transform(packed, lambda t: t["m"]).alias("avg_foreach")))
    return json_double_arrays(out, "sum_foreach", "avg_foreach")


@register("agg_avg_map", oracle="""
SELECT user_id, event_type AS map_key,
       round(sum(value), 4) AS map_sum,
       count(*) AS map_n
FROM events GROUP BY user_id, event_type
""")
def agg_avg_map(spark, sf):
    """avgMap via the generic -Map combinator (reference
    AggregateFunctionMap.h: any aggregate + Map applies element-wise per
    map key) — operators/aggregates.map_combinator instantiated twice
    (agg='sum', agg='count'); the hash-oracle output is the grid-exact
    (rounded sum, count) decomposition rather than round(avg(...)),
    which flips half-boundaries (the cb_dialect_daily lesson); the
    agg='avg' path itself is exact-literal-tested in pytest."""
    from clickhouse_clickhouse_spark.operators.aggregates import map_combinator

    ev = load_table(spark, sf, "events")
    mapped = ev.select("user_id",
                       F.create_map(F.col("event_type"),
                                    F.col("value")).alias("m"))
    s = map_combinator(mapped, ["user_id"], "m", "sum", assemble=False)
    c = map_combinator(mapped, ["user_id"], "m", "count", assemble=False)
    return (s.withColumnRenamed("map_value", "map_sum")
            .join(c.withColumnRenamed("map_value", "map_n"),
                  ["user_id", "map_key"])
            .select("user_id", "map_key",
                    F.round("map_sum", 4).alias("map_sum"), "map_n"))


@register("agg_anova", oracle="""
WITH g AS (
  SELECT event_type,
         count(*) AS n_g,
         avg(value) AS mean_g,
         sum(value * value) - count(*) * avg(value) * avg(value) AS ssw_g
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT round(((sum(n_g * mean_g * mean_g)
               - sum(n_g) * pow(sum(n_g * mean_g) / sum(n_g), 2))
              / (count(*) - 1))
             / (sum(ssw_g) / (sum(n_g) - count(*))), 6) AS f_stat,
       cast(count(*) - 1 AS BIGINT) AS df_between,
       cast(sum(n_g) - count(*) AS BIGINT) AS df_within
FROM g
""")
def agg_anova(spark, sf):
    """analysisOfVariance (one-way ANOVA F statistic over event_type
    groups) — reference AggregateFunctionAnalysisOfVariance; two chained
    hash aggregations via operators/advanced.anova_f."""
    from clickhouse_clickhouse_spark.operators.advanced import anova_f

    ev = load_table(spark, sf, "events")
    return anova_f(ev, "event_type", "value")


@register("agg_group_concat", oracle="""
SELECT user_id,
       string_agg(event_type, ',' ORDER BY event_type, event_id) AS types
FROM events WHERE event_id < 2000
GROUP BY user_id
""")
def agg_group_concat(spark, sf):
    """groupConcat (24.x reference addition; ≡ string_agg): sorted-
    deterministic concatenation via array_sort(collect_list(struct)) —
    one hash agg; the struct sort key makes the result order-stable
    under any partitioning."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 2000)
    return (ev.groupBy("user_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("event_type", "event_id"))),
                    lambda s: s["event_type"]), ",").alias("types")))


@register("series_outliers_tukey", oracle="""
WITH f AS (
  SELECT event_type,
         round(quantile_cont(value, 0.25), 6) AS q1,
         round(quantile_cont(value, 0.75), 6) AS q3,
         round(quantile_cont(value, 0.25)
               - 1.5 * (quantile_cont(value, 0.75)
                        - quantile_cont(value, 0.25)), 6) AS lo,
         round(quantile_cont(value, 0.75)
               + 1.5 * (quantile_cont(value, 0.75)
                        - quantile_cont(value, 0.25)), 6) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT e.event_type, q1, q3, lo, hi,
       count(*) AS n,
       cast(count_if(value < lo OR value > hi) AS BIGINT) AS n_outliers
FROM events e JOIN f ON e.event_type = f.event_type
WHERE value IS NOT NULL
GROUP BY e.event_type, q1, q3, lo, hi
""")
def series_outliers_tukey(spark, sf):
    """seriesOutliersDetectTukey-class anomaly detection: per-group
    Tukey fences (exact type-7 quartiles) + outlier counts —
    operators/advanced.tukey_outliers; fences broadcast back, so the
    per-point flag pass never shuffles the fact rows."""
    from clickhouse_clickhouse_spark.operators.advanced import tukey_outliers

    ev = load_table(spark, sf, "events")
    return tukey_outliers(ev, ["event_type"], "value")


@register("series_acf_periodogram", oracle="""
WITH s AS (
  SELECT event_type,
         cast(floor(epoch_us(date_trunc('microseconds', ts)) / 1000000.0
                    / 21600) AS BIGINT) AS b,
         count(*) AS n
  FROM events GROUP BY 1, 2),
l AS (SELECT unnest(generate_series(1, 8)) AS lag)
SELECT s.event_type, l.lag, round(corr(s.n, r.n), 6) AS acf
FROM s CROSS JOIN l
JOIN s r ON r.event_type = s.event_type AND r.b = s.b + l.lag
GROUP BY s.event_type, l.lag
""")
def series_acf_periodogram(spark, sf):
    """Series period detection (seriesPeriodDetectFFT-class, via the
    ACF — operators/advanced.acf_periodogram): 6-hour-bucketed event
    counts per type, autocorrelation at lags 1..8; the dominant period
    is the per-type argmax row. Lagged self-equi-join on (type, bucket),
    no window."""
    from clickhouse_clickhouse_spark.operators.advanced import acf_periodogram

    ev = load_table(spark, sf, "events")
    return acf_periodogram(ev, ["event_type"], "ts", 21600, 8)


@register("series_decompose_additive", oracle="""
WITH s AS (
  SELECT event_type,
         cast(floor(epoch_us(date_trunc('microseconds', ts)) / 1000000.0
                    / 21600) AS BIGINT) AS bucket,
         cast(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type, bucket, x,
         round(avg(x) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6)
           AS trend,
         bucket % 4 AS phase
  FROM s),
sp AS (SELECT event_type, phase, avg(x - trend) AS sp
       FROM t GROUP BY 1, 2),
c AS (SELECT event_type, avg(sp) AS c FROM sp GROUP BY 1),
seas AS (SELECT sp.event_type, phase, round(sp - c, 6) AS seasonal
         FROM sp JOIN c USING (event_type))
SELECT t.event_type, bucket, x, trend, seasonal,
       round(x - trend - seasonal, 6) AS residual
FROM t JOIN seas ON seas.event_type = t.event_type
                AND seas.phase = t.phase
""")
def series_decompose_additive(spark, sf):
    """seriesDecomposeSTL-class decomposition (classical moving-average
    additive form — operators/advanced.series_decompose): 6h-bucketed
    counts per event type, period 4 (daily cycle), trend/seasonal/
    residual. Keyed windows + one phase agg, broadcast re-join."""
    from clickhouse_clickhouse_spark.operators.advanced import (
        series_decompose,
    )

    ev = load_table(spark, sf, "events")
    return series_decompose(ev, ["event_type"], "ts", 21600, 4)


@register("agg_corr_matrix", oracle="""
SELECT 'l_quantity' AS col_a, 'l_quantity' AS col_b,
       round(corr(l_quantity, l_quantity), 6) AS corr FROM lineitem
UNION ALL SELECT 'l_quantity', 'l_extendedprice',
       round(corr(l_quantity, l_extendedprice), 6) FROM lineitem
UNION ALL SELECT 'l_quantity', 'l_discount',
       round(corr(l_quantity, l_discount), 6) FROM lineitem
UNION ALL SELECT 'l_extendedprice', 'l_extendedprice',
       round(corr(l_extendedprice, l_extendedprice), 6) FROM lineitem
UNION ALL SELECT 'l_extendedprice', 'l_discount',
       round(corr(l_extendedprice, l_discount), 6) FROM lineitem
UNION ALL SELECT 'l_discount', 'l_discount',
       round(corr(l_discount, l_discount), 6) FROM lineitem
""")
def agg_corr_matrix(spark, sf):
    """corrMatrix (reference matrix aggregate) as tidy (col_a, col_b,
    corr) pairs — one scan, all pairwise correlations in a single
    aggregation, plan-time stack unpivot
    (operators/advanced.corr_matrix)."""
    from clickhouse_clickhouse_spark.operators.advanced import corr_matrix

    li = load_table(spark, sf, "lineitem")
    return corr_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])


@register("agg_group_array_intersect", oracle="""
WITH g AS (
  SELECT lang, doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
  FROM documents WHERE doc_id < 60),
folded AS (
  SELECT lang, list_sort(list_reduce(list(toks), (x, y) -> list_intersect(x, y)))
           AS common
  FROM g GROUP BY lang)
SELECT lang, to_json(common) AS common FROM folded
""")
def agg_group_array_intersect(spark, sf):
    """groupArrayIntersect: tokens common to EVERY document of a
    language (operators/aggregates.group_array_intersect — collect +
    array_intersect fold, one hash aggregation). Array emitted as a
    JSON string (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.functions.text import tokens
    from clickhouse_clickhouse_spark.operators.aggregates import (
        group_array_intersect,
    )

    d = (load_table(spark, sf, "documents")
         .filter(F.col("doc_id") < 60)
         .select("lang",
                 F.array_distinct(tokens(F.lower(F.col("text"))))
                 .alias("toks")))
    from clickhouse_clickhouse_spark.shapes import json_arrays
    return json_arrays(
        group_array_intersect(d, ["lang"], "toks", out="common"), "common")


@register("agg_group_array_insert_at", oracle="""
WITH slot AS (
  SELECT l_orderkey, CAST(l_linenumber - 1 AS INT) AS k,
         min(l_quantity) AS v
  FROM lineitem WHERE l_orderkey < 40 AND l_linenumber <= 4
  GROUP BY 1, 2)
SELECT l_orderkey,
       to_json(list_transform(
         [coalesce(min(CASE WHEN k = 0 THEN v END), -1.0),
          coalesce(min(CASE WHEN k = 1 THEN v END), -1.0),
          coalesce(min(CASE WHEN k = 2 THEN v END), -1.0),
          coalesce(min(CASE WHEN k = 3 THEN v END), -1.0)],
         x -> printf('%.6f', x + 0.0))) AS arr
FROM slot GROUP BY l_orderkey
""")
def agg_group_array_insert_at(spark, sf):
    """groupArrayInsertAt: position-addressed array assembly per group
    (operators/aggregates.group_array_insert_at) — line quantities slotted
    by line number, -1 default for missing slots. Array emitted as a
    %.6f-JSON string (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.operators.aggregates import (
        group_array_insert_at,
    )
    from clickhouse_clickhouse_spark.shapes import json_double_arrays

    li = (load_table(spark, sf, "lineitem")
          .filter((F.col("l_orderkey") < 40) & (F.col("l_linenumber") <= 4))
          .select("l_orderkey",
                  (F.col("l_linenumber") - 1).cast("int").alias("slot"),
                  F.col("l_quantity")))
    out = group_array_insert_at(li, ["l_orderkey"], "l_quantity", "slot",
                                size=4, default=-1.0)
    return json_double_arrays(out, "arr")


@register("agg_sparkbar", oracle="""
WITH b AS (
  SELECT event_type, CAST(hour(ts) AS INT) // 3 AS bkt,
         sum(value) AS s
  FROM events GROUP BY 1, 2),
m AS (SELECT event_type, max(s) AS mx FROM b GROUP BY 1)
SELECT b.event_type,
       string_agg(substr('▁▂▃▄▅▆▇█',
                         greatest(1, least(8, CAST(ceil(s / mx * 8) AS INT))),
                         1), '' ORDER BY bkt) AS bar
FROM b JOIN m USING (event_type)
GROUP BY b.event_type
""")
def agg_sparkbar(spark, sf):
    """sparkbar: block-glyph histogram per group (3-hour activity bars
    per event type; operators/aggregates.sparkbar — two hash aggs)."""
    from clickhouse_clickhouse_spark.operators.aggregates import sparkbar

    ev = load_table(spark, sf, "events").select(
        "event_type",
        (F.hour("ts").cast("int") / 3).cast("int").alias("bkt"),
        "value")
    return sparkbar(ev, ["event_type"], "bkt", "value")


@register("sketch_tolerance_gate", oracle="""
SELECT true AS uniq_ok, true AS hll_ok, true AS quantile_ok
""")
def sketch_tolerance_gate(spark, sf):
    """Hash-checked accuracy gate for the approximate sketches: each
    estimate must land within a bound that is a safe MULTIPLE of the
    sketch's configured standard error (round-13 sf0.1 sweep finding:
    the old gate tested the DEFAULT-precision HLL (rsd 0.05) against a
    0.05 bound — a 1-sigma test that legitimately fails ~1/3 of
    corpus sizes; it first tripped at sf0.1 where the estimate landed
    at 1.3 sigma). Now: uniq at rsd 0.01 gated at 0.05 (5 sigma), HLL
    at rsd 0.02 gated at 0.08 (4 sigma), GK median within 5%
    relative — deterministic for any corpus the sketch's error
    analysis covers, not just the SFs we happened to test.

    Shape (optimization round 14): the sketch aggregates and the exact
    DISTINCT counts run in SEPARATE single-row aggregations cross-joined
    at the end. Mixing them in one ``agg`` triggers Spark's
    multi-distinct rewrite: an Expand to one projection per distinct
    group, with the first-phase hash aggregate keyed by (gid, user_id /
    event_id) — ~every distinct value becomes a group, and each group
    allocates the heavyweight imperative buffers of the NON-distinct
    aggregates (HLL at rsd 0.01 is ~16 KB of registers, plus two
    percentile states). Measured 17.6-40 s at sf0.1 for one combined
    agg vs < 0.4 s per aggregate alone; the split form is ~1.5 s and
    scales — sketch buffers exist once per partition, not once per
    distinct key."""
    ev = load_table(spark, sf, "events")
    sk = ev.agg(
        F.expr("approx_count_distinct(user_id, 0.01)").alias("au"),
        F.expr("approx_count_distinct(event_id, 0.02)").alias("ah"),
        F.percentile_approx("value", 0.5, 10000).alias("aq"),
        F.expr("percentile(value, 0.5)").alias("eq"))
    cd = ev.agg(
        F.count_distinct("user_id").alias("eu"),
        F.count_distinct("event_id").alias("eh"))
    agg = sk.crossJoin(cd)
    rel = lambda a, e: F.abs(a - e) / F.greatest(e, F.lit(1e-9))  # noqa: E731
    return agg.select(
        (rel(F.col("au"), F.col("eu")) < 0.05).alias("uniq_ok"),
        (rel(F.col("ah"), F.col("eh")) < 0.08).alias("hll_ok"),
        (rel(F.col("aq"), F.col("eq")) < 0.05).alias("quantile_ok"))


@register("bitmap_serialized_merge", oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS INT) AS card,
       CAST(min(user_id) AS BIGINT) AS min_id,
       CAST(max(user_id) AS BIGINT) AS max_id
FROM events GROUP BY event_type
""")
def bitmap_serialized_merge(spark, sf):
    """AggregateFunction(groupBitmap, UInt32) STORAGE parity (round-5:
    closes the roaring-persistence gap, [U]
    src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp): partial
    bitmap states per (event_type, user_id mod 4) are serialized to the
    roaring-style binary codec, merged up to event_type over the BINARY
    states (only compact states shuffle), and read out — cardinality
    straight from container headers, min/max from the deserialized
    array. Bitmaps are exact, so this is fully hash-oracled."""
    from clickhouse_clickhouse_spark.operators import bitmap as B

    ev = load_table(spark, sf, "events")
    part = (ev.groupBy("event_type",
                       (F.col("user_id") % 4).alias("__shard"))
            .agg(B.group_bitmap_state("user_id").alias("bm"))
            .select("event_type", B.bitmap_serialize("bm").alias("bin")))
    merged = B.bitmap_merge_serialized(part, ["event_type"], "bin")
    return (merged
            .withColumn("arr", B.bitmap_deserialize("bin"))
            .select("event_type",
                    B.bitmap_cardinality_serialized("bin")
                    .cast("int").alias("card"),
                    F.array_min("arr").alias("min_id"),
                    F.array_max("arr").alias("max_id")))


@register("agg_quantile_tdigest_merge", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS e50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS e90,
       TRUE AS within_tol
FROM lineitem GROUP BY l_returnflag
""")
def agg_quantile_tdigest_merge(spark, sf):
    """quantileTDigest -State/-Merge algebra (round-5: real t-digest
    centroid states, [U] src/AggregateFunctions/QuantileTDigest.h;
    public algorithm: Dunning & Ertl's merging t-digest): map-side
    partial digests -> one centroid-state shuffle -> merge -> median and
    p90 readout, exact values alongside. Digest estimates are merge-order
    dependent by design, so the hash-checked surface is the exact
    quantiles plus the self-verifying ``within_tol`` accuracy invariant
    (1% of the group's value range — t-digest is far tighter than that
    at mid quantiles)."""
    from clickhouse_clickhouse_spark.operators.tdigest import (
        quantile_tdigest,
    )

    li = load_table(spark, sf, "lineitem")
    dig = quantile_tdigest(li, ["l_returnflag"], "l_extendedprice",
                           {"p50_td": 0.5, "p90_td": 0.9})
    # round 14: one array-percentile call — two separate percentile
    # aggregates each built their own per-group value buffer (the exact
    # branch alone measured 2.2 s at sf0.1); the array form shares one
    # buffer and reads both quantiles out of it, bit-identically
    exact = (li.groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9))")
                  .alias("__e"),
                  (F.max("l_extendedprice")
                   - F.min("l_extendedprice")).alias("rng"))
             .select("l_returnflag", "rng",
                     F.element_at("__e", 1).alias("e50"),
                     F.element_at("__e", 2).alias("e90")))
    return (dig.join(exact, "l_returnflag")
            .select("l_returnflag",
                    F.round("e50", 4).alias("e50"),
                    F.round("e90", 4).alias("e90"),
                    ((F.abs(F.col("p50_td") - F.col("e50"))
                      <= 0.01 * F.col("rng") + 1e-9)
                     & (F.abs(F.col("p90_td") - F.col("e90"))
                        <= 0.01 * F.col("rng") + 1e-9))
                    .alias("within_tol")))


@register("agg_quantile_timing", oracle="""
WITH q AS (
  SELECT event_type,
         CASE WHEN value * 400 < 0 THEN 0
              WHEN value * 400 >= 30000 THEN 30000
              WHEN value * 400 >= 1024
                THEN CAST(floor(value * 400 / 16) * 16 AS BIGINT)
              ELSE CAST(floor(value * 400) AS BIGINT) END AS qv
  FROM events),
r AS (
  SELECT event_type, qv,
         row_number() OVER (PARTITION BY event_type ORDER BY qv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM q)
SELECT event_type,
       min(CASE WHEN rn >= floor(0.5 * n) + 1 THEN qv END) AS p50,
       min(CASE WHEN rn >= floor(0.9 * n) + 1 THEN qv END) AS p90,
       min(CASE WHEN rn >= floor(0.99 * n) + 1 THEN qv END) AS p99
FROM r GROUP BY event_type
""")
def agg_quantile_timing(spark, sf):
    """quantileTiming at 0.5/0.9/0.99 (reference
    AggregateFunctionsQuantileTiming): the fixed web-latency
    quantization grid — exact <1024 ms, 16 ms buckets to 30 s, clamped
    above — then the nearest-rank pick, replayed value-exactly by the
    oracle. value*400 spans all three grid regimes."""
    from clickhouse_clickhouse_spark.operators.aggregates import (
        quantile_timing,
    )

    ev = load_table(spark, sf, "events") \
        .withColumn("lat_ms", F.col("value") * 400)
    return quantile_timing(ev, ["event_type"], "lat_ms",
                           {"p50": 0.5, "p90": 0.9, "p99": 0.99})


@register("agg_quantile_timing_weighted", oracle="""
WITH q AS (
  SELECT event_type,
         CASE WHEN value * 400 < 0 THEN 0
              WHEN value * 400 >= 30000 THEN 30000
              WHEN value * 400 >= 1024
                THEN CAST(floor(value * 400 / 16) * 16 AS BIGINT)
              ELSE CAST(floor(value * 400) AS BIGINT) END AS qv,
         CAST(1 + event_id % 5 AS BIGINT) AS w
  FROM events),
r AS (
  SELECT event_type, qv, w,
         sum(w) OVER (PARTITION BY event_type ORDER BY qv
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY event_type) AS wtot
  FROM q)
SELECT event_type,
       min(CASE WHEN cw >= floor(0.5 * wtot) + 1 THEN qv END) AS p50,
       min(CASE WHEN cw >= floor(0.95 * wtot) + 1 THEN qv END) AS p95
FROM r GROUP BY event_type
""")
def agg_quantile_timing_weighted(spark, sf):
    """quantileTimingWeighted: the timing grid with repeat-count weights
    (1 + event_id % 5) — nearest-rank over cumulative weight, windowed
    prefix sum (no multiset expansion), oracle-exact."""
    from clickhouse_clickhouse_spark.operators.aggregates import (
        quantile_timing_weighted,
    )

    ev = (load_table(spark, sf, "events")
          .withColumn("lat_ms", F.col("value") * 400)
          .withColumn("w", (F.lit(1) + F.col("event_id") % 5)))
    return quantile_timing_weighted(ev, ["event_type"], "lat_ms", "w",
                                    {"p50": 0.5, "p95": 0.95})



@register("agg_ks_test_pvalue", oracle="""
WITH s AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
  FROM events WHERE event_type IN ('click', 'view')),
t AS (SELECT CAST(sum(ia) AS DOUBLE) AS na,
             CAST(sum(ib) AS DOUBLE) AS nb FROM s),
c AS (SELECT v,
             sum(ia) OVER (ORDER BY v) AS ca,
             sum(ib) OVER (ORDER BY v) AS cb
      FROM s),
m AS (SELECT max(abs(ca / na - cb / nb)) AS d FROM c, t),
l AS (SELECT d, (sqrt(na * nb / (na + nb)) + 0.12
                 + 0.11 / sqrt(na * nb / (na + nb))) * d AS lam
      FROM m, t)
SELECT round(d, 6) AS d_statistic,
       round(least(greatest(
         2 * (SELECT sum(CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
                          * exp(-2.0 * k * k * lam * lam))
              FROM generate_series(1, 100) AS gs(k)), 0.0), 1.0), 6)
           AS p_value
FROM l
""")
def agg_ks_test_pvalue(spark, sf):
    """Two-sample Kolmogorov–Smirnov test WITH p-value, click vs view
    (round 6 — operators/advanced.kolmogorov_smirnov_test over the
    distributed bucketed prefix-sum; the oracle replays the ECDF walk
    with a RANGE window, tie-equivalent to the per-value reduce, and
    the same 100-term Kolmogorov series)."""
    from clickhouse_clickhouse_spark.operators.advanced import (
        kolmogorov_smirnov_test,
    )

    ev = load_table(spark, sf, "events")
    return kolmogorov_smirnov_test(ev, "value", "event_type",
                                   "click", "view")



@register("ab_sample_size_gate", oracle="""
SELECT true AS z_ok, true AS conv_ok, true AS cont_ok
""")
def ab_sample_size_gate(spark, sf):
    """A/B-test planning functions as a strict verdict gate (round 6 —
    ch_functions.normalQuantile via Acklam's published approximation,
    minSampleSizeConversion/Continous per the reference formulas):
    each computed value must land within 1e-6 relative of the closed
    form evaluated with the published z constants; the oracle states
    the expected verdicts."""
    import clickhouse_clickhouse_spark.ch_functions as ch

    z = 1.959963985 + 0.841621234
    n_conv = z * z * (0.25 * 0.75 + 0.28 * 0.72) / (0.03 * 0.03)
    n_cont = 2 * z * z * 20.0 ** 2 / (0.05 * 100.0) ** 2
    rel = lambda a, e: F.abs(a - e) / F.lit(abs(e))  # noqa: E731
    return spark.range(1).select(
        (rel(ch.normalQuantile(0.975), 1.959963985) < 1e-6).alias("z_ok"),
        (rel(ch.minSampleSizeConversion(0.25, 0.03)
             ["minimum_sample_size"], n_conv) < 1e-6).alias("conv_ok"),
        (rel(ch.minSampleSizeContinous(100.0, 20.0, 0.05)
             ["minimum_sample_size"], n_cont) < 1e-6).alias("cont_ok"))


@register("ch_dialect_demo10", oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS r,
       to_json([CAST(sum(n_nationkey) AS BIGINT),
                CAST(sum(n_regionkey) AS BIGINT),
                CAST(sum(n_nationkey % 5) AS BIGINT)]) AS s,
       to_json([count(*), count(*), count(*)]) AS c,
       to_json([CAST(min(n_nationkey) AS BIGINT),
                CAST(min(n_regionkey) AS BIGINT),
                CAST(min(n_nationkey % 5) AS BIGINT)]) AS mn,
       to_json([CAST(max(n_nationkey) AS BIGINT),
                CAST(max(n_regionkey) AS BIGINT),
                CAST(max(n_nationkey % 5) AS BIGINT)]) AS mx,
       to_json(list_transform(
         [round(avg(n_nationkey), 6), round(avg(n_regionkey), 6),
          round(avg(n_nationkey % 5), 6)],
         x -> printf('%.6f', x + 0.0))) AS av,
       CAST(sum(n_nationkey) AS BIGINT) AS so,
       CAST(NULL AS BIGINT) AS co
FROM nation GROUP BY n_regionkey
""")
def ch_dialect_demo10(spark, sf):
    """Round-7 aggregate combinators through ch_sql: -ForEach
    (element-wise array aggregation, [U]
    src/AggregateFunctions/AggregateFunctionForEach.h — collect_list
    fold with null-padding zip, ragged arrays extend like the
    reference) and -OrNull (NULL when nothing aggregated). The DuckDB
    oracle replays the fixed-width case element-by-element; ragged /
    null-element behavior is pinned in tests/test_ch_sql.py. Array
    outputs emitted as JSON strings (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.shapes import (
        json_arrays, json_double_arrays,
    )

    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    out = ch_sql(spark, """
        SELECT toInt64(n_regionkey) AS r,
               arrayMap(__x -> toInt64(__x),
                        sumForEach([n_nationkey, n_regionkey,
                                    n_nationkey % 5])) AS s,
               countForEach([n_nationkey, n_regionkey,
                             n_nationkey % 5]) AS c,
               arrayMap(__x -> toInt64(__x),
                        minForEach([n_nationkey, n_regionkey,
                                    n_nationkey % 5])) AS mn,
               arrayMap(__x -> toInt64(__x),
                        maxForEach([n_nationkey, n_regionkey,
                                    n_nationkey % 5])) AS mx,
               arrayMap(__x -> round(__x, 6),
                        avgForEach([n_nationkey, n_regionkey,
                                    n_nationkey % 5])) AS av,
               toInt64(sumOrNull(n_nationkey)) AS so,
               countOrNull(if(n_nationkey < 0, 1, NULL)) AS co
        FROM nation GROUP BY r""")
    return json_arrays(json_double_arrays(out, "av"), "s", "c", "mn", "mx")


@register("ch_dialect_demo11", oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS r,
       CAST(bit_and(n_nationkey) AS BIGINT) AS ba,
       CAST(bit_or(n_nationkey) AS BIGINT) AS bo,
       CAST(bit_xor(n_nationkey) AS BIGINT) AS bx,
       CAST(sum(n_nationkey) AS BIGINT) AS s,
       count(*) AS c,
       round(quantile_cont(CAST(n_nationkey AS DOUBLE), 0.5), 6) AS qd
FROM nation GROUP BY n_regionkey
""")
def ch_dialect_demo11(spark, sf):
    """Round-7 aggregate-name tail through ch_sql: groupBitAnd/Or/Xor
    (→ Spark BIT_AND/OR/XOR), sumCount (struct unpacked via
    tupleElement), quantileDeterministic (determinator drops —
    percentile_approx is already deterministic; accuracy high enough
    to be exact on 25 ints). uniqTheta is sketch-estimated —
    pytest-gated, not oracle-hashed."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    return ch_sql(spark, """
        SELECT toInt64(n_regionkey) AS r,
               toInt64(groupBitAnd(n_nationkey)) AS ba,
               toInt64(groupBitOr(n_nationkey)) AS bo,
               toInt64(groupBitXor(n_nationkey)) AS bx,
               toInt64(tupleElement(sumCount(n_nationkey), 'sum')) AS s,
               tupleElement(sumCount(n_nationkey), 'count') AS c,
               round(quantileDeterministic(toFloat64(n_nationkey),
                                           n_nationkey), 6) AS qd
        FROM nation GROUP BY r""")


@register("agg_combinator_stack", oracle="""
WITH m AS (
  SELECT n_regionkey AS r, n_nationkey AS n FROM nation),
me AS (                      -- sumMapIf entry replay (rows n > 0 only)
  SELECT r, key, CAST(sum(v) AS BIGINT) AS s
  FROM (SELECT r, 'k' AS key, n % 3 AS v FROM m WHERE n > 0
        UNION ALL
        SELECT r, 'g' || CAST(n % 2 AS VARCHAR) AS key, n AS v
        FROM m WHERE n > 0)
  GROUP BY r, key),
mm AS (
  SELECT r, list(key ORDER BY key) AS smk,
         list(s ORDER BY key) AS smv
  FROM me GROUP BY r),
ue AS (                      -- uniqExactArray replay (unnest both slots)
  SELECT r, CAST(count(DISTINCT v) AS BIGINT) AS uea
  FROM (SELECT r, n % 3 AS v FROM m
        UNION ALL SELECT r, n % 5 FROM m)
  GROUP BY r)
SELECT CAST(m.r AS BIGINT) AS r,
       CAST(sum(CASE WHEN n % 2 = 0 THEN n + (n % 7) END)
            AS BIGINT) AS sai,
       round(CAST(sum(n + (n % 7)) AS DOUBLE) / (2 * count(*)), 6) AS aa,
       CAST(count(DISTINCT CASE WHEN n > 2 THEN n % 4 END)
            AS BIGINT) AS cdi,
       any_value(ue.uea) AS uea,
       CAST(nullif(count(CASE WHEN n < 0 THEN 1 END), 0)
            AS BIGINT) AS cio,
       CAST(sum(DISTINCT CASE WHEN n > 1 THEN n % 5 END)
            AS BIGINT) AS sdi,
       to_json([CAST(sum(CASE WHEN n % 2 = 0 THEN n END) AS BIGINT),
                CAST(sum(CASE WHEN n % 2 = 0 THEN m.r * 2 END) AS BIGINT)])
         AS sfe,
       to_json(any_value(mm.smk)) AS smk,
       to_json(any_value(mm.smv)) AS smv
FROM m
LEFT JOIN mm ON mm.r = m.r
LEFT JOIN ue ON ue.r = m.r
GROUP BY m.r
""")
def agg_combinator_stack(spark, sf):
    """Round-8 generic combinator composition through ch_sql
    (_compose_combinators — suffix-peeling base+stack parser mirroring
    [U] src/AggregateFunctions/Combinators/): one representative per
    pairing class — -ArrayIf (sumArrayIf), -Array (avgArray),
    -DistinctIf (countDistinctIf, sumDistinctIf), -Array on uniqExact,
    -IfOrNull on nullary count, -ForEachIf, and -MapIf (sumMapIf,
    key-sorted, emitted as keys/values arrays). The DuckDB oracle
    replays each through independent unnest/CASE algebra: the map and
    uniqExactArray replays unnest in their own CTEs (joined back per
    group) so the main aggregate never sees duplicated rows. Array
    outputs emitted as JSON strings (shapes.py driver-gate note)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.shapes import json_arrays

    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    return json_arrays(ch_sql(spark, """
        SELECT toInt64(n_regionkey) AS r,
               toInt64(sumArrayIf([n_nationkey, n_nationkey % 7],
                                  n_nationkey % 2 = 0)) AS sai,
               round(avgArray([n_nationkey, n_nationkey % 7]), 6) AS aa,
               countDistinctIf(n_nationkey % 4, n_nationkey > 2) AS cdi,
               uniqExactArray([n_nationkey % 3, n_nationkey % 5]) AS uea,
               countIfOrNull(n_nationkey < 0) AS cio,
               toInt64(sumDistinctIf(n_nationkey % 5,
                                     n_nationkey > 1)) AS sdi,
               arrayMap(__x -> toInt64(__x),
                        sumForEachIf([n_nationkey, n_regionkey * 2],
                                     n_nationkey % 2 = 0)) AS sfe,
               map_keys(sumMapIf(
                   map('k', n_nationkey % 3,
                       concat('g', toString(n_nationkey % 2)),
                       n_nationkey),
                   n_nationkey > 0)) AS smk,
               arrayMap(__x -> toInt64(__x),
                        map_values(sumMapIf(
                            map('k', n_nationkey % 3,
                                concat('g', toString(n_nationkey % 2)),
                                n_nationkey),
                            n_nationkey > 0))) AS smv
        FROM nation GROUP BY r"""), "sfe", "smk", "smv")


@register("agg_parametric_if", oracle="""
WITH m AS (SELECT n_regionkey AS r, n_nationkey AS n FROM nation),
tk AS (
  SELECT r, (list(v ORDER BY c DESC, v))[1:2] AS topk
  FROM (SELECT r, n % 4 AS v, count(*) AS c FROM m GROUP BY r, n % 4)
  GROUP BY r),
tw AS (
  SELECT r, (list(v ORDER BY w DESC, v))[1:2] AS topw
  FROM (SELECT r, n % 4 AS v, sum(n) AS w FROM m WHERE n > 2
        GROUP BY r, n % 4)
  GROUP BY r)
SELECT CAST(m.r AS BIGINT) AS r,
       round(quantile_cont(CAST(n AS DOUBLE), 0.5)
             FILTER (n % 2 = 0), 6) AS q,
       CAST(least(count(DISTINCT CASE WHEN n > 10 THEN n % 7 END), 4)
            AS BIGINT) AS u,
       to_json(any_value(tk.topk)) AS topk,
       to_json(coalesce(any_value(tw.topw), CAST([] AS BIGINT[]))) AS topw
FROM m
LEFT JOIN tk ON tk.r = m.r
LEFT JOIN tw ON tw.r = m.r
GROUP BY m.r
""")
def agg_parametric_if(spark, sf):
    """Round-8: parametric aggregates compose with -If mechanically
    (quantileExactIf(0.5)(x, cond), topKIf, uniqUpToIf — the upstream
    combinator machinery over parametric names), plus the repaired
    exact topK / topKWeighted templates (the old MAP()-seed fold never
    type-checked and MAP_FROM_ARRAYS threw on duplicate values). Ties
    break on the value; DuckDB replays via count/weight-ordered list
    slices. Array outputs emitted as JSON strings (shapes.py
    driver-gate note)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.shapes import json_arrays

    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    return json_arrays(ch_sql(spark, """
        SELECT toInt64(n_regionkey) AS r,
               round(quantileExactIf(0.5)(toFloat64(n_nationkey),
                                          n_nationkey % 2 = 0), 6) AS q,
               uniqUpToIf(3)(n_nationkey % 7, n_nationkey > 10) AS u,
               arrayMap(__x -> toInt64(__x),
                        topK(2)(n_nationkey % 4)) AS topk,
               arrayMap(__x -> toInt64(__x),
                        topKWeightedIf(2)(n_nationkey % 4, n_nationkey,
                                          n_nationkey > 2)) AS topw
        FROM nation GROUP BY r"""), "topk", "topw")


@register("ch_sql_state_merge", oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS r,
       CAST(sum(n_nationkey) AS BIGINT) AS s,
       CAST(count(*) AS BIGINT) AS c,
       round(avg(n_nationkey), 6) AS a,
       CAST(count(DISTINCT n_nationkey % 7) AS BIGINT) AS ue,
       CAST(min(n_nationkey) AS BIGINT) AS mn
FROM nation GROUP BY n_regionkey
""")
def ch_sql_state_merge(spark, sf):
    """-State/-Merge as DIALECT SQL (round 8, [U]
    src/AggregateFunctions/Combinators/AggregateFunctionState.h):
    mechanical composition renders mergeable partials (exact partials,
    Datasketches binaries for the uniq family, raw collections for the
    array bases) and the merge finalizers; two-phase over an inner
    (region, nationkey%3) grouping must equal the one-phase aggregate
    — the DuckDB oracle IS the one-phase replay. The sketch bases'
    two-phase == one-phase invariant is pinned in
    tests/test_combinator_compose.py (lossless HLL union)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    return ch_sql(spark, """
        SELECT toInt64(r) AS r, toInt64(sumMerge(s)) AS s,
               countMerge(c) AS c, round(avgMerge(a), 6) AS a,
               uniqExactMerge(ue) AS ue, toInt64(minMerge(mn)) AS mn
        FROM (
          SELECT n_regionkey AS r, n_nationkey % 3 AS p,
                 sumState(n_nationkey) AS s, countState() AS c,
                 avgState(n_nationkey) AS a,
                 uniqExactState(n_nationkey % 7) AS ue,
                 minState(n_nationkey) AS mn
          FROM nation GROUP BY r, p) t
        GROUP BY r""")


@register("ch_sql_state_merge_parametric", oracle="""
SELECT CAST(l_returnflag AS VARCHAR) AS rf,
       round(quantile_cont(l_quantity, 0.5), 6) AS q50,
       round(quantile_cont(l_quantity, 0.9), 6) AS q90,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2)
           AS sum_open,
       count(DISTINCT l_suppkey % 512) AS bm
FROM lineitem GROUP BY l_returnflag
""")
def ch_sql_state_merge_parametric(spark, sf):
    """Parametric + structural -State/-Merge in dialect SQL (round 9,
    [U] src/AggregateFunctions/Combinators/AggregateFunctionState.h —
    quantileState/Merge is the canonical AggregatingMergeTree column
    type): quantileExactState keeps the raw collection and the merge
    readout linear-interpolates exactly like PERCENTILE / DuckDB
    quantile_cont, so the two-phase form over an inner
    (returnflag, linestatus) grouping hash-matches the one-phase
    oracle; sumIfState + groupBitmapState ride along. The KLL-backed
    quantileState/quantilesState (sketch states) are tolerance-gated in
    tests/test_combinator_compose.py."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return ch_sql(spark, """
        SELECT rf, round(quantileExactMerge(0.5)(q50), 6) AS q50,
               round(quantileExactMerge(0.9)(q90), 6) AS q90,
               round(sumMerge(so), 2) AS sum_open,
               groupBitmapMerge(bm) AS bm
        FROM (
          SELECT l_returnflag AS rf, l_linestatus AS ls,
                 quantileExactState(0.5)(l_quantity) AS q50,
                 quantileExactState(0.9)(l_quantity) AS q90,
                 sumIfState(l_extendedprice, l_linestatus = 'O') AS so,
                 groupBitmapState(l_suppkey % 512) AS bm
          FROM lineitem GROUP BY rf, ls) t
        GROUP BY rf""")


@register("ch_sql_state_merge_stored_insert", oracle="""
SELECT CAST(l_returnflag AS VARCHAR) AS rf,
       round(quantile_cont(l_quantity, 0.9), 6) AS q90,
       TRUE AS q90_sketch_ok,
       count(DISTINCT l_suppkey) AS uniq_supp,
       TRUE AS uniq_sketch_ok,
       round(sum(l_extendedprice), 2) AS sum_price,
       round(avg(l_discount), 6) AS avg_disc
FROM lineitem GROUP BY l_returnflag
""")
def ch_sql_state_merge_stored_insert(spark, sf):
    """AggregatingMergeTree STORAGE path end-to-end (round 10, [U]
    src/DataTypes/DataTypeAggregateFunction.cpp +
    src/AggregateFunctions/Combinators/AggregateFunctionState.h): a
    dialect CREATE TABLE with ``AggregateFunction(f, T)`` columns (typed
    to the -State renderings: KLL/HLL binaries, raw collections, struct
    partials — types_map._agg_state_type), a dialect INSERT ... SELECT
    of fState(...) partials that writes REAL sorted parquet files (the
    dataDir-backed MergeTree insert), and a SEPARATE statement reading
    the files back with fMerge(...). Exact bases (quantileExact, sum,
    avg, uniqExact) hash-match the one-phase oracle; the sketch columns
    (KLL quantileState, Datasketches uniqState) are gated by in-query
    relative-error invariants against their exact twins read from the
    same stored states."""
    import tempfile

    from clickhouse_clickhouse_spark.ch_sql import ch_sql, ch_statement

    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    ddir = tempfile.mkdtemp(prefix="agg_states_r10_")
    prev = spark.conf.get(
        "spark.clickhouse_clickhouse_spark.dataDir", "")
    spark.conf.set("spark.clickhouse_clickhouse_spark.dataDir", ddir)
    try:
        ch_statement(spark, """
            CREATE TABLE qstates_r10 (
                rf String, ls String,
                q90x AggregateFunction(quantileExact, Float64),
                q90k AggregateFunction(quantile(0.9), Float64),
                ux AggregateFunction(uniqExact, Int64),
                u AggregateFunction(uniq, Int64),
                s AggregateFunction(sum, Float64),
                a AggregateFunction(avg, Float64)
            ) ENGINE = AggregatingMergeTree ORDER BY rf""")
        ch_statement(spark, """
            INSERT INTO qstates_r10 SELECT
                l_returnflag, l_linestatus,
                quantileExactState(0.9)(l_quantity),
                quantileState(0.9)(l_quantity),
                uniqExactState(l_suppkey),
                uniqState(l_suppkey),
                sumState(l_extendedprice),
                avgState(l_discount)
            FROM lineitem GROUP BY l_returnflag, l_linestatus""")
    finally:
        spark.conf.set("spark.clickhouse_clickhouse_spark.dataDir", prev)
    return ch_sql(spark, """
        SELECT rf,
               round(quantileExactMerge(0.9)(q90x), 6) AS q90,
               abs(quantileMerge(0.9)(q90k)
                   - quantileExactMerge(0.9)(q90x))
                 / quantileExactMerge(0.9)(q90x) <= 0.10
                 AS q90_sketch_ok,
               uniqExactMerge(ux) AS uniq_supp,
               abs(uniqMerge(u) - uniqExactMerge(ux))
                 / uniqExactMerge(ux) <= 0.20 AS uniq_sketch_ok,
               round(sumMerge(s), 2) AS sum_price,
               round(avgMerge(a), 6) AS avg_disc
        FROM qstates_r10 GROUP BY rf""")


@register("ch_sql_stats_aggregates_r9", oracle="""
WITH base AS (SELECT event_id, user_id, value,
                     epoch(ts) AS tsec FROM events WHERE event_id < 800),
ds AS (SELECT sum(greatest(d, 0)) AS dst FROM (
         SELECT value - lag(value) OVER (ORDER BY tsec, event_id) AS d
         FROM base)),
mi AS (SELECT max(o) AS mx FROM (
         SELECT sum(d) OVER (ORDER BY t, d
                             ROWS UNBOUNDED PRECEDING) AS o
         FROM (SELECT value AS t, 1 AS d FROM base
               UNION ALL SELECT value + 3.0, -1 FROM base))),
rk AS (SELECT corr(arx, ary) AS rc FROM (
         SELECT rank() OVER (ORDER BY value)
                + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS arx,
                rank() OVER (ORDER BY user_id)
                + (count(*) OVER (PARTITION BY user_id) - 1) / 2.0 AS ary
         FROM base)),
qw AS (SELECT min(value) AS q FROM (
         SELECT value, sum(CAST(user_id % 5 + 1 AS BIGINT))
                       OVER (ORDER BY value) AS cum,
                (SELECT sum(CAST(user_id % 5 + 1 AS BIGINT))
                 FROM base) AS tw
         FROM base) WHERE cum >= 0.5 * tw),
agg AS (SELECT
  round(entropy(user_id % 10), 8) AS ent,
  round(skewness(value) * (count(*) - 2)
        / sqrt(count(*) * (count(*) - 1.0)), 8) AS skew_pop,
  round((kurtosis(value) * (count(*) - 2.0) * (count(*) - 3.0)
         / (count(*) + 1.0) / (count(*) - 1.0) - 6.0 / (count(*) + 1.0))
        + 3.0, 8) AS kurt_pop,
  round(regr_slope(value, CAST(event_id AS DOUBLE)), 8) AS slr_k,
  round(regr_intercept(value, CAST(event_id AS DOUBLE)), 8) AS slr_b
  FROM base)
SELECT agg.ent, agg.skew_pop, agg.kurt_pop, agg.slr_k, agg.slr_b,
       round(ds.dst, 6) AS dst, CAST(mi.mx AS INT) AS mi,
       round(rk.rc, 8) AS rank_corr, qw.q AS qew
FROM agg, ds, mi, rk, qw
""")
def ch_sql_stats_aggregates_r9(spark, sf):
    """Round-9 statistical aggregates in dialect SQL — entropy,
    skewPop/kurtPop, simpleLinearRegression, deltaSumTimestamp,
    maxIntersections, rankCorr, quantileExactWeighted — replayed
    value-exactly by DuckDB (native entropy/skewness/kurtosis with the
    G1/G2 -> population-moment conversions, window-based rank/ECDF/
    cumulative-weight formulations; fully independent renderings)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return ch_sql(spark, """
        SELECT round(entropy(user_id % 10), 8) AS ent,
               round(skewPop(value), 8) AS skew_pop,
               round(kurtPop(value), 8) AS kurt_pop,
               round(simpleLinearRegression(
                   CAST(event_id AS DOUBLE), value).k, 8) AS slr_k,
               round(simpleLinearRegression(
                   CAST(event_id AS DOUBLE), value).b, 8) AS slr_b,
               round(deltaSumTimestamp(value,
                   tuple(toUnixTimestamp(ts), event_id)), 6) AS dst,
               maxIntersections(value, value + 3.0) AS mi,
               round(rankCorr(value, CAST(user_id AS DOUBLE)), 8)
                   AS rank_corr,
               quantileExactWeighted(0.5)(value,
                   user_id % 5 + 1) AS qew
        FROM events WHERE event_id < 800""")


@register("ch_sql_ema", oracle="""
WITH e AS (
  SELECT user_id % 8 AS g,
         epoch_us(date_trunc('microseconds', ts)) / 1000000.0 AS sec,
         value
  FROM events WHERE event_id < 900),
m AS (SELECT g, max(sec) AS tm FROM e GROUP BY g)
SELECT e.g AS g,
       round(sum(value * pow(2.0, (sec - tm) / 3600.0))
             / sum(pow(2.0, (sec - tm) / 3600.0)), 8) AS ema_1h,
       round(sum(value * pow(2.0, (sec - tm) / 86400.0))
             / sum(pow(2.0, (sec - tm) / 86400.0)), 8) AS ema_1d
FROM e JOIN m ON e.g = m.g
GROUP BY e.g
""")
def ch_sql_ema(spark, sf):
    """Round-12 verdict item 2: deterministic
    exponentialMovingAverage(half_life)(value, time) in dialect SQL
    ([U] src/AggregateFunctions/AggregateFunctionExponentialMovingAverage.cpp
    — timestamped signature). Order-free closed form: every point's
    weight 2^((t - t_max)/hl) anchors to the group's latest time, so
    the decayed-sum / decayed-count ratio is shuffle-deterministic.
    DuckDB oracle renders the same closed form independently (group-max
    join + pow ratio)."""
    from clickhouse_clickhouse_spark.ch_sql import ch_sql

    load_table(spark, sf, "events").createOrReplaceTempView("ema_events")
    return ch_sql(spark, """
        SELECT user_id % 8 AS g,
               round(exponentialMovingAverage(3600)(value,
                   toUnixTimestamp64Micro(ts) / 1000000.0), 8) AS ema_1h,
               round(exponentialMovingAverage(86400)(value,
                   toUnixTimestamp64Micro(ts) / 1000000.0), 8) AS ema_1d
        FROM ema_events WHERE event_id < 900
        GROUP BY user_id % 8""")
