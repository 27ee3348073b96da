"""Aggregation-adjacent operators from the reference with no 1:1 Spark
primitive (SURVEY.md §2.4).

Spark's HashAggregateExec already does the two-phase partial→final merge,
spill and two-level parallelism the reference's ``Aggregator.cpp``
hand-implements — these helpers only add *semantics*.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def limit_by(df: DataFrame, n: int, by: Sequence[str],
             order_by: Sequence[Column | str], offset: int = 0) -> DataFrame:
    """``LIMIT n [OFFSET m] BY k`` — first n rows per key by an explicit
    order (reference ``LimitByTransform``). One window, one shuffle on the
    key; Spark pushes rank filters into the sort at scale."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*by).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + n))
            .drop("__rn"))


def top_k_per_group(df: DataFrame, k: int, by: Sequence[str],
                    value: Column | str, ascending: bool = False) -> DataFrame:
    """Exact ``topK`` per group — rank by value, keep k (reference
    ``topK(n)`` exact path)."""
    v = F.col(value) if isinstance(value, str) else value
    order = v.asc() if ascending else v.desc()
    return limit_by(df, k, by, [order])


def final_dedup(df: DataFrame, keys: Sequence[str],
                version: Column | str) -> DataFrame:
    """``FINAL`` / ReplacingMergeTree dedup-on-read: latest version per key
    wins (reference ``ReplacingSortedAlgorithm``; SURVEY.md §4.3 item 6).
    Equivalent to the background-merge result without waiting for one."""
    v = F.col(version) if isinstance(version, str) else version
    w = Window.partitionBy(*keys).orderBy(v.desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def map_combinator(df: DataFrame, keys: Sequence[str], map_col: str,
                   agg="sum", assemble: bool = True,
                   out_col: str | None = None) -> DataFrame:
    """Generic ``-Map`` combinator (reference ``AggregateFunctionMap.h``:
    any aggregate + ``Map`` suffix applies it element-wise per map key —
    sumMap/minMap/maxMap/avgMap/countMap...). Explode → re-aggregate on
    the composite (group keys, map key) → optionally reassemble a
    (key-sorted, deterministic) map.

    ``agg`` is a builtin name ('sum', 'min', 'max', 'avg', 'count') or
    any ``Column -> Column`` aggregate callable.

    Scale: explode multiplies rows by map cardinality but stays fully
    distributed; the re-agg is an ordinary partial/final hash agg.
    """
    fns = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
           "count": F.count}
    fn = fns[agg] if isinstance(agg, str) else agg
    name = agg if isinstance(agg, str) else "agg"
    out_col = out_col or f"{name}_{map_col}"
    exploded = df.select(*keys, F.explode(F.col(map_col)).alias("__k", "__v"))
    agged = exploded.groupBy(*keys, "__k").agg(fn(F.col("__v")).alias("__v"))
    if not assemble:
        return (agged.withColumnRenamed("__k", "map_key")
                .withColumnRenamed("__v", "map_value"))
    return agged.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("__k"), F.col("__v"))))
        ).alias(out_col))


def sum_map(df: DataFrame, keys: Sequence[str], map_col: str,
            assemble: bool = True) -> DataFrame:
    """``sumMap`` (reference ``AggregateFunctionSumMap``) — the ``sum``
    instance of :func:`map_combinator`."""
    return map_combinator(df, keys, map_col, "sum", assemble,
                          out_col=f"sum_{map_col}")


def with_totals(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """``GROUP BY ... WITH TOTALS`` (reference ``TotalsHavingTransform``):
    grouped rows plus one grand-total row with NULL keys. Implemented as a
    zero-key rollup restricted to the two interesting grouping sets —
    Spark computes both in one pass."""
    grouped = df.rollup(*keys).agg(
        *[c.alias(n) for n, c in aggs.items()],
        F.grouping_id(*keys).alias("__gid"))
    full = (1 << len(keys)) - 1
    return (grouped.filter((F.col("__gid") == 0) | (F.col("__gid") == full))
            .drop("__gid"))


def histogram(df: DataFrame, value: Column | str, lo: float, hi: float,
              nbuckets: int) -> DataFrame:
    """``histogram(n)`` — fixed-bound equi-width histogram as
    (bucket, lo, hi, count) rows. The reference's adaptive histogram is
    presentation-oriented; fixed bounds keep the result deterministic and
    oracle-checkable. Single hash agg, fully distributed."""
    v = (F.col(value) if isinstance(value, str) else value).cast("double")
    width = (hi - lo) / nbuckets
    bucket = F.least(F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
                     F.lit(nbuckets - 1)).cast("int")
    return (df.filter(v.isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("bucket_lo", F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6))
            .withColumn("bucket_hi", F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6)))


def delta_sum(df: DataFrame, keys: Sequence[str], order_by: Column | str,
              value: Column | str) -> DataFrame:
    """``deltaSum`` — sum of positive deltas of consecutive values in order
    (reference ``AggregateFunctionDeltaSum``): window lag diff + clamp + sum."""
    v = F.col(value) if isinstance(value, str) else value
    o = F.col(order_by) if isinstance(order_by, str) else order_by
    w = Window.partitionBy(*keys).orderBy(o)
    diff = v - F.lag(v).over(w)
    return (df.withColumn("__d", F.when(diff > 0, diff).otherwise(F.lit(0.0)))
            .groupBy(*keys)
            .agg(F.round(F.sum("__d"), 6).alias("delta_sum")))


def quantile_exact_pick(df: DataFrame, keys: Sequence[str], value: str,
                        qs: dict[str, tuple[float, str]]) -> DataFrame:
    """quantileExactLow / quantileExactHigh (reference
    AggregateFunctionQuantileExact variants): the EXACT element at index
    floor(q*(n-1)) ('low') or ceil(q*(n-1)) ('high') of the sorted
    per-group values — element picks, not interpolation (contrast
    Spark's ``percentile``).

    ``qs`` maps output column name -> (q, 'low'|'high'). Distributed
    form: rank every row once with a window, then one conditional-max
    agg per requested quantile — no per-group collect, so group size is
    unbounded. One shuffle (window and agg share the key partitioning).
    """
    w = Window.partitionBy(*keys).orderBy(value)
    wn = Window.partitionBy(*keys)
    r = (df.select(*keys, value)
         .withColumn("__rn", F.row_number().over(w))
         .withColumn("__n", F.count("*").over(wn)))
    aggs = []
    for out, (q, variant) in qs.items():
        idx = F.floor(F.lit(q) * (F.col("__n") - 1)) if variant == "low" \
            else F.ceil(F.lit(q) * (F.col("__n") - 1))
        aggs.append(F.max(F.when(F.col("__rn") - 1 == idx,
                                 F.col(value))).alias(out))
    return r.groupBy(*keys).agg(*aggs)


def group_array_moving(df: DataFrame, keys: Sequence[str],
                       order_by: Sequence[str], value: str, k: int,
                       kind: str = "sum", decimals: int = 6) -> DataFrame:
    """``groupArrayMovingSum(k)`` / ``groupArrayMovingAvg(k)`` (reference
    AggregateFunctionGroupArrayMoving): per key, the ordered array of
    window-``k`` moving sums (or averages) of ``value``.

    One window pass computes the per-row moving aggregate; collect_list
    of (order, value) structs + array_sort makes the array order
    deterministic regardless of shuffle arrival order. Array length per
    group is the group's row count — callers should bound group size (it
    is an array-returning aggregate in the reference, too).

    ``avg`` divides by the window size ``k`` unconditionally — leading
    elements are sum/k, matching the reference groupArrayMovingAvg
    (NOT a least(count, k) partial-window average). Deviation kept: the
    reference integer-truncates the avg for integer inputs; this always
    returns the real quotient (cast the result to reproduce that)."""
    w = (Window.partitionBy(*keys).orderBy(*order_by)
         .rowsBetween(-(k - 1), 0))
    mv = F.sum(F.col(value)).over(w)
    if kind == "avg":
        mv = mv / F.lit(k)
    d = df.withColumn("__mv", F.round(mv, decimals))
    pack = F.struct(*[F.col(c) for c in order_by], F.col("__mv"))
    return (d.groupBy(*keys)
            .agg(F.transform(F.array_sort(F.collect_list(pack)),
                             lambda s: s["__mv"])
                 .alias(f"moving_{kind}s")))


def group_array_intersect(df: DataFrame, keys: Sequence[str],
                          arr_col: str, out: str = "common") -> DataFrame:
    """``groupArrayIntersect`` (upstream
    AggregateFunctionGroupArrayIntersect.cpp): per group, the
    intersection of all array values. One hash aggregation collects the
    group's arrays (bounded by group size), then an ``array_intersect``
    fold — a JVM higher-order expression — reduces them; sorted output
    for deterministic comparison."""
    collected = df.groupBy(*keys).agg(F.collect_list(arr_col).alias("__a"))
    folded = F.aggregate(
        F.slice(F.col("__a"), 2, 1 << 30),
        F.element_at(F.col("__a"), 1),
        lambda acc, x: F.array_intersect(acc, x))
    return collected.select(*keys, F.array_sort(folded).alias(out))


def group_array_insert_at(df: DataFrame, keys: Sequence[str],
                          value: str, pos: str, size: int,
                          default: object = "", out: str = "arr"
                          ) -> DataFrame:
    """``groupArrayInsertAt(default, size)(value, pos)``: per group, an
    array of ``size`` slots with each value placed at its position
    (minimum value wins on duplicate positions — deterministic, where
    the reference keeps an arbitrary "first"), empty slots filled with
    ``default``. Two hash aggregations (slot dedup, then the map build)
    and a constant-length transform."""
    slot = (df.filter((F.col(pos) >= 0) & (F.col(pos) < size))
            .groupBy(*keys, F.col(pos).alias("__k"))
            .agg(F.min(F.col(value)).alias("__v")))
    g = slot.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("__k", "__v")))
        .alias("__m"))
    fill = F.transform(
        F.sequence(F.lit(0), F.lit(size - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(default)))
    return g.select(*keys, fill.alias(out))


def sparkbar(df: DataFrame, keys: Sequence[str], x: str, y: str,
             buckets: int = 8, out: str = "bar") -> DataFrame:
    """``sparkbar(width)(x, y)``: per group, a block-character histogram
    string — the group's x range condensed into ``buckets`` equi-width
    segments, each segment's y total scaled to the eight block glyphs
    (▁▂▃▄▅▆▇█; AggregateFunctionSparkbar.cpp).

    Bucket index = floor((x - xmin) · buckets / (xmax - xmin + 1)) —
    the integer-range condensation the reference uses; when the x range
    already has ≤ ``buckets`` distinct integer positions the mapping is
    the identity. Empty segments render as a space. A per-group min/max
    aggregation (broadcast back on the group keys) plus two hash
    aggregations — no windows, no driver."""
    blocks = "▁▂▃▄▅▆▇█"
    xc = F.col(x).cast("double")
    span = (df.groupBy(*keys)
            .agg(F.min(xc).alias("__xlo"), F.max(xc).alias("__xhi")))
    d = df.join(F.broadcast(span), list(keys))
    idx = F.when(
        F.col("__xhi") == F.col("__xlo"), F.lit(0)
    ).otherwise(
        F.least(F.lit(buckets - 1),
                F.floor((xc - F.col("__xlo")) * buckets
                        / (F.col("__xhi") - F.col("__xlo") + 1))
                .cast("int")))
    b = d.groupBy(*keys, idx.alias("__b")) \
         .agg(F.sum(F.col(y)).alias("__s"))
    agg = b.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__s")))
        .alias("__m"),
        F.max("__s").alias("__mx"))
    glyph = lambda i: F.when(  # noqa: E731
        F.element_at(F.col("__m"), i).isNull(), F.lit(" ")
    ).otherwise(F.substring(
        F.lit(blocks),
        F.greatest(F.lit(1), F.least(F.lit(8),
                   F.ceil(F.element_at(F.col("__m"), i)
                          / F.col("__mx") * 8).cast("int"))), 1))
    return agg.select(
        *keys,
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(buckets - 1)), glyph),
            "").alias(out))


def quantile_timing(df: DataFrame, keys: Sequence[str], value: str,
                    qs: dict[str, float]) -> DataFrame:
    """``quantileTiming`` (reference AggregateFunctionsQuantileTiming:
    the web-latency quantile with a fixed quantization grid): values are
    clamped to [0, 30000] and stored as integers — exact below 1024 ms,
    16 ms-wide buckets from 1024 to 30000, everything above pinned at
    30000. The result is the nearest-rank pick over the quantized
    multiset: the first value whose cumulative count exceeds
    floor(level * N) (upstream's accumulation loop).

    ``qs`` maps output column name -> level. Distributed form mirrors
    quantile_exact_pick: quantize per row (pure expressions), rank with
    one window, conditional-min per level — one shuffle, unbounded group
    size, no collect."""
    v = F.col(value).cast("double")
    quant = (F.when(v < 0, F.lit(0))
             .when(v >= 30000, F.lit(30000))
             .when(v >= 1024, (F.floor(v / 16) * 16).cast("long"))
             .otherwise(F.floor(v).cast("long")))
    w = Window.partitionBy(*keys).orderBy("__q")
    wn = Window.partitionBy(*keys)
    r = (df.select(*keys, quant.alias("__q"))
         .withColumn("__rn", F.row_number().over(w))
         .withColumn("__n", F.count("*").over(wn)))
    aggs = []
    for out, level in qs.items():
        pos = F.floor(F.lit(float(level)) * F.col("__n")) + 1
        aggs.append(F.min(F.when(F.col("__rn") >= pos, F.col("__q")))
                    .alias(out))
    return r.groupBy(*keys).agg(*aggs)


def quantile_timing_weighted(df: DataFrame, keys: Sequence[str],
                             value: str, weight: str,
                             qs: dict[str, float]) -> DataFrame:
    """``quantileTimingWeighted`` (reference twin of
    :func:`quantile_timing` with integer repeat-count weights): the same
    quantization grid, nearest-rank over the weight-expanded multiset —
    first value whose CUMULATIVE WEIGHT exceeds floor(level * W). The
    running weight is a window prefix sum (no expansion of the
    multiset)."""
    v = F.col(value).cast("double")
    quant = (F.when(v < 0, F.lit(0))
             .when(v >= 30000, F.lit(30000))
             .when(v >= 1024, (F.floor(v / 16) * 16).cast("long"))
             .otherwise(F.floor(v).cast("long")))
    wsum = Window.partitionBy(*keys).orderBy("__q") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy(*keys)
    r = (df.select(*keys, quant.alias("__q"),
                   F.col(weight).cast("long").alias("__w"))
         .withColumn("__cw", F.sum("__w").over(wsum))
         .withColumn("__wtot", F.sum("__w").over(wn)))
    aggs = []
    for out, level in qs.items():
        pos = F.floor(F.lit(float(level)) * F.col("__wtot")) + 1
        aggs.append(F.min(F.when(F.col("__cw") >= pos, F.col("__q")))
                    .alias(out))
    return r.groupBy(*keys).agg(*aggs)

