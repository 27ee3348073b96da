"""Advanced aggregate operators from the reference with no Spark builtin
(SURVEY.md §2.4: exponentialMovingAverage, maxIntersections,
intervalLengthSum, entropy, anyHeavy/mode, statistical tests).

All are DataFrame compositions: windows + hash aggs, no Python UDFs.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ema(df: DataFrame, keys: Sequence[str], order_by: Column | str,
        value: Column | str, alpha: float) -> DataFrame:
    """Index-based exponential moving average over each key's ordered
    series (reference ``exponentialMovingAverage``): the final EMA value
    per key via the closed form

        ema_N = v_1 (1-a)^(N-1) + a * sum_{i=2..N} v_i (1-a)^(N-i)

    One window for row numbers + one agg; weights computed JVM-side.
    """
    o = F.col(order_by) if isinstance(order_by, str) else order_by
    v = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*keys).orderBy(o)
    rn = F.row_number().over(w)
    d = df.withColumn("__rn", rn).withColumn("__v", v)
    d = d.withColumn("__n", F.max("__rn").over(Window.partitionBy(*keys)))
    weight = F.pow(F.lit(1 - alpha), F.col("__n") - F.col("__rn")) * \
        F.when(F.col("__rn") == 1, F.lit(1.0)).otherwise(F.lit(alpha))
    return (d.groupBy(*keys)
            .agg(F.round(F.sum(F.col("__v") * weight), 6).alias("ema")))


def max_intersections(df: DataFrame, keys: Sequence[str],
                      start: Column | str, end: Column | str) -> DataFrame:
    """``maxIntersections``: maximum number of simultaneously open
    intervals per key (end exclusive). Event-sweep: explode each interval
    to (+1 at start, −1 at end), order by (t, delta), running sum, max.
    One explode (2× rows) + one window — scales as a sort per key."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    events = df.select(
        *keys,
        F.explode(F.array(
            F.struct(s.cast("double").alias("t"), F.lit(1).alias("d")),
            F.struct(e.cast("double").alias("t"), F.lit(-1).alias("d")),
        )).alias("ev"))
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("ev.t"), F.col("ev.d"))
         .rowsBetween(Window.unboundedPreceding, 0))
    running = events.withColumn("__open", F.sum("ev.d").over(w))
    return running.groupBy(*keys).agg(F.max("__open").alias("max_intersections"))


def interval_length_sum(df: DataFrame, keys: Sequence[str],
                        start: Column | str, end: Column | str) -> DataFrame:
    """``intervalLengthSum``: total length of the UNION of intervals per
    key (overlaps counted once). Sort by start; each interval contributes
    max(0, end − max(start, max-prev-end)); running max via a lagged
    window. One shuffle per key."""
    s = (F.col(start) if isinstance(start, str) else start).cast("double")
    e = (F.col(end) if isinstance(end, str) else end).cast("double")
    d = df.select(*keys, s.alias("__s"), e.alias("__e"))
    w = Window.partitionBy(*keys).orderBy("__s", "__e")
    d = d.withColumn("__pme", F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    contrib = F.greatest(
        F.lit(0.0),
        F.col("__e") - F.greatest(F.col("__s"), F.coalesce(F.col("__pme"),
                                                           F.col("__s"))))
    return (d.withColumn("__c", contrib)
            .groupBy(*keys)
            .agg(F.round(F.sum("__c"), 6).alias("interval_length_sum")))


def entropy(df: DataFrame, keys: Sequence[str], value: Column | str) -> DataFrame:
    """Shannon entropy (bits) of the value distribution per key
    (reference ``entropy``): two-level agg — counts per (key, value), then
    −Σ p·log2 p."""
    v = F.col(value) if isinstance(value, str) else value
    counts = df.groupBy(*keys, v.alias("__v")).agg(F.count("*").alias("__c"))
    totals = counts.groupBy(*keys).agg(F.sum("__c").alias("__t"))
    j = counts.join(totals, list(keys))
    p = F.col("__c") / F.col("__t")
    return (j.groupBy(*keys)
            .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy")))


def mode(df: DataFrame, keys: Sequence[str], value: Column | str) -> DataFrame:
    """Most frequent value per key (reference ``anyHeavy``/``topK(1)``
    exact): counts + deterministic rank (count desc, value asc)."""
    v = F.col(value) if isinstance(value, str) else value
    counts = df.groupBy(*keys, v.alias("mode_value")).agg(F.count("*").alias("__c"))
    w = Window.partitionBy(*keys).orderBy(F.col("__c").desc(),
                                          F.col("mode_value").asc())
    return (counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*keys, "mode_value", F.col("__c").alias("mode_count")))


def welch_t_statistic(df: DataFrame, value: Column | str,
                      group: Column | str, group_a, group_b) -> DataFrame:
    """Welch's t statistic between two groups (reference ``welchTTest``
    returns (t, p); we emit t — the p-value needs the t CDF, out of DF
    scope). t = (m_a − m_b) / sqrt(s²_a/n_a + s²_b/n_b)."""
    v = F.col(value) if isinstance(value, str) else value
    g = F.col(group) if isinstance(group, str) else group
    stats = (df.filter(g.isin([group_a, group_b]))
             .groupBy(g.alias("__g"))
             .agg(F.avg(v).alias("m"), F.var_samp(v).alias("s2"),
                  F.count("*").alias("n")))
    a = stats.filter(F.col("__g") == group_a)
    b = stats.filter(F.col("__g") == group_b)
    j = a.crossJoin(b.select(F.col("m").alias("mb"), F.col("s2").alias("s2b"),
                             F.col("n").alias("nb")))
    t = (F.col("m") - F.col("mb")) / \
        F.sqrt(F.col("s2") / F.col("n") + F.col("s2b") / F.col("nb"))
    return j.select(F.round(t, 6).alias("t_statistic"))


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cramér's V association between two categorical columns (reference
    ``cramersV``): χ² from observed vs expected cell counts, normalized by
    n·min(r−1, c−1). Pure joins of marginal aggregates."""
    obs = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    ra = df.groupBy(col_a).agg(F.count("*").alias("ra"))
    rb = df.groupBy(col_b).agg(F.count("*").alias("rb"))
    n = df.count()  # scalar dimensionality constant, not data motion
    r = df.select(col_a).distinct().count()
    c = df.select(col_b).distinct().count()
    j = obs.join(ra, col_a).join(rb, col_b)
    e = F.col("ra") * F.col("rb") / F.lit(float(n))
    chi2 = F.sum(F.pow(F.col("o") - e, 2) / e)
    denom = float(n * min(r - 1, c - 1))
    return j.agg(F.round(F.sqrt(chi2 / F.lit(denom)), 6).alias("cramers_v"))


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (reference ``greatCircleDistance``,
    haversine form) — pure trigonometric expressions."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) ** 2 + \
        F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) ** 2
    return F.lit(2 * 6371.0) * F.asin(F.sqrt(a))


def rank_corr(df: DataFrame, keys: Sequence[str], x: str, y: str,
              out: str = "rank_corr") -> DataFrame:
    """Spearman rank correlation per key (reference ``rankCorr``,
    AggregateFunctionRankCorrelation.h): fractional (average) ranks for
    ties — rank() gives 1 + #strictly-smaller; adding (tie_count − 1)/2
    yields the midrank — then Pearson correlation of the two rank
    columns. Two window sorts + one hash agg; no Python."""
    wx = Window.partitionBy(*keys).orderBy(F.col(x))
    wy = Window.partitionBy(*keys).orderBy(F.col(y))
    tx = Window.partitionBy(*keys, x)
    ty = Window.partitionBy(*keys, y)
    rx = F.rank().over(wx) + (F.count("*").over(tx) - 1) / 2.0
    ry = F.rank().over(wy) + (F.count("*").over(ty) - 1) / 2.0
    d = df.select(*keys, F.col(x), F.col(y)) \
          .withColumn("__rx", rx).withColumn("__ry", ry)
    return (d.groupBy(*keys)
            .agg(F.round(F.corr("__rx", "__ry"), 6).alias(out)))


def student_t_statistic(df: DataFrame, value: Column | str,
                        group: Column | str, group_a, group_b) -> DataFrame:
    """Student's (pooled-variance) t statistic between two groups
    (reference ``studentTTest``): sp² = ((n_a−1)s²_a + (n_b−1)s²_b) /
    (n_a+n_b−2); t = (m_a − m_b) / (sp·sqrt(1/n_a + 1/n_b)). Same
    two-scalar-agg shape as :func:`welch_t_statistic`; p-value needs the
    t CDF (out of DF scope, documented)."""
    v = F.col(value) if isinstance(value, str) else value
    g = F.col(group) if isinstance(group, str) else group
    stats = (df.filter(g.isin([group_a, group_b]))
             .groupBy(g.alias("__g"))
             .agg(F.avg(v).alias("m"), F.var_samp(v).alias("s2"),
                  F.count("*").alias("n")))
    a = stats.filter(F.col("__g") == group_a)
    b = stats.filter(F.col("__g") == group_b)
    j = a.crossJoin(b.select(F.col("m").alias("mb"), F.col("s2").alias("s2b"),
                             F.col("n").alias("nb")))
    sp2 = ((F.col("n") - 1) * F.col("s2") + (F.col("nb") - 1) * F.col("s2b")) \
        / (F.col("n") + F.col("nb") - 2)
    t = (F.col("m") - F.col("mb")) / \
        F.sqrt(sp2 * (1 / F.col("n") + 1 / F.col("nb")))
    return j.select(F.round(t, 6).alias("t_statistic"))


def contingency(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Contingency coefficient between two categorical columns (reference
    ``contingency``, AggregateFunctionContingencyCoefficient):
    sqrt(χ² / (χ² + n)) — same observed-vs-expected join as
    :func:`cramers_v` with a different normalization."""
    obs = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    ra = df.groupBy(col_a).agg(F.count("*").alias("ra"))
    rb = df.groupBy(col_b).agg(F.count("*").alias("rb"))
    n = df.count()  # scalar dimensionality constant, not data motion
    j = obs.join(ra, col_a).join(rb, col_b)
    e = F.col("ra") * F.col("rb") / F.lit(float(n))
    chi2 = F.sum(F.pow(F.col("o") - e, 2) / e)
    return j.agg(F.round(F.sqrt(chi2 / (chi2 + F.lit(float(n)))), 6)
                 .alias("contingency"))


def exp_time_decayed_sum(df: DataFrame, keys: Sequence[str], ts: str,
                         value: Column | str, tau_seconds: float,
                         tiebreak: str | None = None) -> DataFrame:
    """Per-row exponentially time-decayed sum over each key's ordered
    series (reference window function ``exponentialTimeDecayedSum``):

        S(t) = Σ_{t_i ≤ t} v_i · exp(−(t − t_i)/τ)

    Computed in O(n log n) instead of O(n²) via the algebraic split
    S(t) = exp(−(t−t_e)/τ) · Σ v_i·exp((t_i−t_e)/τ), with the anchor t_e
    renormalized *piecewise*: rows are segmented into epochs of length
    C·τ (C = 500 < 709, the double-exp overflow bound), each epoch runs
    its own anchored running sum, and mass from the previous epoch is
    carried across the boundary with a bounded rescale
    exp(−gap·C) — so a key whose time span is ≫ 709·τ (the overflow trap
    of a single min-anchored pass) stays finite.

    Double-precision exactness note: epochs ≥ 2 steps back contribute a
    relative factor ≤ exp(−C) ≈ 7e−218, below double resolution for any
    |Σv| < 1e190 — carrying only the adjacent epoch's total is therefore
    exact in IEEE754, and keys spanning < C·τ reproduce the single-anchor
    arithmetic bit-for-bit (everything lands in epoch 0 with zero carry).
    Adds column ``decayed_sum``; caller aggregates/filters."""
    C = 500.0
    seg = C * tau_seconds
    v = F.col(value) if isinstance(value, str) else value
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    sec = F.col(ts).cast("double")  # fractional epoch seconds (µs kept)
    t0 = F.min(sec).over(Window.partitionBy(*keys))
    d = (df.withColumn("__dt", sec - t0)
           .withColumn("__ep", F.floor(F.col("__dt") / seg))
           .withColumn("__dtl", F.col("__dt") - F.col("__ep") * seg))
    w = (Window.partitionBy(*keys, "__ep").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    d = d.withColumn("__run", F.sum(v * F.exp(F.col("__dtl") / tau_seconds))
                     .over(w))
    # per-(key, epoch) totals -> carry-in from the adjacent earlier epoch
    # (summed from the addends, not max(__run): values may be negative)
    totals = (d.groupBy(*keys, "__ep")
              .agg(F.sum(v * F.exp(F.col("__dtl") / tau_seconds))
                   .alias("__tot")))
    wk = Window.partitionBy(*keys).orderBy("__ep")
    carries = totals.select(
        *keys, "__ep",
        F.coalesce(
            F.lag("__tot").over(wk)
            * F.exp((F.lag("__ep").over(wk) - F.col("__ep")) * C),
            F.lit(0.0)).alias("__carry"))
    d = d.join(carries, [*keys, "__ep"])
    return (d.withColumn(
                "decayed_sum",
                (F.col("__run") + F.col("__carry"))
                * F.exp(-F.col("__dtl") / tau_seconds))
            .drop("__dt", "__ep", "__dtl", "__run", "__carry"))


def ipv4_num_to_string(n: Column) -> Column:
    """``IPv4NumToString``: uint32 → dotted quad, integer arithmetic only."""
    return F.concat_ws(
        ".",
        ((n / 16777216).cast("long") % 256).cast("string"),
        ((n / 65536).cast("long") % 256).cast("string"),
        ((n / 256).cast("long") % 256).cast("string"),
        (n % 256).cast("string"))


def ipv4_string_to_num(s: Column) -> Column:
    """``IPv4StringToNum``: dotted quad → uint32."""
    parts = F.split(s, r"\.")
    return (parts.getItem(0).cast("long") * 16777216 +
            parts.getItem(1).cast("long") * 65536 +
            parts.getItem(2).cast("long") * 256 +
            parts.getItem(3).cast("long"))


def anova_f(df: DataFrame, group_col: str, value: Column | str) -> DataFrame:
    """One-way ANOVA (reference ``analysisOfVariance``/``anova``): the
    between/within-group F statistic, computed as two chained hash
    aggregations (per-group moments, then global combine) — no window,
    no driver math. Returns one row: (f_stat, df_between, df_within).

    p-values need the F-distribution CDF (out of DataFrame scope, as
    with the t-tests — documented in SURVEY §2.4 notes).
    """
    v = (F.col(value) if isinstance(value, str) else value).cast("double")
    g = (df.filter(v.isNotNull())
         .groupBy(group_col)
         .agg(F.count("*").alias("n_g"), F.avg(v).alias("mean_g"),
              # within-group sum of squares via the moment identity
              (F.sum(v * v) - F.count("*") * F.avg(v) * F.avg(v))
              .alias("ssw_g")))
    return (g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        (F.sum(F.col("n_g") * F.col("mean_g")) / F.sum("n_g")).alias("gm"),
        F.sum("ssw_g").alias("ssw"),
        F.sum(F.col("n_g") * F.col("mean_g") * F.col("mean_g")).alias("s2w"))
        .select(
            F.round(((F.col("s2w") - F.col("n") * F.col("gm") * F.col("gm"))
                     / (F.col("k") - 1))
                    / (F.col("ssw") / (F.col("n") - F.col("k"))), 6)
            .alias("f_stat"),
            (F.col("k") - 1).cast("long").alias("df_between"),
            (F.col("n") - F.col("k")).cast("long").alias("df_within")))


def tukey_outliers(df: DataFrame, keys: Sequence[str], value: Column | str,
                   k: float = 1.5) -> DataFrame:
    """Tukey-fence outlier profile per key group (reference
    ``seriesOutliersDetectTukey``, the q1/q3 ± k*IQR rule; this
    relational form returns per-group fences + outlier counts rather
    than the reference's per-point score array — the per-point flags are
    the broadcast-join of this result back onto the rows, demonstrated
    in the registered query's oracle).

    Two hash aggregations: exact interpolated quartiles per group
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, both type-7), then
    a broadcast join back for the flag count. No window, no sort of the
    full data.
    """
    v = (F.col(value) if isinstance(value, str) else value).cast("double")
    keys = list(keys)
    # round 14: one array-percentile buffer for both quartiles
    # (bit-identical to two separate percentile aggregates)
    fences = (df.filter(v.isNotNull()).groupBy(*keys)
              .agg(F.percentile(v, F.array(F.lit(0.25), F.lit(0.75)))
                   .alias("__q"))
              .select(*keys,
                      F.element_at("__q", 1).alias("q1"),
                      F.element_at("__q", 2).alias("q3")))
    fences = fences.select(
        *keys,
        F.round("q1", 6).alias("q1"), F.round("q3", 6).alias("q3"),
        F.round(F.col("q1") - k * (F.col("q3") - F.col("q1")), 6).alias("lo"),
        F.round(F.col("q3") + k * (F.col("q3") - F.col("q1")), 6).alias("hi"))
    joined = df.filter(v.isNotNull()).join(F.broadcast(fences), keys)
    return (joined.groupBy(*keys)
            .agg(F.any_value(F.col("q1")).alias("q1"),
                 F.any_value(F.col("q3")).alias("q3"),
                 F.any_value(F.col("lo")).alias("lo"),
                 F.any_value(F.col("hi")).alias("hi"),
                 F.count("*").alias("n"),
                 F.count_if((v < F.col("lo")) | (v > F.col("hi")))
                 .alias("n_outliers")))


def exp_time_decayed_count(df: DataFrame, keys: Sequence[str], ts: str,
                           tau_seconds: float,
                           tiebreak: str | None = None) -> DataFrame:
    """``exponentialTimeDecayedCount``: the decayed-sum machinery with
    v ≡ 1 (same piecewise renormalization, same overflow safety). Adds
    ``decayed_count``."""
    out = exp_time_decayed_sum(df.withColumn("__one", F.lit(1.0)), keys,
                               ts, "__one", tau_seconds, tiebreak=tiebreak)
    return (out.withColumnRenamed("decayed_sum", "decayed_count")
            .drop("__one"))


def exp_time_decayed_avg(df: DataFrame, keys: Sequence[str], ts: str,
                         value: Column | str, tau_seconds: float,
                         tiebreak: str | None = None) -> DataFrame:
    """``exponentialTimeDecayedAvg`` = decayed sum / decayed count (the
    reference's definition). Adds ``decayed_avg``."""
    s = exp_time_decayed_sum(df, keys, ts, value, tau_seconds,
                             tiebreak=tiebreak) \
        .withColumnRenamed("decayed_sum", "__ds")
    sc = exp_time_decayed_count(s, keys, ts, tau_seconds,
                                tiebreak=tiebreak)
    return (sc.withColumn("decayed_avg",
                          F.col("__ds") / F.col("decayed_count"))
            .withColumnRenamed("__ds", "decayed_sum"))


def exp_time_decayed_max(df: DataFrame, keys: Sequence[str], ts: str,
                         value: Column | str, tau_seconds: float,
                         tiebreak: str | None = None) -> DataFrame:
    """``exponentialTimeDecayedMax``: max over i≤t of v_i·exp(−(t−t_i)/τ).

    Same epoch decomposition as the sum: within an epoch the anchored
    running max of v_i·exp(dtl_i/τ) is order-preserving under the
    common positive rescale exp(−dtl/τ); across the boundary only the
    ADJACENT previous epoch is carried (lag of its anchored max,
    rescaled by exp(−C)) — anything older contributes a relative factor
    ≤ exp(−C) ≈ 7e−218, below double resolution, exactly the sum's
    carry argument. Adds ``decayed_max``."""
    import math

    C = 500.0
    seg = C * tau_seconds
    v = (F.col(value) if isinstance(value, str) else value).cast("double")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    sec = F.col(ts).cast("double")
    t0 = F.min(sec).over(Window.partitionBy(*keys))
    d = (df.withColumn("__dt", sec - t0)
         .withColumn("__ep", F.floor(F.col("__dt") / seg))
         .withColumn("__dtl", F.col("__dt") - F.col("__ep") * seg))
    term = v * F.exp(F.col("__dtl") / tau_seconds)
    w = (Window.partitionBy(*(list(keys) + ["__ep"])).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    d = d.withColumn("__run", F.max(term).over(w))
    ep_tot = (d.groupBy(*keys, "__ep")
              .agg(F.max(term).alias("__ep_max")))
    wlag = Window.partitionBy(*keys).orderBy("__ep")
    prev = (ep_tot
            .withColumn("__pm", F.lag("__ep_max").over(wlag))
            .withColumn("__pe", F.lag("__ep").over(wlag))
            .withColumn("__carry",
                        F.when(F.col("__pe") == F.col("__ep") - 1,
                               F.col("__pm") * math.exp(-C)))
            .select(*keys, "__ep", "__carry"))
    d = (d.join(prev, [*keys, "__ep"], "left")
         .withColumn("decayed_max",
                     F.greatest(F.col("__run"),
                                F.coalesce(F.col("__carry"),
                                           F.col("__run")))
                     * F.exp(-F.col("__dtl") / tau_seconds))
         .drop("__dt", "__ep", "__dtl", "__run", "__carry"))
    return d


def acf_periodogram(df: DataFrame, keys: Sequence[str], ts: str,
                    bucket_seconds: int, max_lag: int) -> DataFrame:
    """Autocorrelation periodogram per key series — the period-detection
    capability of the reference's ``seriesPeriodDetectFFT`` ([U]
    src/Functions/seriesPeriodDetectFFT.cpp), via the ACF rather than an
    FFT (documented deviation: the FFT needs a row-local numeric kernel;
    the ACF is pure relational algebra, so it distributes and
    oracle-checks). Returns (keys..., lag, acf): Pearson correlation of
    the bucketed count series against itself shifted by ``lag`` buckets,
    for lag = 1..max_lag. The dominant period is the argmax row —
    returned unreduced so ties stay deterministic.

    Plan: one bucketing hash agg, a constant max_lag-way spine explode,
    one equi-join on (key, bucket+lag), one corr agg — no windows, no
    single-partition stage.
    """
    keys = list(keys)
    b = (F.floor(F.col(ts).cast("double") / bucket_seconds)
         .cast("long").alias("__b"))
    series = df.groupBy(*keys, b).agg(F.count("*").alias("__n"))
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    left = series.select(*keys, "__b", "__n", lags)
    right = series.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        F.col("__b").alias("__rb"), F.col("__n").alias("__rn"))
    cond = (F.col("__rb") == F.col("__b") + F.col("lag"))
    for k in keys:
        cond = cond & (F.col(f"__r_{k}") == F.col(k))
    return (left.join(right, cond)
            .groupBy(*keys, "lag")
            .agg(F.round(F.corr("__n", "__rn"), 6).alias("acf")))


def series_decompose(df: DataFrame, keys: Sequence[str], ts: str,
                     bucket_seconds: int, period: int) -> DataFrame:
    """Additive trend/seasonal/residual decomposition per key series —
    the capability of the reference's ``seriesDecomposeSTL`` ([U]
    src/Functions/seriesDecomposeSTL.cpp), via the classical
    moving-average method rather than LOESS (documented deviation: STL's
    loess smoother is a row-local iterative kernel; the classical
    decomposition is windows + one phase aggregation, so it distributes
    and oracle-checks):

      trend_t    = centered mean of the ±period/2 bucket window
      seasonal_p = mean over t≡p (mod period) of (x_t − trend_t),
                   re-centered to sum 0 over the period
      residual_t = x_t − trend_t − seasonal_p

    Windows are keyed by the series key (parallel across keys); the
    seasonal pass is a (key, phase) hash agg joined back broadcast.
    """
    keys = list(keys)
    half = period // 2
    b = (F.floor(F.col(ts).cast("double") / bucket_seconds)
         .cast("long").alias("bucket"))
    s = df.groupBy(*keys, b).agg(F.count("*").cast("double").alias("x"))
    w = (Window.partitionBy(*keys).orderBy("bucket")
         .rowsBetween(-half, half))
    s = s.withColumn("trend", F.round(F.avg("x").over(w), 6))
    s = s.withColumn("phase", F.pmod(F.col("bucket"), F.lit(period)))
    seas = (s.groupBy(*keys, "phase")
            .agg(F.avg(F.col("x") - F.col("trend")).alias("__sp")))
    center = (seas.groupBy(*keys)
              .agg(F.avg("__sp").alias("__c")))
    seas = (seas.join(center, keys)
            .select(*keys, "phase",
                    F.round(F.col("__sp") - F.col("__c"), 6)
                    .alias("seasonal")))
    out = (s.join(F.broadcast(seas), [*keys, "phase"])
           .withColumn("residual",
                       F.round(F.col("x") - F.col("trend")
                               - F.col("seasonal"), 6)))
    return out.select(*keys, "bucket", "x", "trend", "seasonal", "residual")


def corr_matrix(df: DataFrame, cols: Sequence[str],
                round_dp: int = 6) -> DataFrame:
    """``corrMatrix`` (reference 23.x matrix aggregates) in tidy
    relational form: one row per (col_a, col_b) pair, upper triangle
    including the diagonal. ONE aggregation computes every pairwise
    Pearson correlation (p(p+1)/2 aggregate expressions over a single
    scan); the unpivot is a plan-time stack over the 1-row result."""
    cols = list(cols)
    aggs, stack_parts = [], []
    for i, a in enumerate(cols):
        for bcol in cols[i:]:
            alias = f"__c_{a}_{bcol}"
            aggs.append(F.round(F.corr(F.col(a).cast("double"),
                                       F.col(bcol).cast("double")),
                                round_dp).alias(alias))
            stack_parts.append(f"'{a}', '{bcol}', {alias}")
    one = df.agg(*aggs)
    n = len(stack_parts)
    return one.selectExpr(
        f"stack({n}, {', '.join(stack_parts)}) AS (col_a, col_b, corr)")


def mean_z_test(df: DataFrame, value: Column | str, group: Column | str,
                group_a, group_b, pop_var_a: float, pop_var_b: float,
                confidence: float = 0.95) -> DataFrame:
    """Two-sample mean z-test with KNOWN population variances (reference
    ``meanZTest(pop_var_x, pop_var_y, conf)(x, y)``,
    AggregateFunctionMeanZTest.h upstream): z = (m_a − m_b) /
    sqrt(σ²_a/n_a + σ²_b/n_b); two-sided p from the erf-based normal CDF
    (exact for z, unlike the t tests whose CDF is out of expression
    scope); CI on the mean difference at the requested confidence.
    Same two-scalar-agg + cross-join shape as welch_t_statistic."""
    from clickhouse_clickhouse_spark.ch_functions import _Z_CRIT, normalCDF

    if confidence not in _Z_CRIT:
        raise ValueError(f"confidence must be one of {sorted(_Z_CRIT)}")
    v = F.col(value) if isinstance(value, str) else value
    g = F.col(group) if isinstance(group, str) else group
    stats = (df.filter(g.isin([group_a, group_b]))
             .groupBy(g.alias("__g"))
             .agg(F.avg(v).alias("m"), F.count("*").alias("n")))
    a = stats.filter(F.col("__g") == group_a)
    b = stats.filter(F.col("__g") == group_b)
    j = a.crossJoin(b.select(F.col("m").alias("mb"),
                             F.col("n").alias("nb")))
    se = F.sqrt(F.lit(pop_var_a) / F.col("n")
                + F.lit(pop_var_b) / F.col("nb"))
    z = (F.col("m") - F.col("mb")) / se
    p = F.lit(2.0) * (F.lit(1.0) - normalCDF(F.abs(z)))
    zc = F.lit(_Z_CRIT[confidence])
    diff = F.col("m") - F.col("mb")
    return j.select(F.round(z, 6).alias("z_stat"),
                    F.round(p, 6).alias("p_value"),
                    F.round(diff - zc * se, 6).alias("ci_low"),
                    F.round(diff + zc * se, 6).alias("ci_high"))


def kolmogorov_smirnov_test(df: DataFrame, value: Column | str,
                            group: Column | str, group_a,
                            group_b) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test WITH the asymptotic p-value
    (reference ``kolmogorovSmirnovTest``, [U]
    src/AggregateFunctions/AggregateFunctionKolmogorovSmirnovTest.h):
    D = sup_x |ECDF_a(x) − ECDF_b(x)|;
    p = 2·Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²},
    λ = (√n_e + 0.12 + 0.11/√n_e)·D, n_e = n_a·n_b/(n_a+n_b)
    (Numerical Recipes §14.3 form of the public asymptotic; the D-only
    form lives in ``agg_ks_test``).

    Scale: the joint ECDF walk is the distributed bucketed prefix-sum
    (operators/grank.global_prefix_sums — hash/broadcast exchanges
    only, no single-partition sort); ties reduce per distinct value so
    the supremum is evaluated AFTER all tied rows, which is the
    tie-correct ECDF. The series is one array fold over 100 terms."""
    v = F.col(value) if isinstance(value, str) else value
    g = F.col(group) if isinstance(group, str) else group
    from clickhouse_clickhouse_spark.operators.grank import (
        global_prefix_sums,
    )

    d = (df.filter(g.isin([group_a, group_b]))
         .select(v.cast("double").alias("__v"),
                 (g == group_a).cast("long").alias("__ia"),
                 (g == group_b).cast("long").alias("__ib")))
    # round 14: reduce to per-distinct-value counts BEFORE the prefix
    # machinery (same rewrite as agg_ks_test — the window sort runs
    # over |distinct values| instead of |rows|, and the inclusive
    # prefix over one-row-per-value is already the tie-correct ECDF)
    cnt = d.groupBy("__v").agg(F.sum("__ia").alias("__ta"),
                               F.sum("__ib").alias("__tb"))
    red = global_prefix_sums(cnt, "__v", {"ca": F.col("__ta"),
                                          "cb": F.col("__tb")},
                             kernel=False).select("__v", "ca", "cb")
    tot = d.agg(F.sum("__ia").alias("na"), F.sum("__ib").alias("nb"))
    j = red.crossJoin(F.broadcast(tot))
    diff = F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb"))
    s = j.agg(F.max(diff).alias("d"),
              F.first("na").alias("na"), F.first("nb").alias("nb"))
    ne = F.col("na").cast("double") * F.col("nb") \
        / (F.col("na") + F.col("nb"))
    lam = (F.sqrt(ne) + 0.12 + 0.11 / F.sqrt(ne)) * F.col("d")
    s = s.withColumn("__lam", lam)
    term = lambda k: (F.when(k % 2 == 1, F.lit(1.0)).otherwise(-1.0)
                      * F.exp(-2.0 * k.cast("double") * k
                              * F.col("__lam") * F.col("__lam")))
    p = 2.0 * F.aggregate(F.sequence(F.lit(1), F.lit(100)),
                          F.lit(0.0), lambda acc, k: acc + term(k))
    p = F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    return s.select(F.round("d", 6).alias("d_statistic"),
                    F.round(p, 6).alias("p_value"))


def logistic_regression_irls(df: DataFrame, label: Column | str,
                             features: Sequence[Column | str],
                             l2: float = 0.0,
                             iterations: int = 8) -> list[float]:
    """Logistic regression coefficients [w1..wp, b] (reference
    ``stochasticLogisticRegression``, [U] src/AggregateFunctions/
    AggregateFunctionMLMethod.cpp). DEVIATION, same stance as the
    linear form (functions/ml.py): upstream fits by SGD — row-order
    dependent, nondeterministic under shuffle; this runs IRLS (Newton)
    on the l2-regularized log-likelihood with a FIXED iteration count.
    Each iteration is ONE distributed moment aggregation — the
    gradient vector and (p+1)² Hessian are SUMs over rows with the
    current coefficients inlined as literals — followed by a
    driver-side solve of the tiny system. Cost: ``iterations`` scans,
    constant state, no per-group arrays, any skew."""
    import numpy as np

    y = (F.col(label) if isinstance(label, str) else label) \
        .cast("double")
    xs = [(F.col(c) if isinstance(c, str) else c).cast("double")
          for c in features]
    p = len(xs)
    d = df.select(y.alias("__y"),
                  *[x.alias(f"__x{i}")
                    for i, x in enumerate(xs)]).na.drop()
    w = np.zeros(p + 1)
    for _ in range(max(1, iterations)):
        z = F.lit(float(w[p]))
        for i in range(p):
            z = z + F.lit(float(w[i])) * F.col(f"__x{i}")
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = F.col("__y") - mu
        s = mu * (F.lit(1.0) - mu)
        cols = [F.sum(r * F.col(f"__x{i}")).alias(f"g{i}")
                for i in range(p)]
        cols.append(F.sum(r).alias(f"g{p}"))
        feats = [F.col(f"__x{i}") for i in range(p)] + [F.lit(1.0)]
        for i in range(p + 1):
            for j in range(i, p + 1):
                cols.append(F.sum(s * feats[i] * feats[j])
                            .alias(f"h{i}_{j}"))
        row = d.agg(*cols).collect()[0]  # (p+1)^2 scalars, not data
        g = np.array([row[f"g{i}"] for i in range(p + 1)])
        h = np.zeros((p + 1, p + 1))
        for i in range(p + 1):
            for j in range(i, p + 1):
                h[i, j] = h[j, i] = row[f"h{i}_{j}"]
        if l2:
            g[:p] -= l2 * w[:p]
            h[:p, :p] += l2 * np.eye(p)
        try:
            w = w + np.linalg.solve(h, g)
        except np.linalg.LinAlgError:
            w = w + np.linalg.lstsq(h, g, rcond=None)[0]
    return [float(v) for v in w]
