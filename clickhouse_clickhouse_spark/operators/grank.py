"""Distributed global ordering primitives (no single-partition exchange).

The reference's window engine (upstream ``src/Processors/Transforms/
WindowTransform.cpp``) evaluates an un-PARTITIONed ``OVER (ORDER BY ...)``
by streaming the whole sorted input through one transform. Spark's
``WindowExec`` does the same thing — ``Window.orderBy`` with no
``partitionBy`` compiles to ``Exchange SinglePartition`` and funnels every
row through one task, which is a scale killer at 100 TB even though it is
correct at test scale.

This module provides the scale-safe equivalents used by the rank-based
statistics (AUC, Mann-Whitney U, Kolmogorov-Smirnov, ntile deciles,
global RANGE frames, PASTE JOIN numbering):

* rows are range-bucketed on the leading order key using approximate
  quantile boundaries (a 1-row aggregate, collected once and applied as
  a vectorized searchsorted kernel — round 14) — deterministic under
  re-computation, unlike ``repartitionByRange``'s sampled boundaries;
* each bucket is ranked/prefix-summed independently with an ordinary
  partitioned window (hash shuffle, fully parallel);
* per-bucket totals (one row per bucket) are offset-cumulated with a
  broadcast triangular self-join — tiny, and crucially *not* an
  ``Exchange SinglePartition`` — and broadcast-joined back.

Every operator here therefore produces a plan whose only exchanges are
hash/broadcast; ``tests/test_plans.py`` pins that invariant.

Skew note: all rows sharing one value of the leading key land in one
bucket (required for correctness of ties). A single pathological key —
e.g. 30 % of rows having the same value — concentrates in one task, the
same behavior ``repartitionByRange`` would have; AQE skew handling does
not split windows, so extreme cases need a finer ``buckets`` value or a
pre-aggregation at the key granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__gr_bkt"
_BNDS = "__gr_bnds"

# percentile_approx accuracy for the bucket boundaries (optimization
# round 15: was 10000). Boundaries only affect LOAD BALANCE, never
# results — every branch applies the same collected array (or the same
# in-plan relation), and equal keys land in equal buckets for any
# ascending boundary set. Rank error 1/1000 against a bucket width of
# 1/64 skews a bucket by at most ~6% of its size; the smaller sketch
# shrinks the aggregation state merged per partition (guide §5) and
# measured 0.44/0.93 -> 0.36/0.44 s best/median on the sf0.1 collect.
_BOUNDS_ACC = 1000


def _q(name: str) -> str:
    """Backtick-quoted identifier for the expression-string builders."""
    return "`" + name.replace("`", "``") + "`"


def single_partition_key(col: Column | str) -> Column:
    """A non-foldable always-zero Window partition key, for the few places
    where a single partition IS the semantics (k-row seed numbering,
    presentation-bound WITH FILL spines). A literal key (``F.lit(0)``)
    gets constant-folded out of the partition spec inside larger plans,
    resurfacing Spark's "No Partition Defined" warning; deriving zero from
    a column survives optimization while still grouping every row
    together."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.length(c.cast("string")) % 1, F.lit(0))


def _bucket_key_expr(df: DataFrame, key: str):
    """Numeric range-bucketing key for ``key``. Numeric/temporal columns
    cast to double. STRING columns map to their first 7 UTF-8 bytes as a
    56-bit integer — UTF-8 byte order equals code-point order, and Spark
    and DuckDB both compare strings in binary order, so the prefix key is
    exactly monotone with the string sort; rows sharing a 7-byte prefix
    merely share a bucket (per-bucket ordering handles the tails). Long
    shared prefixes therefore skew buckets — same caveat as any range
    partitioner on such data."""
    from pyspark.sql.types import StringType

    if isinstance(df.schema[key].dataType, StringType):
        return F.conv(F.rpad(F.hex(F.substring(
            F.encode(F.col(key), "utf-8"), 1, 7)), 14, "0"), 16, 10) \
            .cast("long").cast("double")
    return F.col(key).cast("double")


def _bucket_bounds(df: DataFrame, key: str, buckets: int) -> "object":
    """Collected ascending quantile boundaries for ``key`` as a float64
    numpy array (``buckets - 1`` values; empty when the input has no
    non-null keys). EAGER: runs a Spark job at plan-BUILD time (round-15
    advice — callers on the kernel path pay/observe input errors when
    constructing, not at the first action).
    ONE pass over the input — the same single pass the
    former in-plan broadcast branch executed — and a literal thereafter,
    so every downstream branch agrees on bucket assignment by
    construction (``repartitionByRange``'s RNG-sampled boundaries do not
    have that property across jobs)."""
    kx = _bucket_key_expr(df, key)
    probs = [i / buckets for i in range(1, buckets)]
    row = df.agg(F.percentile_approx(kx, probs, _BOUNDS_ACC).alias("__b")) \
            .collect()[0]["__b"]
    return np.asarray([] if row is None else [float(v) for v in row],
                      dtype=np.float64)


def _searchsorted_kernel(bounds, offset: float = 0.0):
    """Arrow-batched ``count of boundaries strictly below (value +
    offset)`` — ``np.searchsorted(side='left')`` over the collected
    boundary array (optimization round 14). The former per-row
    ``size(filter(bounds, b < v))`` was an interpreted 63-step HOF fold
    (CodegenFallback) evaluated for every row of every grank consumer;
    two SQL-level replacements (comparison unroll, element_at binary
    search) had both measured SLOWER, but the vectorized binary search
    costs ~ns/row. Bit-equal by construction: side='left' returns the
    count of elements strictly less than v over the ascending
    percentile array — exactly the fold's ``v > b`` count; Spark orders
    NaN GREATER than every double (unlike IEEE compares), so NaN maps
    to ``len(bounds)`` explicitly (pinned in tests/test_grank_kernel).
    NULL inputs are indistinguishable from NaN after the Arrow
    conversion and also yield ``len(bounds)`` — callers MUST overlay
    their own NULL semantics SQL-side (``_bucketize`` maps NULL keys to
    -1; ``global_range_count`` maps NULL frame targets to 0)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _k(v: pd.Series) -> pd.Series:
        a = v.to_numpy(dtype=np.float64, na_value=np.nan) + offset
        out = np.searchsorted(bounds, a, side="left").astype(np.int32)
        bad = np.isnan(a)
        if bad.any():
            out[bad] = len(bounds)   # Spark: NaN > every double
        return pd.Series(out)

    return _k


def _bucketize(df: DataFrame, key: str, buckets: int,
               kernel: bool = True, bounds=None) -> DataFrame:
    """Add a range-bucket id column ``__gr_bkt`` for the numeric/temporal/
    string column ``key``: bucket = number of quantile boundaries strictly
    below the value (NULLs → -1, matching ASC NULLS FIRST).

    Two bit-equal physical forms (round 14), chosen by the CALLER'S
    input shape:

    - ``kernel=True`` (raw-relation inputs — a scan re-executes per
      plan branch either way, so collecting the bounds costs no extra
      pass): boundaries collected once, buckets assigned by the
      vectorized searchsorted kernel. Replaces an interpreted 63-step
      HOF fold per row — the per-row term that dominates at scale.
    - ``kernel=False`` (DERIVED inputs — a distinct/aggregate subtree
      ending in an exchange, e.g. the token vocabulary or the
      distinct-value reductions of the rank statistics): boundaries
      stay a lazily-evaluated in-plan broadcast, so the bounds branch
      REUSES the subtree's exchange instead of re-executing the whole
      derivation as a separate collect job (measured: the vocabulary
      path lost ~1.4 s at sf0.1 under the collect form, and at scale
      the collect costs one extra full derivation pass).

    ``bounds`` short-circuits the collect when the caller already holds
    the array (global_range_count shares it with its frame-target
    kernel)."""
    kx = _bucket_key_expr(df, key)
    if bounds is not None and not kernel:
        raise ValueError("_bucketize: a precomputed bounds array is "
                         "only meaningful on the kernel path")
    if not kernel:
        brel = df.agg(F.percentile_approx(kx, [i / buckets for i in
                                               range(1, buckets)],
                                          _BOUNDS_ACC).alias(_BNDS))
        return (df.crossJoin(F.broadcast(brel))
                .withColumn(
                    _BKT,
                    F.when(F.col(key).isNull(), F.lit(-1)).otherwise(
                        F.size(F.filter(F.col(_BNDS), lambda b: kx > b))))
                .drop(_BNDS))
    if bounds is None:
        bounds = _bucket_bounds(df, key, buckets)
    return df.withColumn(
        _BKT,
        F.when(F.col(key).isNull(), F.lit(-1)).otherwise(
            _searchsorted_kernel(bounds)(kx)))


def _bucket_offsets(counts: DataFrame, sum_cols: Sequence[str],
                    max_bkt: int) -> DataFrame:
    """Exclusive prefix totals over bucket ids in ONE pass over the tiny
    counts relation: each (bucket, totals) row is exploded to every
    bucket id from its own through ``max_bkt`` (its own contribution
    zeroed) and the contributions hash-aggregated per target bucket —
    O(buckets²) rows through one exchange, no single-partition exchange
    (a tiny ``Window.orderBy`` would reintroduce one).

    The pre-round-14 triangular self-join (counts ⋈ broadcast(counts)
    on ``b2 < bkt``) evaluated the counts SUBTREE twice — the join's
    probe side column-pruned to a distinct-buckets aggregate that does
    not exchange-reuse against the projected build side — costing every
    grank consumer a second full scan of the input.

    Built from expression strings (round 15, guide §7.3): the Column
    form paid ~15 py4j round trips (~7 ms each on this box) of pure
    plan-build latency per grank consumer; same plan, 4 trips."""
    contrib = counts.selectExpr(
        f"{_BKT} AS __src",
        f"explode(sequence({_BKT}, {max_bkt})) AS __tgt",
        *sum_cols)
    aggs = [F.expr(f"sum(IF(__src < __tgt, {c}, 0)) AS __off_{c}")
            for c in sum_cols]
    return (contrib.groupBy("__tgt").agg(*aggs)
            .withColumnRenamed("__tgt", _BKT))


def global_row_number(df: DataFrame, key: str,
                      tiebreaks: Sequence[str] = (),
                      out: str = "rn", buckets: int = 64,
                      kernel: bool = True) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY key ASC, *tiebreaks ASC)``
    without a single-partition window: per-bucket ``row_number`` plus the
    broadcast cumulative count of earlier buckets. ``key`` must be a
    numeric or temporal column (it is range-bucketed by value).
    ``kernel=False`` for derived-subtree inputs — see _bucketize."""
    ranked, _counts = _ranked(df, key, tiebreaks, out, buckets, kernel)
    return ranked.drop(_BKT)


def _ranked(df: DataFrame, key: str, tiebreaks: Sequence[str],
            out: str, buckets: int,
            kernel: bool = True) -> tuple[DataFrame, DataFrame]:
    """Shared core of :func:`global_row_number` / :func:`global_ntile`:
    returns (rows + global rank ``out`` + ``__gr_bkt``, per-bucket count
    relation) so callers that also need totals reuse the tiny counts
    side instead of re-scanning the input."""
    b = _bucketize(df, key, buckets, kernel=kernel)
    order_sql = ", ".join(f"{_q(c)} ASC" for c in [key, *tiebreaks])
    local = b.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY {_BKT} "
        f"ORDER BY {order_sql}) AS __lrn")
    # Counts deliberately aggregate the PRE-window relation: the branch
    # re-scans the input but partial-aggregates map-side (no sort,
    # ~buckets rows shuffled). The round-14 A/B of the alternative —
    # anchoring the count on max(row_number) so the window's exchange is
    # ReusedExchange'd — saved the scan but re-SORTED the whole relation
    # in the counts branch (WindowExec re-executes above the reused
    # shuffle) and measured net-slower (KS 2.45→3.1 s at sf0.1); see
    # OPTIMIZATION_r14.md §grank.
    counts = b.groupBy(_BKT).agg(F.count("*").alias("__cnt"))
    offsets = _bucket_offsets(counts, ["__cnt"], buckets - 1)
    ranked = (local.join(F.broadcast(offsets), _BKT)
              .selectExpr(
                  "*",
                  f"CAST(__lrn + __off___cnt AS BIGINT) AS {_q(out)}")
              .drop("__lrn", "__off___cnt"))
    return ranked, counts


def global_prefix_sums(df: DataFrame, key: str,
                       sums: dict[str, Column],
                       buckets: int = 64,
                       kernel: bool = True) -> DataFrame:
    """Global inclusive running sums in ``ORDER BY key ASC`` order — each
    entry of ``sums`` (name -> addend expression) becomes a column holding
    ``SUM(expr) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING..CURRENT)``.
    Rows tied on ``key`` get an arbitrary order *within* the tie (callers
    that need tie-stable results should reduce per distinct key after,
    e.g. ``groupBy(key).max(...)`` — the KS statistic does exactly that).
    """
    names = list(sums)
    b = _bucketize(df, key, buckets, kernel=kernel)
    for n in names:
        b = b.withColumn(f"__a_{n}", sums[n])
    wloc = (Window.partitionBy(_BKT).orderBy(F.col(key).asc())
            .rowsBetween(Window.unboundedPreceding, 0))
    local = b
    for n in names:
        local = local.withColumn(f"__l_{n}",
                                 F.sum(f"__a_{n}").over(wloc))
    # Totals aggregate the PRE-window relation on purpose (extra scan,
    # but map-side partial aggregation and no sort) — the round-14 A/B
    # of max_by(running_sum, row_number) over the windowed relation
    # reused the shuffle but re-sorted the whole bucket in this branch
    # and measured net-slower; see global_row_number's comment.
    totals = b.groupBy(_BKT).agg(
        *[F.sum(f"__a_{n}").alias(f"__t_{n}") for n in names])
    offsets = _bucket_offsets(totals, [f"__t_{n}" for n in names],
                              buckets - 1)
    out = local.join(F.broadcast(offsets), _BKT)
    for n in names:
        out = out.withColumn(n, F.col(f"__l_{n}") + F.col(f"__off___t_{n}"))
    drop = [_BKT] + [c for n in names
                     for c in (f"__a_{n}", f"__l_{n}", f"__off___t_{n}")]
    return out.drop(*drop)


def global_ntile(df: DataFrame, key: str, n_tiles: int,
                 tiebreaks: Sequence[str] = (),
                 out: str = "tile", buckets: int = 64,
                 kernel: bool = True) -> DataFrame:
    """Global ``ntile(n) OVER (ORDER BY key, *tiebreaks)`` with exact SQL
    ntile semantics (the first ``n_rows % n`` tiles get the extra row):
    global row number from :func:`global_row_number` plus a broadcast
    total count, bucket arithmetic in exact integer math.

    The total row count is a direct ``df.agg(count(*))`` branch. The
    round-14 alternative — summing the per-bucket counts relation of the
    ranking pass — looked cheaper (≤ buckets+1 rows) but measured a wash
    AND regressed the static plan: the counts subtree does not
    exchange-reuse against the offsets branch (the offsets side consumes
    it through a projection that canonicalizes differently), so the
    "reused" branch re-executed its own scan + groupBy exchange, taking
    cb_value_deciles from 14 to 16 exchanges / 3 to 4 scans. The direct
    count branch is scan + map-side partial count + 1-row exchange —
    strictly less work than a re-executed grouped count."""
    ranked, _counts = _ranked(df, key, tiebreaks, out="__grn",
                              buckets=buckets, kernel=kernel)
    rn = ranked.drop(_BKT)
    total = df.agg(F.count("*").alias("__n"))
    r = rn.crossJoin(F.broadcast(total))
    # Expression strings (round 15, guide §7.3): the Column form of this
    # arithmetic was ~20 py4j round trips of plan-build latency; the
    # spliced sub-expressions (q/rem/big) land in the plan exactly as
    # the repeated Column references did (each Column reuse deep-copies
    # its subtree), so the physical plan is unchanged.
    q = f"CAST(__n / {n_tiles} AS BIGINT)"            # floor: both positive
    rem = f"(__n % {n_tiles})"
    big = f"({rem} * ({q} + 1))"                      # rows in the fat tiles
    ceil_div = lambda a, b: f"CAST(({a} + {b} - 1) / ({b}) AS BIGINT)"  # noqa: E731
    tile = (f"IF(__grn <= {big}, {ceil_div('__grn', q + ' + 1')}, "
            f"{rem} + {ceil_div(f'(__grn - {big})', f'GREATEST({q}, 1)')})")
    return (r.selectExpr("*", f"CAST({tile} AS INT) AS {_q(out)}")
            .drop("__grn", "__n"))


def global_range_count(df: DataFrame, key: str, preceding: float,
                       out: str, buckets: int = 64) -> DataFrame:
    """Global ``count(*) OVER (ORDER BY key RANGE BETWEEN <preceding>
    PRECEDING AND CURRENT ROW)`` — a value-range frame over the total
    order, computed per bucket with a *halo exchange*: every row is also
    shipped as a "ghost" to each later bucket whose lower boundary lies
    within ``preceding`` of it, so each bucket window sees the full frame
    of its own rows. Ghost copies participate in counting but are dropped
    from the output. Ghost fan-out is bounded by how many bucket spans one
    frame crosses (≈ preceding / bucket_width + 1). ``key`` must be
    non-null numeric; ``preceding`` must be integer-valued (Spark's
    ``rangeBetween`` takes long boundaries — pre-scale the key for
    fractional ranges)."""
    if not float(preceding).is_integer():
        raise ValueError("preceding must be integer-valued; "
                         "scale the key column for fractional ranges")
    bounds = _bucket_bounds(df, key, buckets)
    b = _bucketize(df, key, buckets, bounds=bounds)
    # Bounds are sorted ascending, so the ghost targets of a row are the
    # CONTIGUOUS bucket range (own bucket, highest bucket whose lower
    # boundary is within `preceding`] — the same searchsorted kernel
    # with the frame offset folded in (round-14; the per-row count-fold
    # it replaces was itself the round-14 replacement of a struct-zip
    # transform/filter/transform). Target sets verified identical
    # row-for-row at sf0.1.
    # NULL keys: the old fold's `b < NULL + preceding` predicate was
    # NULL → dropped → 0 reachable bounds; the kernel cannot tell NULL
    # from NaN post-Arrow, so the 0 is overlaid here
    hi = F.when(F.col(key).isNull(), F.lit(0)).otherwise(
        _searchsorted_kernel(bounds, offset=float(preceding))(
            F.col(key).cast("double")))
    targets = F.when(hi > F.col(_BKT),
                     F.sequence(F.col(_BKT) + 1, hi)) \
               .otherwise(F.array().cast("array<int>"))
    cols = df.columns
    real = b.select(*cols, F.col(_BKT).alias("__tgt"),
                    F.lit(False).alias("__ghost"))
    ghosts = (b.select(*cols, F.explode(targets).alias("__tgt"),
                       F.lit(True).alias("__ghost")))
    u = real.unionByName(ghosts)
    w = (Window.partitionBy("__tgt").orderBy(F.col(key).cast("double"))
         .rangeBetween(-int(preceding), 0))
    return (u.withColumn(out, F.count("*").over(w))
            .filter(~F.col("__ghost")).drop("__tgt", "__ghost"))
