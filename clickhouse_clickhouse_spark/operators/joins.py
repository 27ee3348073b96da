"""Join semantics the reference supports beyond Spark's native kinds.

Reference surface (SURVEY.md §2.3; upstream ``src/Interpreters/HashJoin/``,
``AsofRowRefs``, ``PasteJoinTransform``): Spark covers
inner/left/right/full/cross/semi/anti natively; this module adds the
strictness variants (ANY), ASOF, and PASTE as scalable DataFrame
compositions — no collect, one key-shuffle each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def any_join(left: DataFrame, right: DataFrame, on: Sequence[str],
             how: str = "inner", order_by: Sequence[Column | str] | None = None) -> DataFrame:
    """``ANY JOIN`` — at most one build-side row per key (reference
    strictness=Any, upstream ``HashJoin.cpp`` kind/strictness matrix).

    Spark-first: deduplicate the build side with a per-key ``row_number``
    before a normal join. ``order_by`` makes "first match" deterministic
    (the reference's is arrival-order-dependent; we require an explicit
    order — same stance as our PASTE join).

    Scale: the dedup is one shuffle on the join key, which AQE then reuses
    for the join itself when partitioning matches.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in (order_by or on)]
    w = Window.partitionBy(*on).orderBy(*order)
    deduped = (right.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    return left.join(deduped, list(on), how)


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              direction: str = "backward", strict: bool = False,
              right_cols: Sequence[str] | None = None,
              how: str = "inner") -> DataFrame:
    """``ASOF JOIN`` — for each left row, the nearest earlier (backward) or
    later (forward) right row sharing the equi keys (reference
    ``AsofRowRefs``; SURVEY.md §4.3 item 2).

    Algorithm (union-tag, O(n log n), no row explosion — designed for
    100 TB): tag both sides, union with null padding, ONE window per key
    ordered by timestamp, carry the last non-null right payload forward
    (``last(..., ignorenulls=True)``), keep left rows. A single shuffle on
    the key; no per-key pandas, no range crossJoin.

    Tie handling: non-strict backward means right_ts <= left_ts, so right
    rows sort BEFORE left rows at equal timestamps; strict flips that.

    Returns left columns plus the matched right payload columns (renamed
    ``{col}`` as given in right_cols). ``how='inner'`` drops unmatched left
    rows, ``'left'`` keeps them with nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(*[F.col(c) for c in [right_ts, *right_cols]])

    # Both tagged sides are built as ONE select each (optimization round
    # 14): the old per-column withColumn loop re-analyzed the plan once
    # per left column (~n py4j round trips + n Catalyst analyses), which
    # showed up as ~0.2 s of driver-side plan-build time per call in the
    # r14 profile — pure fixed cost, same physical plan.
    l_schema = dict(left.dtypes)
    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    on_set = set(on)
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(l_schema[c]).alias(c)
          for c in left.columns if c not in on_set],
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
    )
    unioned = l_tag.unionByName(r_tag)

    asc = direction == "backward"
    ts_order = F.col("__ts").asc() if asc else F.col("__ts").desc()
    # Non-strict: right row visible at equal ts -> right (tag 0) sorts first.
    # Strict: left row must not see an equal-ts right row -> left (tag 1) first.
    tag_order = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (Window.partitionBy(*on).orderBy(ts_order, tag_order)
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("__is_left") == 1)
    if strict:
        # Window order put left first at ties, but an equal-ts right row from
        # an EARLIER position could still be non-strict; with distinct ts per
        # side this suffices. Guard exact equality explicitly:
        cmp = F.col("__match")[right_ts] < F.col(left_ts) if direction == "backward" \
            else F.col("__match")[right_ts] > F.col(left_ts)
        out = out.withColumn("__match", F.when(cmp, F.col("__match")))
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__match")[right_ts].alias(f"asof_{right_ts}"))
    sel += [F.col("__match")[c].alias(c) for c in right_cols]
    return out.select(*sel)


def paste_join(left: DataFrame, right: DataFrame,
               left_order: Sequence[Column | str], right_order: Sequence[Column | str]) -> DataFrame:
    """``PASTE JOIN`` — positional zip of two relations (reference
    ``PasteJoinTransform``). Spark has no stable unordered row identity, so
    an explicit total order per side is REQUIRED; rows are numbered by it
    and equi-joined on the number. Extra rows on the longer side drop
    (reference semantics: zip to the shorter length).

    Numbering ALWAYS uses the distributed bucketed global rank
    (operators/grank.py — no single-partition exchange): arbitrary Column
    order expressions are materialized to temp columns first (round-5 —
    the single-window fallback is gone). Order entries must be plain
    ascending value expressions (grank's contract); the leading key must
    be numeric/temporal/string/boolean.
    """
    ln = _ordered_rn(left, left_order)
    rn = _ordered_rn(right, right_order)
    return ln.join(rn, "__rn", "inner").drop("__rn")


def _ordered_rn(df: DataFrame, order: Sequence[Column | str]) -> DataFrame:
    from pyspark.sql.types import (
        BooleanType, DateType, NumericType, StringType, TimestampType,
    )

    from clickhouse_clickhouse_spark.operators.grank import global_row_number

    # materialize every order entry (name or Column expression) to a
    # temp column — uniform, never mutates a user column, all dropped
    # after numbering
    names, d = [], df
    for i, c in enumerate(order):
        n = f"__ord_{i}"
        d = d.withColumn(n, F.col(c) if isinstance(c, str) else c)
        names.append(n)
    lead = names[0]
    dt = d.schema[lead].dataType
    if isinstance(dt, BooleanType):
        d = d.withColumn(lead, F.col(lead).cast("int"))
        dt = d.schema[lead].dataType
    if not isinstance(dt, (NumericType, DateType, TimestampType,
                           StringType)):
        raise TypeError(
            f"paste_join leading order key has non-bucketable type {dt}; "
            "cast the expression to a numeric/temporal/string value")
    # kernel=False: PASTE operands are ARBITRARY relations (often
    # derived subqueries at the dialect layer) — the in-plan bounds
    # form lets the bounds branch reuse a derivation's exchange, where
    # the collect-bounds kernel would re-execute the whole derivation
    # as a separate job (see _bucketize; round-14 review finding)
    return global_row_number(d, lead, names[1:], out="__rn",
                             kernel=False).drop(*names)
