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

    # The whole composition is built from SQL expression strings
    # (optimization round 15, guide §7.3 driver-cost class): the
    # Column-object form — itself the round-14 replacement of a
    # withColumn loop — still paid ~35 py4j round trips at ~7 ms each,
    # ~0.23 s of pure driver-side build time per call (measured; the
    # query's execution is ~0.29 s, so plan BUILD was ~45% of wall).
    # selectExpr/expr strings build the identical plan in ~7 round
    # trips. Identifiers are backtick-quoted; ``q`` doubles embedded
    # backticks (the documented escape) so exotic names keep working.
    def q(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    l_schema = dict(left.dtypes)
    r_schema = dict(right.dtypes)
    on_set = set(on)
    payload_ddl = "struct<" + ", ".join(
        f"{q(c)}: {r_schema[c]}" for c in [right_ts, *right_cols]) + ">"
    l_tag = left.selectExpr(
        "*",
        f"CAST({q(left_ts)} AS TIMESTAMP) AS __ts",
        "1 AS __is_left",
        f"CAST(NULL AS {payload_ddl}) AS __payload",
    )
    r_tag = right.selectExpr(
        *[q(c) for c in on],
        *[f"CAST(NULL AS {l_schema[c]}) AS {q(c)}"
          for c in left.columns if c not in on_set],
        f"CAST({q(right_ts)} AS TIMESTAMP) AS __ts",
        "0 AS __is_left",
        "named_struct(" + ", ".join(
            "'{}', {}".format(c.replace("'", "''"), q(c))
            for c in [right_ts, *right_cols])
        + ") AS __payload",
    )
    unioned = l_tag.unionByName(r_tag)

    ts_dir = "ASC" if direction == "backward" else "DESC"
    # Non-strict: right row visible at equal ts -> right (tag 0) sorts first.
    # Strict: left row must not see an equal-ts right row -> left (tag 1) first.
    tag_dir = "DESC" if strict else "ASC"
    matched = unioned.selectExpr(
        "*",
        "last(__payload, true) OVER (PARTITION BY "
        + ", ".join(q(c) for c in on)
        + f" ORDER BY __ts {ts_dir}, __is_left {tag_dir}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __match")
    match_expr = "__match"
    if strict:
        # Window order put left first at ties, but an equal-ts right row from
        # an EARLIER position could still be non-strict; with distinct ts per
        # side this suffices. Guard exact equality explicitly:
        op = "<" if direction == "backward" else ">"
        match_expr = (f"CASE WHEN __match.{q(right_ts)} {op} "
                      f"{q(left_ts)} THEN __match END")
    cond = "__is_left = 1"
    if how == "inner":
        cond += f" AND ({match_expr}) IS NOT NULL"
    sel = [q(c) for c in left.columns]
    sel.append(f"({match_expr}).{q(right_ts)} AS "
               + q(f"asof_{right_ts}"))
    sel += [f"({match_expr}).{q(c)} AS {q(c)}" for c in right_cols]
    return matched.filter(cond).selectExpr(*sel)


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
