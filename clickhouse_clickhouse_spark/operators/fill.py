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
        w = (Window.partitionBy(*parts).orderBy(key)
             .rowsBetween(Window.unboundedPreceding, 0))
        for c in carry_forward:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
