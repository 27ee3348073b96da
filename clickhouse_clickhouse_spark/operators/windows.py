"""Window-function-adjacent helpers (SURVEY.md §2.5, §2.6).

All reference window functions map 1:1 onto ``pyspark.sql.Window``; these
are the two composed idioms the reference exposes as syntax.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def qualify(df: DataFrame, window_col: Column, predicate) -> DataFrame:
    """``QUALIFY`` — filter on a window-function result without exposing the
    helper column. ``predicate`` is a callable Column -> Column."""
    tmp = df.withColumn("__q", window_col)
    return tmp.filter(predicate(F.col("__q"))).drop("__q")


def limit_with_ties(df: DataFrame, n: int,
                    order_by: Sequence[str]) -> DataFrame:
    """``LIMIT n WITH TIES`` (reference ``LimitTransform`` ties mode)
    without a global rank window: pass 1 reduces ``orderBy().limit(n)``
    (TakeOrderedAndProject — per-partition top-n heaps, no
    single-partition exchange) to the nth row's sort-key tuple; pass 2
    keeps every row whose key tuple is ``<=`` that broadcast boundary —
    rows tying the nth value are included. Ascending non-null sort keys
    (derive a negated/cleaned column for other orders)."""
    cols = [F.col(c) for c in order_by]
    boundary = (df.select(*cols).orderBy(*cols).limit(n)
                .agg(F.max(F.struct(*cols)).alias("__b")))
    return (df.crossJoin(F.broadcast(boundary))
            .filter(F.struct(*cols) <= F.col("__b")).drop("__b"))
