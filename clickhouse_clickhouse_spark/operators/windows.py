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
                    order_by: Sequence[Column | str]) -> DataFrame:
    """``LIMIT n WITH TIES`` (reference ``LimitTransform`` ties mode):
    rank() over the global order, keep rank <= n — rows tying the nth value
    are included."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.orderBy(*order)
    return (df.withColumn("__rk", F.rank().over(w))
            .filter(F.col("__rk") <= n).drop("__rk"))
