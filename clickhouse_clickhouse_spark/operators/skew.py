"""Skew-handling join helper (SURVEY.md §4 'Skew handling').

AQE's skew-join split handles most cases automatically; this explicit
salted join is for the pathological hot-key case a planner can't split
(one key ≫ everything else, e.g. the empty-string document or null-like
sentinel in a 100 TB dedup join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with hot-key salting: the left side gets a random salt in
    [0, salt), the right side is replicated ``salt`` times, and the join
    key becomes (key, salt) — splitting each hot key across ``salt``
    reducers. Right-side replication costs salt× its size: use when right
    is the smaller relation. Semantics identical to a plain join."""
    on = list(on)
    l_salted = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l_salted.join(r_salted, on + ["__salt"], how)
    return out.drop("__salt")
