"""Vector/distance functions over array columns (reference
``src/Functions/array/arrayDistance.cpp``, ``arrayDotProduct.cpp`` —
SURVEY.md §2.8 'Distance / vector').

All JVM-side higher-order functions: ``zip_with`` for the element product,
``aggregate`` for the fold — whole-stage-codegen'd, no Python in the loop.
Sequential left-to-right fold matches DuckDB's list_dot_product order, so
doubles agree bitwise for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(F.transform(diff, lambda d: d * d),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """Reference ``cosineDistance`` = 1 - cosine similarity."""
    return F.lit(1.0) - cosine_similarity(a, b)
