"""Bitmap aggregates and bitmap functions (reference ``groupBitmap*``
aggregate family and ``bitmap*`` scalar family — [U]
src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp and
src/Functions/FunctionsBitmap.h, which use CRoaring roaring bitmaps).

Spark-first representation: a bitmap over integer ids is a SORTED ARRAY
OF DISTINCT values (``array<long>``). Parquet/Tungsten store it
compactly, and every bitmap operation maps to a built-in JVM array
kernel (array_intersect/union/except) — no UDF, no Python. The roaring
compression itself is a storage detail the reference needs because it
materializes bitmap states; our states live only inside a query plan.

At 100 TB the per-group bitmap must fit in executor memory — the same
bound the reference's groupBitmapState has. For cardinality-only
questions prefer ``countDistinct``/``approx_count_distinct`` (no
materialized set at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_bitmap_state(col: Column | str) -> Column:
    """Aggregate expression: build the bitmap (sorted distinct array) of
    ``col`` — reference ``groupBitmapState(expr)``."""
    return F.array_sort(F.collect_set(col))


def group_bitmap(col: Column | str) -> Column:
    """Reference ``groupBitmap(expr)`` = cardinality of the bitmap.
    Maps to exact distinct count (no array materialized)."""
    return F.countDistinct(col)


def bitmap_cardinality(b: Column) -> Column:
    return F.size(b)


def bitmap_and(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_intersect(a, b))


def bitmap_or(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_union(a, b))


def bitmap_xor(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_union(F.array_except(a, b),
                                      F.array_except(b, a)))


def bitmap_andnot(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_except(a, b))


def bitmap_contains(b: Column, x: Column) -> Column:
    return F.array_contains(b, x)


def bitmap_has_any(a: Column, b: Column) -> Column:
    return F.arrays_overlap(a, b)


def bitmap_has_all(a: Column, b: Column) -> Column:
    """``bitmapHasAll(a, b)``: every element of b is in a."""
    return F.forall(b, lambda x: F.array_contains(a, x))


def bitmap_to_array(b: Column) -> Column:
    """``bitmapToArray`` — identity under the sorted-array encoding."""
    return b


def bitmap_subset_in_range(b: Column, lo: Column | int, hi: Column | int) -> Column:
    """``bitmapSubsetInRange(b, lo, hi)``: elements in [lo, hi)."""
    lo, hi = F.lit(lo), F.lit(hi)
    return F.filter(b, lambda x: (x >= lo) & (x < hi))


def group_bitmap_and(df: DataFrame, group: str, value: str) -> DataFrame:
    """Cross-group intersection — reference ``groupBitmapAnd`` over
    per-group bitmap states: values present in EVERY group. DF-native:
    count distinct groups per value, keep values hitting all groups
    (one shuffle on value; no bitmap materialized on the driver).
    Returns a 1-row DataFrame (and_cardinality)."""
    n_groups = df.select(group).distinct().count()
    per_value = (df.select(group, value).distinct()
                 .groupBy(value)
                 .agg(F.count(group).alias("__ng")))
    return (per_value.filter(F.col("__ng") == n_groups)
            .agg(F.count("*").cast("int").alias("and_cardinality")))
