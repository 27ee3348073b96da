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

import pandas as pd
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


# ------------------------------------------------- roaring-style storage
#
# The reference PERSISTS groupBitmapState as a CRoaring bitmap inside
# AggregateFunction(groupBitmap, UInt32) columns. The sorted-array
# encoding above is ideal inside a query plan, but storage parity needs a
# compact binary state that survives a write/read cycle and stays
# mergeable. This codec is roaring-INSPIRED (public format idea: split
# the 32-bit space by the high 16 bits; each container is either a sorted
# uint16 array or, when dense (> 4096 values), a 8 KiB bitset), built
# from scratch with numpy — it is not CRoaring wire-compatible, and says
# so here, but it has the same asymptotics: dense ranges cost 2 bytes per
# 16-bit bucket at worst.
#
# Layout (little-endian):
#   uint32 n_containers
#   per container: uint16 high, uint8 kind (0=array, 1=bitset),
#                  uint32 cardinality, payload (uint16[card] | 8192 bytes)

_DENSE_THRESHOLD = 4096


def _ship_by_value():
    """Executor workers under an external driver session don't have the
    repo on sys.path — ship this module inside the UDF closures."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _serialize_one(vals) -> bytes:
    import numpy as np
    v = np.asarray(vals, dtype=np.int64)
    if v.size and (v.min() < 0 or v.max() > 0xFFFFFFFF):
        raise ValueError("bitmap values must fit UInt32 "
                         "(reference groupBitmap domain)")
    v = np.unique(v.astype(np.uint32))
    if v.size == 0:
        return np.array([0], dtype=np.uint32).tobytes()
    high = (v >> 16).astype(np.uint16)
    low = (v & 0xFFFF).astype(np.uint16)
    bounds = np.concatenate(([0], np.flatnonzero(np.diff(high)) + 1,
                             [v.size]))
    parts = [np.array([bounds.size - 1], dtype=np.uint32).tobytes()]
    for s, e in zip(bounds[:-1], bounds[1:]):
        card = int(e - s)
        lo = low[s:e]
        if card > _DENSE_THRESHOLD:
            bitset = np.zeros(65536, dtype=np.uint8)
            bitset[lo] = 1
            payload = np.packbits(bitset, bitorder="little").tobytes()
            kind = 1
        else:
            payload = lo.astype("<u2").tobytes()
            kind = 0
        parts.append(np.array([high[s]], dtype="<u2").tobytes())
        parts.append(bytes([kind]))
        parts.append(np.array([card], dtype="<u4").tobytes())
        parts.append(payload)
    return b"".join(parts)


def _deserialize_one(buf: bytes):
    import numpy as np
    b = memoryview(buf)
    n = int(np.frombuffer(b[:4], dtype="<u4")[0])
    pos, out = 4, []
    for _ in range(n):
        high = int(np.frombuffer(b[pos:pos + 2], dtype="<u2")[0])
        kind = b[pos + 2]
        card = int(np.frombuffer(b[pos + 3:pos + 7], dtype="<u4")[0])
        pos += 7
        if kind == 1:
            bits = np.unpackbits(
                np.frombuffer(b[pos:pos + 8192], dtype=np.uint8),
                bitorder="little")
            lo = np.flatnonzero(bits)
            pos += 8192
        else:
            lo = np.frombuffer(b[pos:pos + 2 * card], dtype="<u2")
            pos += 2 * card
        out.append((np.int64(high) << 16) | lo.astype(np.int64))
    if not out:
        return []
    return np.concatenate(out).tolist()


def bitmap_serialize(col: Column | str) -> Column:
    """array<long> bitmap state -> compact binary (per-row pandas UDF;
    numpy-vectorized within each bitmap). The storage half of
    AggregateFunction(groupBitmap, UInt32) persistence."""
    _ship_by_value()
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def ser(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _serialize_one(v if v is not None else []))

    return ser(F.col(col) if isinstance(col, str) else col)


def bitmap_deserialize(col: Column | str) -> Column:
    """Inverse of :func:`bitmap_serialize`: binary -> sorted array<long>,
    after which every bitmap op above applies unchanged — the read half
    of AggregateFunction column persistence."""
    _ship_by_value()
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def des(s: pd.Series) -> pd.Series:
        return s.map(lambda b: _deserialize_one(bytes(b)))

    return des(F.col(col) if isinstance(col, str) else col)


def bitmap_cardinality_serialized(col: Column | str) -> Column:
    """Cardinality straight from the binary state WITHOUT expanding the
    containers — the header walk reads 7 bytes per container (what makes
    stored states cheap to scan at 100 TB)."""
    _ship_by_value()
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def card(s: pd.Series) -> pd.Series:
        import numpy as np

        def one(buf) -> int:
            b = memoryview(bytes(buf))
            n = int(np.frombuffer(b[:4], dtype="<u4")[0])
            pos, total = 4, 0
            for _ in range(n):
                kind = b[pos + 2]
                c = int(np.frombuffer(b[pos + 3:pos + 7], dtype="<u4")[0])
                pos += 7 + (8192 if kind == 1 else 2 * c)
                total += c
            return total
        return s.map(one)

    return card(F.col(col) if isinstance(col, str) else col)


def bitmap_merge_serialized(df: DataFrame, keys, state_col: str,
                            out_col: str | None = None) -> DataFrame:
    """groupBitmapMergeState over PERSISTED states: per key, deserialize
    each partial binary state, union, re-serialize. Shuffles only the
    compact states (never raw ids) — the -Merge half of the
    AggregateFunction algebra for stored bitmap columns."""
    _ship_by_value()
    from pyspark.sql.types import BinaryType, StructField, StructType

    keys = list(keys)
    out_col = out_col or state_col
    schema = StructType([df.schema[k] for k in keys]
                        + [StructField(out_col, BinaryType())])

    def mg(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        vals = [np.asarray(_deserialize_one(bytes(b)), dtype=np.int64)
                for b in pdf[state_col]]
        merged = np.unique(np.concatenate(vals)) if vals else \
            np.array([], dtype=np.int64)
        row = {k: pdf[k].iloc[0] for k in keys}
        row[out_col] = _serialize_one(merged)
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(mg, schema)
