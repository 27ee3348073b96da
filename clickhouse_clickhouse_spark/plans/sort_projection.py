"""Sort projections — the reference's second projection kind (upstream
``ProjectionsDescription.cpp`` ``ORDER BY`` projections, picked by
``optimizeUseNormalProjection.cpp``): an alternate physical copy of the
table sorted (and min/max-indexed) by a different key, so queries
filtering or sorting on that key scan a pruned, ordered layout instead of
the base order.

Spark realization: the projection is a parquet copy repartitioned by
range on the projection key and sorted within files — Parquet row-group
min/max stats on the key become tight, so a key predicate prunes most
files/row-groups at scan time (the same effect the reference gets from
the projection's primary index). ``route_scan`` answers a query from the
best projection whose key prefix matches the filter/sort column, else
from base. Results are identical either way — projections are a pure
physical-layout choice.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SortProjection:
    path: str
    order_by: tuple[str, ...]

    def build(self, base: DataFrame, files_per_partition: int = 0) -> None:
        cols = list(self.order_by)
        out = base.repartitionByRange(*cols).sortWithinPartitions(*cols)
        out.write.mode("overwrite").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def route_scan(spark: SparkSession, base: DataFrame,
               projections: Sequence[SortProjection],
               key_cols: Sequence[str]) -> DataFrame:
    """Pick the projection whose order-by key is a prefix-match for the
    query's filter/sort columns (longest prefix wins), else the base
    table. The caller applies its own filters on the returned frame —
    Parquet min/max pruning on the projection's sorted key does the
    skipping."""
    best = None
    best_len = 0
    for p in projections:
        n = 0
        for a, b in zip(p.order_by, key_cols):
            if a != b:
                break
            n += 1
        if n > best_len:
            best, best_len = p, n
    return best.read(spark) if best else base
