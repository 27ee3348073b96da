"""Projection / summary-table routing — the reference's in-table
*projections* (pre-aggregated alternate layouts, upstream
``src/Storages/MergeTree/ProjectionsDescription.cpp`` +
``optimizeUseAggregateProjection.cpp``; SURVEY.md §4.1 marks this the one
optimizer feature Catalyst doesn't cover).

A ``SummaryTable`` stores PARTIAL aggregate states (sum/count/min/max per
fine-grained key) as an ordinary Parquet table; ``route_aggregation``
answers a coarser aggregation from the summary when its keys subsume the
query's (sum-of-sums / sum-of-counts reconstitute sum/count/avg exactly —
the mergeable-state subset; non-mergeable aggs like exact distinct must go
to base). This is perf-only: results are identical either way, the summary
is just orders of magnitude smaller than the base table at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measure name -> (source column, partial op). Mergeable ops only.
MERGEABLE = ("sum", "count", "min", "max")


@dataclass
class SummaryTable:
    path: str
    keys: tuple[str, ...]
    measures: dict[str, tuple[str, str]]  # out name -> (src col, op)

    def build(self, base: DataFrame) -> None:
        aggs = []
        for name, (src, op) in self.measures.items():
            if op not in MERGEABLE:
                raise ValueError(f"non-mergeable op {op!r} for {name}")
            if op == "count":
                aggs.append(F.count(src).alias(name))
            else:
                aggs.append(getattr(F, op)(src).alias(name))
        (base.groupBy(*self.keys).agg(*aggs)
         .write.mode("overwrite").parquet(self.path))

    def can_answer(self, group_keys: Sequence[str],
                   wanted: Sequence[str]) -> bool:
        return set(group_keys) <= set(self.keys) and \
            set(wanted) <= set(self.measures)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def route_aggregation(spark: SparkSession, base: DataFrame,
                      summaries: Sequence[SummaryTable],
                      group_keys: Sequence[str],
                      wanted: dict[str, tuple[str, str]]) -> DataFrame:
    """Answer groupBy(group_keys).agg(wanted) from the smallest summary
    that subsumes it, else from base. ``wanted`` maps output name ->
    (source col, op). Merge rule: partial sums/counts re-sum, min/min,
    max/max."""
    for s in sorted(summaries, key=lambda t: len(t.keys)):
        if s.can_answer(group_keys, list(wanted)):
            df = s.read(spark)
            aggs = [_MERGE[op](name).alias(name)
                    for name, (_, op) in wanted.items()]
            return df.groupBy(*group_keys).agg(*aggs)
    aggs = []
    for name, (src, op) in wanted.items():
        aggs.append((F.count(src) if op == "count" else getattr(F, op)(src))
                    .alias(name))
    return base.groupBy(*group_keys).agg(*aggs)
