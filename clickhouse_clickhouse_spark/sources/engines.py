"""Table-engine analogs (SURVEY.md §2.1: Buffer, Memory, Join, Set, Null,
Merge engines map to Spark caching/view/broadcast primitives)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def memory_table(df: DataFrame, name: str) -> DataFrame:
    """Memory engine: RAM-resident named table — cache + temp view."""
    df.createOrReplaceTempView(name)
    df.cache()
    return df


def join_engine(df: DataFrame) -> DataFrame:
    """Join engine: pre-materialized build side — persist and mark for
    broadcast so repeated probes skip both the scan and the shuffle."""
    return F.broadcast(df.cache())


def set_engine(df: DataFrame, key_col: str, max_size: int = 1_000_000) -> list:
    """Set engine: pre-built IN-set. Collects the (bounded) distinct key
    set for use with ``Column.isin`` — the reference's Set engine is
    likewise RAM-materialized."""
    rows = df.select(key_col).distinct().limit(max_size + 1).collect()
    if len(rows) > max_size:
        raise ValueError(f"set larger than {max_size}; use a semi join")
    return [r[0] for r in rows]


def null_write(df: DataFrame) -> None:
    """Null engine: accept writes, store nothing (format('noop'))."""
    df.write.format("noop").mode("overwrite").save()


def merge_tables(spark: SparkSession, dfs: Sequence[DataFrame]) -> DataFrame:
    """Merge engine: union-of-tables view (missing columns null-padded)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
