"""Write path — the MergeTree ingest/merge/mutation analogs
(SURVEY.md §2.1, §3.2).

Reference mapping:
- ``INSERT`` part writing (split by PARTITION BY → sort by ORDER BY →
  write column files; upstream ``MergeTreeDataWriter.cpp``) →
  ``partitionBy().sortWithinPartitions().parquet()`` — the in-file sort is
  what gives Parquet row-group min/max stats their pruning power (the
  sparse-PK-index analog).
- Background merge / ``OPTIMIZE`` (``MergeTask.cpp``) → compaction job:
  read → repartition to target file count → re-sort → atomic overwrite.
- ``ALTER TABLE UPDATE/DELETE`` mutations (``MutationsInterpreter.cpp``) →
  read → transform → overwrite (rewrite-the-parts semantics, same as the
  reference; a lakehouse format would do this transactionally).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def insert_partitioned(df: DataFrame, path: str,
                       partition_by: Sequence[str] = (),
                       sort_by: Sequence[str] = (),
                       mode: str = "overwrite",
                       bloom_filter_cols: Sequence[str] = ()) -> None:
    """INSERT: partition layout + in-file sort order (PARTITION BY +
    ORDER BY of a MergeTree table).

    ``bloom_filter_cols`` writes Parquet bloom filters for the named
    columns — the analog of the reference's bloom_filter skip index
    (point-lookup pruning on non-sort-key columns); the in-file sort
    already gives min/max row-group pruning on the sort key."""
    out = df
    if sort_by:
        if partition_by:
            out = out.repartition(*[F.col(c) for c in partition_by])
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for c in bloom_filter_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.parquet(path)


def optimize_compact(spark: SparkSession, path: str,
                     sort_by: Sequence[str] = (),
                     target_files: int = 1,
                     partition_by: Sequence[str] = ()) -> None:
    """OPTIMIZE / background merge: rewrite the layout with fewer, sorted
    files. Stages through a temp dir then swaps (the poor-man's atomic
    rename the reference does per part). ``partition_by`` preserves the
    table's partition-directory layout across the rewrite."""
    df = spark.read.parquet(path)
    compacted = df.coalesce(target_files)
    if sort_by:
        compacted = compacted.sortWithinPartitions(*sort_by)
    _rewrite(spark, compacted, path, partition_by)


def mutate_update(spark: SparkSession, path: str,
                  assignments: dict[str, Column], where: Column,
                  partition_by: Sequence[str] = ()) -> None:
    """ALTER TABLE ... UPDATE col = expr WHERE cond (mutation rewrite).
    Pass the table's ``partition_by`` to keep its directory layout."""
    df = spark.read.parquet(path)
    out = df
    for col, expr in assignments.items():
        out = out.withColumn(col, F.when(where, expr).otherwise(F.col(col)))
    _rewrite(spark, out, path, partition_by)


def mutate_delete(spark: SparkSession, path: str, where: Column,
                  partition_by: Sequence[str] = ()) -> None:
    """ALTER TABLE ... DELETE WHERE cond (anti-filter rewrite)."""
    df = spark.read.parquet(path)
    out = df.filter(~where | where.isNull())
    _rewrite(spark, out, path, partition_by)


def _rewrite(spark: SparkSession, df: DataFrame, path: str,
             partition_by: Sequence[str]) -> None:
    tmp = path.rstrip("/") + "__rewriting"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    _swap_dirs(spark, tmp, path)


def _swap_dirs(spark: SparkSession, tmp: str, path: str) -> None:
    """Replace ``path`` with ``tmp`` via the JVM Hadoop FS API (works on
    any Hadoop-compatible FS, not just local disk). Rename-aside order
    (round-14 review): the old delete-then-rename lost the whole table
    when the process died between the two; now the live directory is
    moved aside first, so a crash leaves either the old or the new
    table in place (plus a recoverable ``__old`` directory)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(conf)
    old_p = Path(path + "__old")
    fs.delete(old_p, True)
    if fs.exists(Path(path)):
        fs.rename(Path(path), old_p)
    fs.rename(Path(tmp), Path(path))
    fs.delete(old_p, True)


def detach_partition(path: str, partition_col: str, value) -> str:
    """``ALTER TABLE ... DETACH PARTITION`` (reference
    MergeTreeData::movePartitionToDetached): moves the partition's
    directory under ``<table>/_detached/`` (underscore prefix: Spark's
    file index skips it, like the reference's detached/ being outside the
    active part set) — a metadata move, no data rewrite. Returns the
    detached dir."""
    import os
    import shutil

    src = os.path.join(path, f"{partition_col}={value}")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no partition dir {src}")
    detached = os.path.join(path, "_detached")
    os.makedirs(detached, exist_ok=True)
    dst = os.path.join(detached, f"{partition_col}={value}")
    shutil.move(src, dst)
    return dst


def attach_partition(path: str, partition_col: str, value) -> str:
    """``ALTER TABLE ... ATTACH PARTITION`` — moves a previously detached
    partition directory back into the table layout."""
    import os
    import shutil

    src = os.path.join(path, "_detached", f"{partition_col}={value}")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no detached partition {src}")
    dst = os.path.join(path, f"{partition_col}={value}")
    shutil.move(src, dst)
    return dst


def drop_partition(path: str, partition_col: str, value) -> None:
    """``ALTER TABLE ... DROP PARTITION`` — removes the directory; an
    O(partition) metadata operation, never a table rewrite."""
    import shutil
    import os

    src = os.path.join(path, f"{partition_col}={value}")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no partition dir {src}")
    shutil.rmtree(src)


def apply_column_ttl(spark: SparkSession, path: str, ts_col: str,
                     cutoff: Column, ttl_cols: "Sequence[str]",
                     partition_by: "Sequence[str]" = ()) -> None:
    """Column-level TTL (reference ``TTL ... TO COLUMN`` semantics inside
    MergeTask): expired rows keep their keys but the TTL'd columns reset
    to NULL — a rewrite of only the affected rows' columns, here a full
    overwrite like the row-TTL analog ``apply_ttl``."""
    df = spark.read.parquet(path)
    expired = F.col(ts_col) < cutoff
    for c in ttl_cols:
        df = df.withColumn(c, F.when(expired, F.lit(None)).otherwise(F.col(c)))
    _rewrite(spark, df, path, partition_by)


def optimize_deduplicate(spark: SparkSession, path: str,
                         by: Sequence[str] | None = None,
                         order_by: Sequence[str] = (),
                         partition_by: Sequence[str] = ()) -> None:
    """``OPTIMIZE TABLE ... [DEDUPLICATE [BY cols]]`` — drop duplicate
    rows in place (reference MergeTree dedup merge). ``by=None`` dedups
    on ALL columns (the reference default); with ``by`` + ``order_by``
    the FIRST row per key in that order survives (deterministic, unlike
    a bare dropDuplicates under shuffle)."""
    df = spark.read.parquet(path)
    if by is None:
        out = df.dropDuplicates()
    else:
        from pyspark.sql import Window
        keys = list(by)
        order = [F.col(c) for c in order_by] or [F.col(c) for c in keys]
        w = Window.partitionBy(*keys).orderBy(*order)
        out = (df.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    _rewrite(spark, out, path, partition_by)


def modify_column_type(spark: SparkSession, path: str, column: str,
                       new_type: str,
                       partition_by: Sequence[str] = ()) -> None:
    """``ALTER TABLE ... MODIFY COLUMN c Type`` — schema-evolution
    mutation: cast-rewrite the files (the reference also rewrites parts;
    ``new_type`` accepts reference type names via types_map)."""
    from clickhouse_clickhouse_spark.types_map import parse_ch_type
    try:
        spark_type, _nullable = parse_ch_type(new_type)
    except Exception:
        spark_type = new_type  # already a Spark type string
    df = spark.read.parquet(path)
    _rewrite(spark, df.withColumn(column, F.col(column).cast(spark_type)),
             path, partition_by)
