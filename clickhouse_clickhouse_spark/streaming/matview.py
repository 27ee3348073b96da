"""Materialized-view API — the reference's INSERT-trigger MV chain
(SURVEY.md §1.1, §3.2: Kafka/any source → MV transform → target table)
formalized over Structured Streaming ``foreachBatch``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


class MaterializedView:
    """One source stream fanning out to N (transform, target) pairs —
    each micro-batch runs every transform and appends to its target
    Parquet table, exactly like the reference's per-MV ExpressionTransform
    branches in the insert pipeline."""

    def __init__(self, source: DataFrame,
                 views: Sequence[tuple[Callable[[DataFrame], DataFrame], str]]):
        if not source.isStreaming:
            raise ValueError("source must be a streaming DataFrame")
        self._source = source
        self._views = list(views)
        self._query = None

    def start(self, checkpoint: str | None = None):
        def fan_out(batch_df: DataFrame, epoch_id: int) -> None:
            # foreachBatch is at-least-once: a failure after view 1's
            # append but before the epoch commit re-runs the whole
            # epoch and would double-append (round-14 review). Writing
            # each epoch to its own partition directory with OVERWRITE
            # makes the retry idempotent — the re-run replaces its own
            # partition. Readers see `__epoch` as an ordinary
            # discovered partition column (on transactional storage a
            # Delta sink with txn version is the equivalent).
            batch_df.persist()
            try:
                for transform, target in self._views:
                    (transform(batch_df).write.mode("overwrite")
                     .parquet(f"{target.rstrip('/')}/__epoch={epoch_id}"))
            finally:
                batch_df.unpersist()

        writer = self._source.writeStream.foreachBatch(fan_out)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        self._query = writer.start()
        return self._query


def sketch_rollup_view(source: DataFrame, keys: Sequence[str],
                       uniq_col: str, sum_col: str, target: str,
                       checkpoint: str | None = None):
    """Streaming maintenance of a MERGEABLE-SKETCH rollup — the
    reference's Kafka → MV → AggregatingMergeTree(uniqCombinedState, ...)
    chain: every micro-batch appends PARTIAL states (HLL sketch binary,
    partial sum/count) per key to the summary table; readers merge states
    at query time (``read_sketch_rollup``). Appends are tiny (one row per
    key per batch) and never rewrite history — exactly the
    AggregatingMergeTree ingest pattern, with background OPTIMIZE
    replaced by the query-time merge (or an occasional compaction of the
    summary itself via ``plans.summary``).
    """
    from pyspark.sql import functions as F

    def to_partial(batch: DataFrame) -> DataFrame:
        return (batch.groupBy(*keys)
                .agg(F.hll_sketch_agg(uniq_col).alias("uniq_state"),
                     F.sum(sum_col).alias("sum_partial"),
                     F.count("*").alias("count_partial")))

    return MaterializedView(source, [(to_partial, target)]) \
        .start(checkpoint=checkpoint)


def read_sketch_rollup(spark, target: str, keys: Sequence[str]):
    """Query-time merge of the streamed partial states: HLL union for
    distincts, re-sum for additive measures — the -Merge side of the
    -State/-Merge algebra."""
    from pyspark.sql import functions as F

    return (spark.read.parquet(target).groupBy(*keys)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("uniq_state"))
                 .alias("uniq_merged"),
                 F.sum("sum_partial").alias("sum_total"),
                 F.sum("count_partial").alias("n_total")))


def _swap_compacted(compacted, target: str) -> None:
    """Replace ``target`` with the compacted frame. MUST run with the
    feeding stream STOPPED: rows appended between the compaction read
    and the swap would be deleted with the old directory (round-14
    review — the contract is now explicit instead of a silent race).
    The old directory survives as ``__pre_compact`` until the new one
    is in place, so a crash mid-swap is recoverable; the compacted rows
    land under ``__epoch=-1`` so the layout stays partition-consistent
    with the live writer's per-epoch directories."""
    import os
    import shutil

    from pyspark.sql import functions as F

    tmp = target.rstrip("/") + "__compact"
    old = target.rstrip("/") + "__pre_compact"
    (compacted.withColumn("__epoch", F.lit(-1))
     .write.mode("overwrite").partitionBy("__epoch").parquet(tmp))
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old)


def compact_sketch_rollup(spark, target: str, keys: Sequence[str]) -> None:
    """Background-merge analog for the streamed rollup: collapse the
    accumulated per-batch partial rows to ONE row per key — HLL union
    keeps the merged SKETCH (state, not estimate), sums re-add. Readers
    see identical answers before and after (the test asserts it); the
    summary just stops growing with batch count, exactly what the
    reference's background merge does to AggregatingMergeTree parts.
    Run with the feeding stream STOPPED (see _swap_compacted)."""
    from pyspark.sql import functions as F

    compacted = (spark.read.parquet(target).drop("__epoch").groupBy(*keys)
                 .agg(F.hll_union_agg("uniq_state").alias("uniq_state"),
                      F.sum("sum_partial").alias("sum_partial"),
                      F.sum("count_partial").alias("count_partial")))
    _swap_compacted(compacted, target)


def tdigest_rollup_view(source: DataFrame, keys: Sequence[str],
                        value_col: str, target: str,
                        checkpoint: str | None = None, delta: int = 100):
    """Streaming maintenance of a QUANTILE rollup — the reference's
    Kafka → MV → AggregatingMergeTree(quantileTDigestState, ...) chain:
    every micro-batch appends partial t-digest centroid states per key
    (operators/tdigest — parquet-storable array<struct<m,w>> column);
    readers merge states at query time (``read_tdigest_rollup``). Same
    append-only contract as ``sketch_rollup_view``, quantiles instead of
    distincts."""
    from clickhouse_clickhouse_spark.operators.tdigest import (
        tdigest_merge_states,
        tdigest_state,
    )

    def to_partial(batch: DataFrame) -> DataFrame:
        # one state row per key per micro-batch (partial -> merged
        # within the batch so appends stay one-row-per-key)
        return tdigest_merge_states(
            tdigest_state(batch, keys, value_col, delta=delta),
            keys, delta=delta)

    return MaterializedView(source, [(to_partial, target)]) \
        .start(checkpoint=checkpoint)


def read_tdigest_rollup(spark, target: str, keys: Sequence[str],
                        quantiles: dict[str, float], delta: int = 100):
    """Query-time -Merge over the streamed digest states + quantile
    readout."""
    from clickhouse_clickhouse_spark.operators.tdigest import (
        tdigest_merge_states,
        tdigest_quantiles,
    )

    merged = tdigest_merge_states(spark.read.parquet(target), keys,
                                  delta=delta)
    return tdigest_quantiles(merged, quantiles)


def compact_tdigest_rollup(spark, target: str, keys: Sequence[str],
                           delta: int = 100) -> None:
    """Background-merge analog: collapse accumulated per-batch digest
    states to one state row per key; readers see tolerance-identical
    quantiles before and after (digest merge is associative). Run with
    the feeding stream STOPPED (see _swap_compacted)."""
    from clickhouse_clickhouse_spark.operators.tdigest import (
        tdigest_merge_states,
    )

    compacted = tdigest_merge_states(
        spark.read.parquet(target).drop("__epoch"), keys, delta=delta)
    _swap_compacted(compacted, target)
