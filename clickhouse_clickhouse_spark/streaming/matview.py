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
            batch_df.persist()
            try:
                for transform, target in self._views:
                    transform(batch_df).write.mode("append").parquet(target)
            finally:
                batch_df.unpersist()

        writer = self._source.writeStream.foreachBatch(fan_out)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        self._query = writer.start()
        return self._query
