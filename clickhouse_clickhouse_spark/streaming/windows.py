"""Streaming surface (SURVEY.md §2.9).

The reference's streaming = ingestion engines + materialized views +
WindowView tumble/hop with watermark (upstream
``src/Storages/WindowView/StorageWindowView.cpp``). Structured Streaming is
a strict superset; the SAME ``window()`` expressions run in batch mode,
which is how the DuckDB oracle checks them (time_bucket equivalence).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumble_agg(df: DataFrame, ts: str, size: str,
               keys: Sequence[str], aggs: dict[str, F.Column]) -> DataFrame:
    """``tumble(ts, INTERVAL size)`` aggregation — batch and streaming use
    the identical expression. A tumble IS a hop with slide == size; one
    flattening lives in hop_agg (round 14 — the two bodies were
    byte-for-byte duplicates)."""
    return hop_agg(df, ts, size, size, keys, aggs)


def hop_agg(df: DataFrame, ts: str, size: str, slide: str,
            keys: Sequence[str], aggs: dict[str, F.Column]) -> DataFrame:
    """``hop(ts, INTERVAL slide, INTERVAL size)`` — sliding windows; each
    row lands in size/slide windows (Spark explodes internally)."""
    g = df.groupBy(F.window(ts, size, slide).alias("w"), *keys) \
          .agg(*[c.alias(n) for n, c in aggs.items()])
    return g.select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                    *keys, *aggs.keys())


def streaming_tumble_counts(spark, src_dir: str, schema, ts: str, size: str,
                            keys: Sequence[str], watermark: str = "1 hour",
                            query_name: str = "tumble_out",
                            aggs: dict[str, F.Column] | None = None):
    """True Structured Streaming pipeline over a parquet directory source
    (stands in for the reference's Kafka→MV chain): readStream → watermark
    → tumble agg → memory sink. Returns the started StreamingQuery; caller
    drives it with processAllAvailable().

    In production the sink is ``foreachBatch`` writing a partitioned
    Parquet/Delta table — the MV-to-MergeTree analog."""
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", src_dir).load())
    if aggs is None:
        if "value" not in stream.columns:
            raise ValueError(
                "streaming_tumble_counts: the default aggregation sums "
                "a 'value' column the source schema lacks — pass aggs= "
                "explicitly")
        aggs = {"n": F.count("*"), "sum_value": F.sum("value")}
    agg = (stream
           .withWatermark(ts, watermark)
           .groupBy(F.window(ts, size), *keys)
           .agg(*[c.alias(n) for n, c in aggs.items()]))
    return (agg.writeStream.outputMode("append")
            .format("memory").queryName(query_name).start())


def dedup_stream(stream: DataFrame, keys: Sequence[str], ts: str,
                 watermark: str = "1 hour") -> DataFrame:
    """ReplacingMergeTree-style ingest dedup on a stream.

    ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates(keys)``
    only expires state when the event-time column is AMONG the dedup
    keys — with keys like (user_id, event_type) the state store grew
    one entry per distinct key forever (round-14 review). The
    within-watermark form bounds state to the watermark horizon;
    duplicates separated by more than the watermark both survive — the
    bounded-state trade ReplacingMergeTree's background merge also
    makes (dedup within a part horizon, not across all history at
    ingest)."""
    return (stream.withWatermark(ts, watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


def stream_stream_interval_join(left: DataFrame, right: DataFrame,
                                key: str, left_ts: str, right_ts: str,
                                lower: str, upper: str,
                                left_watermark: str,
                                right_watermark: str) -> DataFrame:
    """Stream-stream event-time interval join (the reference's
    upstream streaming JOIN between two Kafka-fed tables): both sides
    watermarked, equi on ``key``, right event constrained to
    [left_ts - lower, left_ts + upper]. Spark buffers only the watermark
    horizon of state per side — bounded memory at any input rate, the
    property an unconstrained stream join lacks (and the reason the time
    bound is REQUIRED here, matching Spark's own inner-join rule).

    Column name collisions: right's key/ts are suffixed ``_r``.
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    for c in (key, right_ts):
        r = r.withColumnRenamed(c, c + "_r")
    cond = ((F.col(key) == F.col(key + "_r"))
            & (F.col(right_ts + "_r")
               >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
            & (F.col(right_ts + "_r")
               <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")))
    return l.join(r, cond, "inner")
