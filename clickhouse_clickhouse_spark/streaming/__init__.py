from clickhouse_clickhouse_spark.streaming.windows import (
    hop_agg, tumble_agg, streaming_tumble_counts,
)

__all__ = ["hop_agg", "tumble_agg", "streaming_tumble_counts"]
