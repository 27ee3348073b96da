"""Streaming FORMAT ingest/egress — the Kafka-payload parse path and the
formatted sink, reusing the batch format layer (``sources/render.py``).

The reference's streaming engines deliver raw message payloads that a
row input format parses (upstream ``src/Storages/Kafka/
KafkaSource.cpp`` feeding ``*RowInputFormat``). In Spark the same shape
is: a streaming DataFrame with one string ``value`` column (Kafka source
or file-backed stand-in, per the repo's no-broker environment) → the
SAME ``parse_lines`` expressions used in batch — format parsing is pure
projection, so it composes with watermarks/windows untouched.

Egress mirrors it: ``serialize_lines`` then a text sink — each
micro-batch writes formatted part files, the streaming INTO OUTFILE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from clickhouse_clickhouse_spark.sources.render import (
    parse_lines,
    serialize_lines,
)


def read_stream_lines(spark: SparkSession, path: str, fmt: str,
                      schema: T.StructType) -> DataFrame:
    """Streaming ingest of formatted text (JSONEachRow/CSV/TSV/Values):
    file-backed line stream → typed rows via the batch parsers. With a
    broker available, replace ``readStream.text`` with
    ``readStream.format("kafka")`` and parse ``CAST(value AS STRING)`` —
    the parse expressions are identical."""
    lines = spark.readStream.text(path).withColumnRenamed("value", "line")
    return parse_lines(lines, fmt, schema)


def stream_into_outfile(df: DataFrame, path: str, fmt: str,
                        checkpoint: str):
    """Streaming formatted egress: serialize each micro-batch to the text
    format and append part files — exactly-once via the checkpoint, one
    file per task per batch (the reference's parallel formatting)."""
    lines = serialize_lines(df, fmt)
    return (lines.writeStream.outputMode("append")
            .format("text")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .start())


def read_stream_protobuf(spark: SparkSession, path: str, proto: str,
                         framed: bool = False) -> DataFrame:
    """Streaming ingest of BINARY protobuf payloads — the other common
    Kafka shape (upstream kafka_format='Protobuf'): a parquet-backed
    stream with one binary ``value`` column stands in for the broker
    (Kafka's value column has exactly this shape); each micro-batch
    decodes through the vectorized wire codec. With a broker, swap the
    source exactly as in ``streaming.kafka`` and keep ``value`` binary
    instead of casting to string."""
    from clickhouse_clickhouse_spark.sources.protobuf import (
        protobuf_decode,
    )

    stream = spark.readStream.schema("value binary").parquet(path)
    return protobuf_decode(stream, proto, col="value", framed=framed)


def read_stream_avro(spark: SparkSession, path: str,
                     schema: T.StructType,
                     codec: str = "null") -> DataFrame:
    """Streaming ingest of BINARY Avro block payloads (upstream
    kafka_format='Avro'): a parquet-backed stream with one binary
    ``value`` column stands in for the broker — each message carries an
    Avro block (count + size + body, the OCF block framing), decoded per
    micro-batch through the vectorized chain decoder
    (sources/avro.avro_decode_blocks). With a broker, swap the source as
    in ``streaming.kafka`` keeping ``value`` binary."""
    from clickhouse_clickhouse_spark.sources.avro import (
        avro_decode_blocks,
    )

    stream = spark.readStream.schema("value binary").parquet(path)
    return avro_decode_blocks(stream, schema, block_col="value",
                              codec=codec)


def read_stream_msgpack(spark: SparkSession, path: str,
                        schema: T.StructType | str) -> DataFrame:
    """Streaming ingest of BINARY MessagePack payloads (upstream
    kafka_format='MsgPack'): a parquet-backed stream with one binary
    ``value`` column stands in for the broker — each message carries one
    row's column values as consecutive msgpack values (the cell layout
    of sources/msgpack), decoded per micro-batch through the vectorized
    masked-gather decoder. With a broker, swap the source as in
    ``streaming.kafka`` keeping ``value`` binary."""
    from clickhouse_clickhouse_spark.sources.msgpack import msgpack_decode

    stream = spark.readStream.schema("value binary").parquet(path)
    return msgpack_decode(stream, schema, col="value")
