"""Kafka engine ingestion — the one-line broker swap-in for every
file-source streaming twin in this package.

The reference's Kafka engine (upstream ``src/Storages/Kafka/
StorageKafka.cpp``) consumes raw payloads and hands each message to a row
input format; materialized views chained on the engine table do the
transform/aggregate. This repo implements the whole downstream chain
(``matview.py``, ``windows.py``, ``formats.py``, ``curation.py``) against
Spark's source-agnostic streaming DataFrames, so the ONLY broker-specific
code is source construction — this module.

Environment gating: the sandbox ships neither a Kafka broker nor the
``spark-sql-kafka-0-10`` connector jar, so ``kafka_stream_lines`` raises a
loud, actionable error unless both are present (``SPARK_GRAFT_KAFKA``
bootstrap servers + the jar on the session classpath). Everything after
the source — format parse, watermark, window, MV cascade, checkpointed
exactly-once restart — is identical between the Kafka path and the
file-source twin and is what ``tests/test_streaming.py`` verifies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_clickhouse_spark.sources.render import parse_lines

KAFKA_ENV = "SPARK_GRAFT_KAFKA"


def kafka_available(spark: SparkSession) -> bool:
    """True when both a bootstrap-server list (``SPARK_GRAFT_KAFKA``) and
    the Kafka connector class are reachable from this session."""
    if not os.environ.get(KAFKA_ENV):
        return False
    cls = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    jvm = spark.sparkContext._jvm
    # Utils.classForName sees Spark's mutable classloader (--jars /
    # spark.jars); the bare Class.forName fallback only sees the boot
    # classpath and false-negatived runtime-added connector jars
    # (round-14 review)
    try:
        jvm.org.apache.spark.util.Utils.classForName(cls, False, False)
        return True
    except Exception:
        pass
    try:
        jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def kafka_stream_lines(spark: SparkSession, topic: str,
                       fmt: str, schema: T.StructType,
                       starting_offsets: str = "earliest") -> DataFrame:
    """Kafka ingest of formatted payloads (JSONEachRow/CSV/TSV/Values):
    the broker twin of ``formats.read_stream_lines``. Message values are
    parsed by the SAME batch format expressions, so swapping a pipeline
    between file source and broker changes only this call.

    Raises RuntimeError naming the gate when the environment lacks a
    broker or the connector jar — honest refusal, never a silent no-op.
    """
    brokers = os.environ.get(KAFKA_ENV)
    if not brokers:
        raise RuntimeError(
            f"Kafka ingestion needs {KAFKA_ENV}=<bootstrap.servers>; this "
            "environment has no broker. Use "
            "streaming.formats.read_stream_lines (the file-source twin — "
            "identical downstream plan) or set the env var against a real "
            "cluster with the spark-sql-kafka-0-10 connector jar.")
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka-0-10 connector jar not on the session "
            "classpath; add it via spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>.")
    lines = (spark.readStream.format("kafka")
             .option("kafka.bootstrap.servers", brokers)
             .option("subscribe", topic)
             .option("startingOffsets", starting_offsets)
             .load()
             .select(F.col("value").cast("string").alias("line")))
    return parse_lines(lines, fmt, schema)
