"""Round-14 adversarial-review regression pins for streaming/."""

import time

import datetime as _dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_fold_events_straggler_does_not_regress_bounds():
    """A cross-batch straggler older than the stored session bounds
    must not regress start/last — a regressed `last` closed the
    session early and split it."""
    from clickhouse_clickhouse_spark.streaming.sessions import (
        _fold_events)

    gap_us = 100 * 1_000_000
    state = (100 * 10**6, 200 * 10**6, 2, 5.0)   # start=100s, last=200s
    late = pd.DataFrame({"ts": [pd.Timestamp(150, unit="s")],
                         "value": [1.0]})
    closed, open_s = _fold_events(late, "ts", "value", state, gap_us)
    assert closed == []
    assert open_s[0] == 100 * 10**6 and open_s[1] == 200 * 10**6
    # an event 100s after the TRUE last must still extend, not split
    nxt = pd.DataFrame({"ts": [pd.Timestamp(299, unit="s")],
                        "value": [1.0]})
    closed, open_s = _fold_events(nxt, "ts", "value", open_s, gap_us)
    assert closed == [] and open_s[1] == 299 * 10**6


def test_streaming_sessions_string_entity(spark, tmp_path):
    """The output schema keeps the entity column's own type — the
    hardcoded `long` crashed Arrow conversion for string keys."""
    from clickhouse_clickhouse_spark.streaming.sessions import (
        streaming_sessions)

    src_dir = str(tmp_path / "ev")
    rows = [("u-a", _dt.datetime(2024, 1, 1) +
             _dt.timedelta(seconds=t), 1.0)
            for t in (0, 10, 5000)]
    spark.createDataFrame(rows, "user string, ts timestamp, value double"
                          ).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    src = spark.readStream.schema(schema).parquet(src_dir)
    out = streaming_sessions(src, "user", "ts", "value", gap_seconds=100)
    q = (out.writeStream.format("memory").queryName("r14_sess_str")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM r14_sess_str").collect()
    assert [(r.user, r.n_events) for r in got] == [("u-a", 2)]


def test_streaming_sessions_close_idle_emits_final_session(spark, tmp_path):
    """close_idle=True: the final (otherwise forever-open) session is
    emitted after gap_seconds of wall-clock silence."""
    from clickhouse_clickhouse_spark.streaming.sessions import (
        streaming_sessions)

    src_dir = str(tmp_path / "ev")
    # both events INSIDE the 2s gap -> one still-open session that only
    # the idle timeout can close and emit
    rows = [(1, _dt.datetime(2024, 1, 1) +
             _dt.timedelta(seconds=t), 1.0) for t in (0, 1)]
    spark.createDataFrame(rows, "user long, ts timestamp, value double"
                          ).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    src = spark.readStream.schema(schema).parquet(src_dir)
    out = streaming_sessions(src, "user", "ts", "value",
                             gap_seconds=2, close_idle=True)
    q = (out.writeStream.format("memory").queryName("r14_sess_idle")
         .outputMode("append").start())
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql(
                "SELECT COUNT(*) AS n FROM r14_sess_idle").collect()[0].n
            if n:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert n == 1
    r = spark.sql("SELECT * FROM r14_sess_idle").collect()[0]
    assert (r.user, r.n_events) == (1, 2)


def test_streaming_funnel_string_entity(spark, tmp_path):
    from clickhouse_clickhouse_spark.streaming.funnel import (
        streaming_window_funnel)

    src_dir = str(tmp_path / "ev")
    rows = [("s-1", _dt.datetime(2024, 1, 1) +
             _dt.timedelta(seconds=t), e)
            for t, e in ((0, "view"), (5, "cart"), (9, "buy"))]
    spark.createDataFrame(rows, "sess string, ts timestamp, ev string"
                          ).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    src = spark.readStream.schema(schema).parquet(src_dir)
    out = streaming_window_funnel(src, "sess", "ts", "ev",
                                  ["view", "cart", "buy"], 60)
    q = (out.writeStream.format("memory").queryName("r14_fun_str")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM r14_fun_str").collect()
    assert [(r.sess, r.level) for r in got] == [("s-1", 3)]


def test_tumble_counts_missing_value_column_is_loud(spark, tmp_path):
    from pyspark.sql import types as T

    from clickhouse_clickhouse_spark.streaming.windows import (
        streaming_tumble_counts)

    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("k", T.LongType())])
    with pytest.raises(ValueError, match="pass aggs"):
        streaming_tumble_counts(spark, str(tmp_path), schema, "ts",
                                "1 hour", ["k"])
