"""Structured Streaming surface tests (SURVEY.md §2.9): the reference's
WindowView/Kafka-MV chain as readStream → window agg → sink, driven
synchronously with processAllAvailable()."""

import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.streaming.windows import (
    dedup_stream, streaming_tumble_counts,
)
from clickhouse_clickhouse_spark.tables import load_table


@pytest.fixture(scope="session")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Copy events (ns timestamps normalized) to a stream-source dir.

    Session-scoped: the source dir is read-only for every streaming
    test, and the per-test parquet rewrite was a full Spark write job
    paid 12 times."""
    src = str(tmp_path_factory.mktemp("events_stream") / "events_src")
    load_table(spark, sf_dir, "events").write.parquet(src)
    return src


def test_streaming_append_with_short_watermark(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    q = streaming_tumble_counts(spark, events_dir, schema, "ts", "1 day",
                                ["event_type"], watermark="1 hour",
                                query_name="t_out2")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM t_out2")
    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 day").alias("window"), "event_type")
             .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value")))
    # all but the final (unclosed) day's windows must match batch exactly
    n_out = out.count()
    n_batch = batch.count()
    assert 0 < n_out <= n_batch
    joined = (out.alias("s").join(
        batch.alias("b"),
        (F.col("s.window") == F.col("b.window")) &
        (F.col("s.event_type") == F.col("b.event_type"))))
    mismatches = joined.filter(F.col("s.n") != F.col("b.n")).count()
    assert mismatches == 0


def test_dedup_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", events_dir).load())
    deduped = dedup_stream(stream, ["user_id", "event_type"], "ts",
                           watermark="100 days")
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName("dd_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n = spark.sql("SELECT count(*) AS n FROM dd_out").collect()[0].n
    distinct = (spark.read.parquet(events_dir)
                .select("user_id", "event_type").distinct().count())
    assert n == distinct


def test_materialized_view_cascade(spark, events_dir, tmp_path):
    """Kafka→MV→targets analog (SURVEY.md §3.2): one stream fans out to
    two derived tables inside foreachBatch — the INSERT-trigger cascade."""
    raw_out = str(tmp_path / "mv_raw")
    agg_out = str(tmp_path / "mv_agg")
    schema = spark.read.parquet(events_dir).schema

    def fan_out(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(raw_out)
        (batch_df.groupBy("event_type")
         .agg(F.count("*").alias("n"))
         .write.mode("append").parquet(agg_out))

    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", events_dir).load())
    q = stream.writeStream.foreachBatch(fan_out).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_src = spark.read.parquet(events_dir).count()
    assert spark.read.parquet(raw_out).count() == n_src
    agg = (spark.read.parquet(agg_out).groupBy("event_type")
           .agg(F.sum("n").alias("n")))
    batch = (spark.read.parquet(events_dir).groupBy("event_type")
             .agg(F.count("*").alias("n")))
    assert {(r.event_type, r.n) for r in agg.collect()} == \
           {(r.event_type, r.n) for r in batch.collect()}


def test_materialized_view_class(spark, events_dir, tmp_path):
    from clickhouse_clickhouse_spark.streaming.matview import MaterializedView

    schema = spark.read.parquet(events_dir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", events_dir).load())
    t1, t2 = str(tmp_path / "mv1"), str(tmp_path / "mv2")
    mv = MaterializedView(stream, [
        (lambda df: df.select("event_id", "user_id"), t1),
        (lambda df: df.groupBy("user_id").agg(F.count("*").alias("n")), t2),
    ])
    q = mv.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_src = spark.read.parquet(events_dir).count()
    assert spark.read.parquet(t1).count() == n_src
    assert spark.read.parquet(t2).agg(F.sum("n")).collect()[0][0] == n_src


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once restart semantics: a checkpointed stream restarted
    after new files arrive processes ONLY the new data (the reference's
    Kafka offset-commit analog)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events")
    ev.filter(F.col("event_id") < 500).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = (spark.readStream.schema(schema).format("parquet")
                  .option("path", src).load())
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    # new data arrives while the stream is down
    ev.filter(F.col("event_id") >= 500).write.mode("append").parquet(src)
    run_once()
    total = spark.read.parquet(out).count()
    assert n1 == ev.filter(F.col("event_id") < 500).count()
    assert total == ev.count()          # no re-processing of old files


def test_streaming_session_window(spark, events_dir):
    """session_window in TRUE streaming mode (watermark + append): closed
    sessions match the batch session_window aggregation."""
    schema = spark.read.parquet(events_dir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", events_dir).load())
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.session_window("ts", "30 minutes"), "user_id")
           .agg(F.count("*").alias("n")))
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("sw_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT session_window, user_id, n FROM sw_out")
    batch = (spark.read.parquet(events_dir)
             .groupBy(F.session_window("ts", "30 minutes").alias("session_window"),
                      "user_id")
             .agg(F.count("*").alias("n")))
    n_out, n_batch = out.count(), batch.count()
    assert 0 < n_out <= n_batch
    joined = out.alias("s").join(
        batch.alias("b"),
        (F.col("s.session_window") == F.col("b.session_window")) &
        (F.col("s.user_id") == F.col("b.user_id")))
    assert joined.filter(F.col("s.n") != F.col("b.n")).count() == 0


def test_live_view_complete_mode(spark, events_dir):
    """LiveView analog (§2.9): continuously re-evaluated aggregation in
    complete output mode — final state equals the batch aggregate."""
    schema = spark.read.parquet(events_dir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("path", events_dir).load())
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("live_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_type: r.n for r in spark.sql("SELECT * FROM live_out").collect()}
    expect = {r.event_type: r.n for r in
              spark.read.parquet(events_dir).groupBy("event_type")
              .agg(F.count("*").alias("n")).collect()}
    assert got == expect


def test_streaming_window_funnel_state_across_batches(spark, sf_dir, tmp_path):
    """Stateful streaming windowFunnel (streaming/funnel.py): events
    split time-wise into two files → two micro-batches; funnel chains
    that span the batch boundary must still complete, and the final
    per-user levels must equal the batch operator's."""
    from clickhouse_clickhouse_spark.operators.events import window_funnel
    from clickhouse_clickhouse_spark.streaming.funnel import (
        streaming_window_funnel,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "funnel_src")
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", 1).option("path", src).load())
    steps = ["view", "click", "purchase"]
    q = (streaming_window_funnel(stream, "user_id", "ts", "event_type",
                                 steps, 7 * 86400)
         .writeStream.outputMode("update").format("memory")
         .queryName("funnel_state_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # level is monotone per user, so the final state is the max emission
    got = {r.user_id: r.level for r in spark.sql(
        "SELECT user_id, max(level) AS level FROM funnel_state_out "
        "GROUP BY user_id").collect() if r.level > 0}
    expect = {r.user_id: r.level for r in
              window_funnel(ev, "user_id", "ts", "event_type",
                            steps, "7 DAYS").collect()}
    assert got == expect


def test_streaming_funnel_straggler_rearm_guard(spark, tmp_path):
    """Round-9 advice: a cross-batch straggler step-1 event OLDER than the
    stored chain start must not regress it (re-arm is max, mirroring the
    advance path's late-event guard). Batch 1: step1@t=100; batch 2:
    straggler step1@t=50 then step2@t=115 (window 20s). Time-ordered
    truth keeps the chain start at 100 → step2 advances → level 2; the
    pre-fix overwrite rearmed to 50 and the chain stalled at level 1."""
    import datetime

    from clickhouse_clickhouse_spark.streaming.funnel import (
        streaming_window_funnel,
    )

    T = lambda s: datetime.datetime(2024, 1, 1) + \
        datetime.timedelta(seconds=s)
    src = str(tmp_path / "straggler_src")
    b1 = spark.createDataFrame([(1, T(100), "s1")],
                               "user_id long, ts timestamp, ev string")
    b2 = spark.createDataFrame([(1, T(50), "s1"), (1, T(115), "s2")],
                               "user_id long, ts timestamp, ev string")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", 1).option("path", src).load())
    q = (streaming_window_funnel(stream, "user_id", "ts", "ev",
                                 ["s1", "s2"], 20)
         .writeStream.outputMode("update").format("memory")
         .queryName("straggler_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    level = spark.sql("SELECT max(level) AS l FROM straggler_out") \
        .collect()[0].l
    assert level == 2


def test_stream_stream_interval_join(spark, events_dir, tmp_path):
    """Two event streams (clicks vs purchases) interval-joined on
    user_id within 1 hour — results must equal the equivalent batch
    interval join."""
    from clickhouse_clickhouse_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    clicks = (src.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("c_id")))
    purchases = (spark.readStream.schema(schema).parquet(events_dir)
                 .filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("p_id")))
    joined = stream_stream_interval_join(
        clicks, purchases, "user_id", "c_ts", "p_ts",
        lower="0 seconds", upper="1 hour",
        left_watermark="2 hours", right_watermark="2 hours")
    q = (joined.writeStream.format("memory").queryName("ssj_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT count(*) AS n FROM ssj_out").collect()[0].n
    ev = spark.read.parquet(events_dir)
    c = ev.filter(F.col("event_type") == "click") \
          .select("user_id", F.col("ts").alias("c_ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("user_id_r"),
                 F.col("ts").alias("p_ts")))
    want = c.join(p, (F.col("user_id") == F.col("user_id_r"))
                  & (F.col("p_ts") >= F.col("c_ts"))
                  & (F.col("p_ts") <= F.col("c_ts")
                     + F.expr("INTERVAL 1 hour"))).count()
    assert got == want and want > 0


def test_transform_with_state_sessions(spark, events_dir, tmp_path):
    """Stateful sessionizer (applyInPandasWithState): closed sessions
    emitted by the processor must match batch gap-sessionization over
    the same events (excluding each user's final — still open —
    session). The transformWithStateInPandas twin is environment-gated
    (no protobuf) and must say so explicitly."""
    import pytest as _pytest

    from clickhouse_clickhouse_spark.streaming.sessions import (
        streaming_sessions, streaming_sessions_tws,
    )

    with _pytest.raises(EnvironmentError, match="protobuf"):
        streaming_sessions_tws(
            spark.readStream.schema(spark.read.parquet(events_dir).schema)
            .parquet(events_dir), "user_id", "ts", "value", 3600)

    schema = spark.read.parquet(events_dir).schema
    src = (spark.readStream.schema(schema).parquet(events_dir)
           .filter(F.col("user_id") < 50)
           .select("user_id", "ts", "value"))
    out = streaming_sessions(src, "user_id", "ts", "value",
                             gap_seconds=6 * 3600)
    q = (out.writeStream.format("memory").queryName("tws_sessions")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.user_id, r.start_us, r.end_us, r.n_events)
           for r in spark.sql("SELECT * FROM tws_sessions").collect()}

    ev = (spark.read.parquet(events_dir).filter(F.col("user_id") < 50)
          .select("user_id", F.col("ts").cast("double").alias("sec"),
                  "value"))
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("sec")
    s = (ev.withColumn("gap", F.col("sec") - F.lag("sec").over(w))
         .withColumn("new", F.when((F.col("gap").isNull())
                                   | (F.col("gap") > 6 * 3600), 1)
                     .otherwise(0))
         .withColumn("sid", F.sum("new").over(
             w.rowsBetween(Window.unboundedPreceding, 0))))
    sess = (s.groupBy("user_id", "sid")
            .agg((F.min("sec") * 1e6).cast("long").alias("start_us"),
                 (F.max("sec") * 1e6).cast("long").alias("end_us"),
                 F.count("*").alias("n_events"),
                 F.max("sid").alias("_")))
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    want = {(r.user_id, r.start_us, r.end_us, r.n_events)
            for r in sess.join(last_sid, "user_id")
            .filter(F.col("sid") != F.col("last_sid")).collect()}
    assert got == want and len(want) > 0


def test_streaming_sketch_rollup_matches_batch(spark, events_dir, tmp_path):
    """Streamed HLL-partial rollup merged at read time must match exact
    batch answers within sketch tolerance (and sums exactly)."""
    from clickhouse_clickhouse_spark.streaming.matview import (
        read_sketch_rollup, sketch_rollup_view,
    )

    schema = spark.read.parquet(events_dir).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(events_dir))
    target = str(tmp_path / "rollup")
    q = sketch_rollup_view(src, ["event_type"], "user_id", "value",
                           target, checkpoint=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_type: r for r in
           read_sketch_rollup(spark, target, ["event_type"]).collect()}
    want = {r.event_type: r for r in
            spark.read.parquet(events_dir).groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("u"),
                 F.sum("value").alias("s"),
                 F.count("*").alias("n")).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert abs(g.uniq_merged - w.u) <= 0.05 * w.u    # HLL tolerance
        assert abs(g.sum_total - w.s) < 1e-6             # exact re-sum
        assert g.n_total == w.n


def test_sketch_rollup_compaction_preserves_answers(spark, events_dir,
                                                    tmp_path):
    from clickhouse_clickhouse_spark.streaming.matview import (
        compact_sketch_rollup, read_sketch_rollup, sketch_rollup_view,
    )

    multi = str(tmp_path / "events_multi")
    spark.read.parquet(events_dir).repartition(4).write.parquet(multi)
    schema = spark.read.parquet(multi).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(multi))
    target = str(tmp_path / "rollup2")
    q = sketch_rollup_view(src, ["event_type"], "user_id", "value",
                           target, checkpoint=str(tmp_path / "ck2"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = {r.event_type: (r.uniq_merged, round(r.sum_total, 6), r.n_total)
              for r in read_sketch_rollup(spark, target,
                                          ["event_type"]).collect()}
    n_rows_before = spark.read.parquet(target).count()
    assert n_rows_before > len(before)   # multiple batches accumulated
    compact_sketch_rollup(spark, target, ["event_type"])
    after = {r.event_type: (r.uniq_merged, round(r.sum_total, 6), r.n_total)
             for r in read_sketch_rollup(spark, target,
                                         ["event_type"]).collect()}
    assert after == before                      # identical answers
    assert spark.read.parquet(target).count() < n_rows_before
    assert spark.read.parquet(target).count() == len(after)


def test_streaming_curation_end_to_end(spark, tmp_path):
    """The streaming curation chain: PII redacted in-stream, short and
    repetitive docs gated, cross-batch exact dedup (first batch wins),
    per-batch broadcast decontamination — survivors equal the hand
    computation."""
    from clickhouse_clickhouse_spark.streaming.curation import (
        streaming_curation,
    )

    src = str(tmp_path / "docs_src")
    tgt = str(tmp_path / "curated")
    ckp = str(tmp_path / "ckp")
    normal = "alpha beta gamma delta eps zeta eta theta iota kappa lam mu"
    b1 = [
        (1, normal),
        (2, "write to a.b@mail.io " + normal),
        (3, "rep rep rep rep rep rep rep rep rep rep rep rep"),  # rep gate
        (4, "too short"),                                        # floor
        (5, "the quick brown fox " + normal[:-3]),               # contaminated
    ]
    b2 = [
        (6, normal),                                             # dup of 1
        (7, normal.replace("alpha", "omega")),
    ]
    spark.createDataFrame(b1, "doc_id long, text string") \
        .coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    bench = spark.createDataFrame(
        [(100, "saw the quick brown fox leap")], "doc_id long, text string")

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", 1).load(src))
    q = streaming_curation(stream, bench, tgt, ckp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r.doc_id: r.text for r in spark.read.parquet(tgt).collect()}
    assert set(out) == {1, 2, 7}          # 6 deduped against 1 across batches
    assert out[2].startswith("write to <EMAIL> ")


def test_streaming_curation_state_survives_restart(spark, tmp_path):
    """The cross-batch dedup state must be recovered from the checkpoint:
    a duplicate arriving AFTER a stop/restart is still deduplicated, and
    already-curated output is not re-emitted (exactly-once)."""
    from clickhouse_clickhouse_spark.streaming.curation import (
        streaming_curation,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckp = str(tmp_path / "ckp")
    normal = "alpha beta gamma delta eps zeta eta theta iota kappa lam mu"
    bench = spark.createDataFrame([(100, "zzz yyy xxx www")],
                                  "doc_id long, text string")
    schema = "doc_id long, text string"

    spark.createDataFrame([(1, normal)], schema).coalesce(1) \
        .write.parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .format("parquet").option("maxFilesPerTrigger", 1).load(src))
    q = streaming_curation(stream, bench, tgt, ckp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.doc_id for r in spark.read.parquet(tgt).collect()} == {1}

    # second batch lands while the stream is DOWN: a dup of doc 1 + a new doc
    spark.createDataFrame(
        [(2, normal), (3, normal.replace("alpha", "omega"))],
        schema).coalesce(1).write.mode("append").parquet(src)
    stream2 = (spark.readStream.schema(spark.read.parquet(src).schema)
               .format("parquet").option("maxFilesPerTrigger", 1).load(src))
    q2 = streaming_curation(stream2, bench, tgt, ckp)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    out = [r.doc_id for r in spark.read.parquet(tgt).collect()]
    assert sorted(out) == [1, 3]          # 2 deduped across the restart
    assert out.count(1) == 1              # batch 1 not re-emitted


def test_stream_format_ingest_and_egress(spark, sf_dir, tmp_path):
    """JSONEachRow in → typed rows → TSV out, through the streaming
    format layer (the Kafka-payload parse path on a file stand-in)."""
    from clickhouse_clickhouse_spark.sources.render import (
        parse_lines,
        serialize_lines,
    )
    from clickhouse_clickhouse_spark.streaming.formats import (
        read_stream_lines,
        stream_into_outfile,
    )

    src = load_table(spark, sf_dir, "nation")
    in_dir = str(tmp_path / "json_in")
    serialize_lines(src, "JSONEachRow").write.text(in_dir)

    typed = read_stream_lines(spark, in_dir, "JSONEachRow", src.schema)
    assert typed.isStreaming
    out_dir = str(tmp_path / "tsv_out")
    q = stream_into_outfile(typed, out_dir, "TSV",
                            str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = parse_lines(
        spark.read.text(out_dir).withColumnRenamed("value", "line"),
        "TSV", src.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, src.collect()))


def test_kafka_gate_is_loud(spark, monkeypatch):
    """The Kafka source twin refuses loudly (naming the env gate and the
    file-source alternative) when no broker/jar is present, and reports
    unavailability rather than guessing."""
    import pyspark.sql.types as T

    from clickhouse_clickhouse_spark.streaming import kafka as K

    monkeypatch.delenv(K.KAFKA_ENV, raising=False)
    assert K.kafka_available(spark) is False
    schema = T.StructType([T.StructField("x", T.IntegerType())])
    with pytest.raises(RuntimeError, match=K.KAFKA_ENV):
        K.kafka_stream_lines(spark, "topic", "JSONEachRow", schema)

    # With the env var set but no connector jar, the refusal names the jar.
    monkeypatch.setenv(K.KAFKA_ENV, "localhost:9092")
    if not K.kafka_available(spark):
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            K.kafka_stream_lines(spark, "topic", "JSONEachRow", schema)


def test_tdigest_rollup_stream_merge_and_compaction(spark, events_dir,
                                                    tmp_path):
    """Round-5: the AggregatingMergeTree(quantileTDigestState) chain —
    streamed per-batch digest states, query-time merge within tolerance
    of the exact batch median, and compaction keeping answers within the
    digest's accuracy class."""
    from clickhouse_clickhouse_spark.streaming.matview import (
        compact_tdigest_rollup,
        read_tdigest_rollup,
        tdigest_rollup_view,
    )

    multi = str(tmp_path / "ev_td")
    spark.read.parquet(events_dir).repartition(4).write.parquet(multi)
    schema = spark.read.parquet(multi).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(multi))
    target = str(tmp_path / "td_rollup")
    q = tdigest_rollup_view(src, ["event_type"], "value", target,
                            checkpoint=str(tmp_path / "td_ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.event_type: (r.p50, r.p90) for r in read_tdigest_rollup(
        spark, target, ["event_type"],
        {"p50": 0.5, "p90": 0.9}).collect()}
    exact = {r.event_type: (r.e50, r.e90, r.rng)
             for r in spark.read.parquet(events_dir)
             .groupBy("event_type")
             .agg(F.expr("percentile(value, 0.5)").alias("e50"),
                  F.expr("percentile(value, 0.9)").alias("e90"),
                  (F.max("value") - F.min("value")).alias("rng"))
             .collect()}
    assert set(got) == set(exact)
    for k, (p50, p90) in got.items():
        e50, e90, rng = exact[k]
        assert abs(p50 - e50) <= 0.02 * rng
        assert abs(p90 - e90) <= 0.02 * rng

    n_before = spark.read.parquet(target).count()
    assert n_before > len(got)      # several per-batch state rows
    compact_tdigest_rollup(spark, target, ["event_type"])
    after = {r.event_type: (r.p50, r.p90) for r in read_tdigest_rollup(
        spark, target, ["event_type"],
        {"p50": 0.5, "p90": 0.9}).collect()}
    assert spark.read.parquet(target).count() == len(after)
    for k, (p50, p90) in after.items():
        e50, e90, rng = exact[k]
        assert abs(p50 - e50) <= 0.02 * rng
        assert abs(p90 - e90) <= 0.02 * rng


def test_streaming_protobuf_ingest(spark, sf_dir, tmp_path):
    """Binary protobuf payload stream -> typed rows via the wire codec,
    equal to the batch decode of the same cells."""
    from clickhouse_clickhouse_spark.sources.protobuf import (
        protobuf_encode,
        spark_schema_to_proto,
    )
    from clickhouse_clickhouse_spark.streaming.formats import (
        read_stream_protobuf,
    )

    src = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name")
    proto = spark_schema_to_proto(src.schema)
    cells = protobuf_encode(src, proto, framed=False, out_col="value")
    in_dir = str(tmp_path / "pb_in")
    cells.write.parquet(in_dir)

    typed = read_stream_protobuf(spark, in_dir, proto)
    assert typed.isStreaming
    out_dir = str(tmp_path / "pb_out")
    q = (typed.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "pb_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out_dir)
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == \
        sorted((r.n_nationkey, r.n_name) for r in src.collect())


def test_stream_avro_binary_ingest(spark, sf_dir, tmp_path):
    """Avro-framed binary Kafka-value twin: encode nation into Avro
    blocks, stream-decode each micro-batch, land parquet — typed rows
    round-trip exactly (streaming twin of the protobuf ingest)."""
    from clickhouse_clickhouse_spark.sources.avro import avro_encode_blocks
    from clickhouse_clickhouse_spark.streaming.formats import (
        read_stream_avro,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    src = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name")
    blocks = avro_encode_blocks(src).withColumnRenamed("block", "value")
    in_dir = str(tmp_path / "av_in")
    blocks.write.parquet(in_dir)

    typed = read_stream_avro(spark, in_dir, src.schema)
    assert typed.isStreaming
    out_dir = str(tmp_path / "av_out")
    q = (typed.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "av_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out_dir)
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == \
        sorted((r.n_nationkey, r.n_name) for r in src.collect())


def test_stream_msgpack_binary_ingest(spark, sf_dir, tmp_path):
    """MsgPack binary Kafka-value twin (kafka_format='MsgPack'): encode
    nation rows as msgpack cells, stream-decode each micro-batch, land
    parquet — typed rows round-trip exactly."""
    from clickhouse_clickhouse_spark.sources.msgpack import msgpack_encode
    from clickhouse_clickhouse_spark.streaming.formats import (
        read_stream_msgpack,
    )
    from clickhouse_clickhouse_spark.tables import load_table

    src = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name")
    cells = msgpack_encode(src, out_col="value")
    in_dir = str(tmp_path / "mp_in")
    cells.write.parquet(in_dir)

    typed = read_stream_msgpack(spark, in_dir,
                                "n_nationkey bigint, n_name string")
    assert typed.isStreaming
    out_dir = str(tmp_path / "mp_out")
    q = (typed.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "mp_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out_dir)
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == \
        sorted((r.n_nationkey, r.n_name) for r in src.collect())


def test_streaming_funnel_ignores_pre_chain_stragglers(spark, tmp_path):
    """Round-8 review finding: a late event arriving in a later
    micro-batch with a timestamp BEFORE the stored chain start must not
    advance the funnel (the window check alone would accept it)."""
    import datetime

    from clickhouse_clickhouse_spark.streaming.funnel import (
        streaming_window_funnel,
    )

    T = datetime.datetime
    src = str(tmp_path / "straggler_src")
    schema = "user_id long, ts timestamp, event_type string"
    # batch 1: the view at t=1000s
    spark.createDataFrame([(1, T(2024, 1, 1, 0, 16, 40), "view")],
                          schema).coalesce(1) \
        .write.mode("append").parquet(src)
    # batch 2: a STRAGGLER click from t=500s (before the view)
    spark.createDataFrame([(1, T(2024, 1, 1, 0, 8, 20), "click")],
                          schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", 1).option("path", src).load())
    q = (streaming_window_funnel(stream, "user_id", "ts", "event_type",
                                 ["view", "click"], 3600)
         .writeStream.outputMode("update").format("memory")
         .queryName("straggler_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    level = spark.sql("SELECT max(level) AS l FROM straggler_out") \
        .collect()[0].l
    assert level == 1
