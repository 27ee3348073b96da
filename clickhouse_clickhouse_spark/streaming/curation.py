"""Streaming training-data curation — the ingest-time version of the
batch ``pipeline_full_curation`` chain: documents arrive as files (the
Kafka stand-in of this environment), every micro-batch is scrubbed,
gated, deduplicated and decontaminated, and survivors append to the
curated corpus.

Stage placement follows what each stage needs:

- **PII redaction, token floor, word-repetition gate** — pure column
  expressions, run inside the stream (whole-stage codegen, no state).
  The top-bigram Gopher signal needs a per-doc aggregation and is
  deliberately left to the batch profile (running it per micro-batch
  would re-shuffle every batch for a signal that filters few docs the
  word-rep gate doesn't already catch).
- **Exact dedup across the whole stream** — ``dropDuplicates`` on the
  64-bit text fingerprint: keyed state store, first occurrence wins
  (the ReplacingMergeTree ingest analog). State grows with distinct
  docs; at 100 TB you bound it with a watermark on an event-time column
  or periodic state TTL — here it is the honest unbounded-dedup mode
  the reference's ReplacingMergeTree also implies.
- **Benchmark decontamination** — ``foreachBatch``: the benchmark gram
  set is a small static DataFrame, so each micro-batch anti-joins
  against a BROADCAST set (map-side, no shuffle of the batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clickhouse_clickhouse_spark.functions.text import (
    fingerprint64, redact_pii, token_count, word_repetition_fraction,
)
from clickhouse_clickhouse_spark.pipeline.decontam import decontaminate


def curate_batch_stage(df: DataFrame, *, min_tokens: int = 10,
                       max_word_rep: float = 0.6) -> DataFrame:
    """The stateless column-only stages (shared by stream and batch):
    redact → token floor → repetition gate → fingerprint."""
    t = F.col("text")
    return (df.withColumn("text", redact_pii(t))
            .filter(token_count(F.col("text")) >= min_tokens)
            .filter(F.round(word_repetition_fraction(F.col("text")), 6)
                    <= max_word_rep)
            .withColumn("__fp", fingerprint64(F.col("text"))))


def streaming_curation(stream: DataFrame, bench: DataFrame, target: str,
                       checkpoint: str, *, min_tokens: int = 10,
                       max_word_rep: float = 0.6, ngram: int = 3):
    """Start the curation stream: returns the StreamingQuery. ``bench``
    is a static (doc_id, text) DataFrame of benchmark docs."""
    if not stream.isStreaming:
        raise ValueError("streaming_curation needs a streaming DataFrame")
    gated = (curate_batch_stage(stream, min_tokens=min_tokens,
                                max_word_rep=max_word_rep)
             .dropDuplicates(["__fp"]))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # per-epoch overwrite partition -> idempotent under foreachBatch
        # retries (round-14 review; see MaterializedView.start)
        clean = decontaminate(batch_df, bench, n=ngram).drop("__fp")
        (clean.write.mode("overwrite")
         .parquet(f"{target.rstrip('/')}/__epoch={epoch_id}"))

    return (gated.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint).start())
