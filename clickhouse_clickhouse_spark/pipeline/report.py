"""Dataset report — the one-pass corpus summary a training-data
pipeline publishes with every snapshot (dataset-card statistics: volume,
length profile, duplication, language mix, quality profile).

Everything is a single declarative plan per grouping: one hash
aggregation over the corpus (plus one tiny exact-dup pre-agg), so at
100 TB the report costs one scan + two shuffles regardless of corpus
size. No driver-side loops; the language mix lands as a map column, not
pivoted rows, so the schema is stable across corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.text import (
    quality_score,
    token_count,
)


def corpus_report(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  group_by: str | None = "source") -> DataFrame:
    """Per-``group_by`` (or whole-corpus when None) dataset report:

    - volume: docs, tokens, chars, empty-doc share
    - length profile: mean/p50/p95 token counts
    - duplication: exact-duplicate share (1 - distinct_texts/docs)
    - quality: mean heuristic quality score (functions/text.quality_score)
    - language mix: map lang -> doc share (input ``lang`` column if
      present, else omitted)
    """
    keys = [group_by] if group_by else []
    d = (df.withColumn("__tok", token_count(F.col(text_col)))
           .withColumn("__q", quality_score(F.col(text_col))))

    # exact-dup pre-agg: one row per distinct text per group (tiny vs
    # corpus; the same hash-groupBy shape as exact_dedup)
    distinct_texts = (d.groupBy(*keys, text_col).count()
                      .groupBy(*keys)
                      .agg(F.count("*").alias("__uniq_texts")))

    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("__tok").alias("total_tokens"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.round(F.avg("__tok"), 4).alias("avg_tokens"),
        F.percentile_approx("__tok", 0.5, 10000).alias("p50_tokens"),
        F.percentile_approx("__tok", 0.95, 10000).alias("p95_tokens"),
        F.round(F.avg((F.length(F.trim(F.col(text_col))) == 0)
                      .cast("double")), 6).alias("empty_share"),
        F.round(F.avg("__q"), 6).alias("avg_quality"),
    ]
    def _join(left, right):
        # null-safe key join: a NULL group key (e.g. source unset for
        # some docs) is a legitimate group and must not vanish
        if not keys:
            return left.crossJoin(right)
        r = right
        for k in keys:
            r = r.withColumnRenamed(k, f"__rk_{k}")
        cond = [left[k].eqNullSafe(r[f"__rk_{k}"]) for k in keys]
        out = left.join(r, cond)
        return out.drop(*[f"__rk_{k}" for k in keys])

    base = d.groupBy(*keys).agg(*aggs)
    if "lang" in df.columns:
        # NULL lang (undetected) buckets as 'unknown' — map keys cannot
        # be null and dropping the docs would understate the mix
        lang_key = F.coalesce(F.col("lang"), F.lit("unknown"))
        langs = (d.groupBy(*keys, lang_key.alias("__lang")).count()
                 .groupBy(*keys)
                 .agg(F.map_from_entries(F.sort_array(F.collect_list(
                     F.struct(F.col("__lang"),
                              F.col("count"))))).alias("lang_docs")))
        base = _join(base, langs)
    out = _join(base, distinct_texts)
    return out.withColumn(
        "dup_share",
        F.round(1.0 - F.col("__uniq_texts") / F.col("n_docs"), 6)) \
        .drop("__uniq_texts")
