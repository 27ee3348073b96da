"""Approximate-nearest-neighbor / similarity search over embedding columns
(SURVEY.md §7 M7; the reference's vector-distance functions power the same
use case — ``arrayDistance.cpp`` / ``cosineDistance``).

- ``brute_force_topk``: exact top-k by cosine — broadcast the (small) query
  set against the full corpus; one pass, no corpus shuffle. The
  correctness baseline.
- ``lsh_bucketed_topk``: sign-LSH bucketed ANN — queries only probe
  matching buckets (with multi-probe on neighboring buckets), cutting the
  scanned fraction ~2^bits-fold at the cost of recall. The 100 TB path:
  bucket is a partition key, so each query touches a few partitions
  instead of the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.vectors import cosine_similarity


def _sign_bucket(vec, bits: int):
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2 + F.when(F.element_at(vec, i + 1) > 0, 1).otherwise(0),
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                     query_id: str = "query_id", query_vec: str = "embedding",
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k per query vector. Queries are broadcast (the
    query set is small by assumption); ranking is a per-query window.
    Deterministic tiebreak: (rounded cosine desc, corpus id asc)."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(corpus_vec).alias("cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id",
        F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int,
                      bits: int = 6, multiprobe: int = 1,
                      corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                      query_id: str = "query_id", query_vec: str = "embedding") -> DataFrame:
    """Sign-LSH ANN: bucket corpus by the sign pattern of the first ``bits``
    coordinates; each query probes its own bucket plus all buckets at
    Hamming distance ≤ ``multiprobe`` (explode of a small static bucket
    list). Approximate — recall grows with multiprobe.

    At scale the corpus side is written partitioned by ``__bkt`` so a probe
    is a partition-pruned scan, not a full-corpus join.
    """
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(corpus_vec).alias("cv")) \
              .withColumn("__bkt", _sign_bucket(F.col("cv"), bits))
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv")) \
               .withColumn("__qbkt", _sign_bucket(F.col("qv"), bits))
    # Multi-probe: query bucket XOR each mask with popcount <= multiprobe.
    masks = [m for m in range(1 << bits) if bin(m).count("1") <= multiprobe]
    probe = q.withColumn("__bkt",
                         F.explode(F.array(*[
                             F.col("__qbkt").bitwiseXOR(F.lit(m)) for m in masks])))
    joined = c.join(F.broadcast(probe), "__bkt") \
              .filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id",
        F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def label_centroids(embeddings: DataFrame, label: str = "label",
                    vec: str = "embedding") -> DataFrame:
    """Per-label centroid: posexplode → (label, dim) mean → re-assemble a
    dense array ordered by dimension. The relational form (label, dim,
    mean) is what downstream joins use; the array assembly is for ANN
    seeding. Fully distributed (one explode + one agg)."""
    per_dim = (embeddings
               .select(F.col(label), F.posexplode(F.col(vec)).alias("dim", "val"))
               .groupBy(label, "dim")
               .agg(F.avg("val").alias("mean_val")))
    return (per_dim.groupBy(label)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
                lambda s: s["mean_val"]).alias("centroid")))
