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


def kmeans_centroids(corpus: DataFrame, k: int, iterations: int = 2,
                     vec: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Coarse k-means for IVF: seeds = the k lowest-id vectors
    (deterministic), then Lloyd iterations entirely as DataFrame ops —
    assignment is a broadcast-centroid cosine argmax, update is the
    label_centroids aggregation. Returns (centroid_id, centroid).

    Scale: each iteration is one broadcast join + one explode/agg over the
    corpus — no driver-side data motion beyond the k centroid vectors.
    """
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec).alias("centroid"))
    # k lowest ids via TakeOrderedAndProject (per-partition heaps), then a
    # tiny k-row window for the 0..k-1 numbering — not a full-corpus scan
    # through one task
    from pyspark.sql import Window

    seeds = c.orderBy("cid").limit(k)
    w = Window.orderBy("cid")
    cents = (seeds.withColumn("rn", F.row_number().over(w))
             .select((F.col("rn") - 1).alias("centroid_id"), "centroid"))
    for _ in range(iterations):
        assigned = assign_to_centroids(corpus, cents, vec=vec, id_col=id_col)
        cents = (assigned.join(corpus, id_col)
                 .select("centroid_id", F.posexplode(F.col(vec)).alias("dim", "v"))
                 .groupBy("centroid_id", "dim").agg(F.avg("v").alias("m"))
                 .groupBy("centroid_id")
                 .agg(F.transform(F.array_sort(F.collect_list(F.struct("dim", "m"))),
                                  lambda s: s["m"]).alias("centroid")))
    return cents


def assign_to_centroids(corpus: DataFrame, centroids: DataFrame,
                        vec: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid assignment by cosine (broadcast centroids)."""
    from pyspark.sql import Window

    scored = (corpus.select(F.col(id_col), F.col(vec).alias("__v"))
              .crossJoin(F.broadcast(centroids))
              .select(id_col, "centroid_id",
                      cosine_similarity(F.col("__v"), F.col("centroid")).alias("sim")))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(),
                                           F.col("centroid_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select(id_col, "centroid_id"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             n_centroids: int = 8, n_probe: int = 2,
             corpus_id: str = "vec_id", corpus_vec: str = "embedding",
             query_id: str = "query_id", query_vec: str = "embedding") -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into n_centroids inverted lists
    (k-means), score each query only against its n_probe nearest lists.
    At scale the corpus is WRITTEN partitioned by centroid_id, so a probe
    is a partition-pruned scan of n_probe/n_centroids of the data.
    Approximate; recall grows with n_probe."""
    from pyspark.sql import Window

    cents = kmeans_centroids(corpus, n_centroids, iterations=2,
                             vec=corpus_vec, id_col=corpus_id)
    lists = assign_to_centroids(corpus, cents, vec=corpus_vec, id_col=corpus_id)
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(corpus_vec).alias("cv")) \
              .join(lists.withColumnRenamed(corpus_id, "corpus_id"), "corpus_id")
    # queries probe their n_probe closest centroids
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("qv"))
    qs = (q.crossJoin(F.broadcast(cents))
          .select("query_id", "qv", "centroid_id",
                  cosine_similarity(F.col("qv"), F.col("centroid")).alias("csim")))
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(),
                                                F.col("centroid_id"))
    probes = (qs.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "qv", "centroid_id"))
    joined = c.join(F.broadcast(probes), "centroid_id") \
              .filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id",
        F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("corpus_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))
