"""Semantic (embedding-space) deduplication — SemDeDup-style
cluster-then-dedup.

Public algorithm: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540). The 100 TB
shape: k-means the embedding space into clusters (each a tiny fraction of
the corpus), then compare pairs ONLY within a cluster — the cross-corpus
all-pairs join never exists. Complements the lexical near-dup pipeline
(``pipeline/dedup.py``: MinHash-LSH catches edited copies; SemDeDup
catches paraphrases/translations that share no shingles).

Composition of existing scale-safe pieces:

* clustering  — ``similarity.kmeans_centroids`` (broadcast-join Lloyd
  iterations; seeds via TakeOrderedAndProject, no global window);
* assignment  — ``similarity.assign_to_centroids`` (broadcast argmax);
* intra-cluster pairs — self-equi-join on ``centroid_id`` (shuffle on the
  cluster key; AQE skew-join handles hot clusters);
* keep rule   — connected components over the near-dup edges, keep each
  component's canonical (minimum) id (``components.dedup_keep_canonical``).

At 1000 executors: cluster count k scales with corpus size to hold
per-cluster occupancy flat (same lever as ``dedup.auto_bucket_bits``),
centroids stay broadcast-sized (k × dim floats), and every stage is a
hash shuffle or broadcast — no single-partition exchange, nothing on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.pipeline.components import (
    dedup_keep_canonical,
)
from clickhouse_clickhouse_spark.pipeline.similarity import (
    assign_to_centroids,
    kmeans_centroids,
)


def auto_clusters(n_rows: int, target_occupancy: int = 512) -> int:
    """Cluster count that holds per-cluster occupancy ~flat as the corpus
    grows (k ≈ n / target): per-cluster pair work stays ``occupancy²/2``
    and corpus-wide work stays LINEAR in n (n·occ/2 pairs). A fixed k is
    the quadratic trap — at 10× the corpus it costs 100× (measured in
    SCALE.md). Same lever as ``dedup.auto_bucket_bits``. Clamped to
    [4, 2²⁰]; centroids stay broadcast-sized (k·dim floats)."""
    return max(4, min(1 << 20, -(-n_rows // target_occupancy)))


def cluster_near_dup_pairs(corpus: DataFrame, *, k: int | None = None,
                           iterations: int = 2, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Within-cluster near-duplicate candidate pairs
    (``src`` < ``dst``, plus the cosine ``sim``). The self-join is keyed
    on ``centroid_id`` — per-cluster quadratic, corpus-wide linear in
    cluster occupancy. ``k=None`` (the default) sizes the cluster count
    from the corpus (one count job) via ``auto_clusters``."""
    from clickhouse_clickhouse_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )

    if k is None:
        k = auto_clusters(corpus.count())
    cents = kmeans_centroids(corpus, k, iterations=iterations,
                             vec=vec_col, id_col=id_col)
    # The L2 norm is a per-ROW invariant: computed here it costs one
    # interpreted HOF fold per corpus row; computed inside the pair
    # expression (the old cosine_similarity(va, vb) form) it re-folds
    # BOTH vectors once per candidate PAIR — per-cluster quadratic work
    # for a linear quantity (optimization round 14: 5.1 s -> ~2 s at
    # sf0.1 where 2,040 rows fan out to ~520 k candidate pairs). The
    # pair expression keeps only the irreducible dot(a, b);
    # dot/(na*nb) evaluates the identical double arithmetic, so sims
    # are bit-equal to the old form.
    # keep_vec carries the corpus vector through the assignment
    # projection — the former assigned ⋈ corpus shuffle join is gone
    # (optimization round 14). Both sides of the pair self-join read
    # this relation; persisting it evaluates the assignment (an
    # Arrow-batched kernel stage) once instead of once per side
    # (measured 3.7 → 2.5 s at sf0.1). MEMORY_AND_DISK + LRU-evictable.
    # Lifetime note (round-15 advice): the cache is part of the RETURNED
    # lazy plan, so it cannot be unpersisted here without forfeiting the
    # once-per-query evaluation; it is bounded to one assignment
    # relation per call and evicted by LRU / session end.
    assigned = (assign_to_centroids(corpus, cents, vec=vec_col,
                                    id_col=id_col, keep_vec=True)
                .withColumn("__nrm", l2_norm(F.col(vec_col)))
                .persist())
    left = assigned.select(F.col("centroid_id"),
                           F.col(id_col).alias("src"),
                           F.col(vec_col).alias("__va"),
                           F.col("__nrm").alias("__na"))
    right = assigned.select(F.col("centroid_id"),
                            F.col(id_col).alias("dst"),
                            F.col(vec_col).alias("__vb"),
                            F.col("__nrm").alias("__nb"))
    return (left.join(right, "centroid_id")
            .filter(F.col("src") < F.col("dst"))
            .withColumn("sim", dot_product(F.col("__va"), F.col("__vb"))
                        / (F.col("__na") * F.col("__nb")))
            .filter(F.col("sim") >= threshold)
            .select("src", "dst", "sim"))


def semantic_dedup(corpus: DataFrame, *, k: int | None = None,
                   iterations: int = 2,
                   threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup: keep one representative (minimum id) per semantic
    near-duplicate component; rows without a near-dup pass through
    untouched. Returns the surviving rows of ``corpus``."""
    pairs = cluster_near_dup_pairs(
        corpus, k=k, iterations=iterations, threshold=threshold,
        id_col=id_col, vec_col=vec_col).select("src", "dst")
    return dedup_keep_canonical(corpus, id_col, pairs, "src", "dst")
