"""SemDeDup cluster-then-dedup (pipeline/semdedup.py)."""

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.pipeline.semdedup import (
    cluster_near_dup_pairs,
    semantic_dedup,
)
from clickhouse_clickhouse_spark.tables import load_table


def _with_noisy_copies(e, step=40, noise=1e-4):
    """Inject near-copies (tiny deterministic perturbation on the first
    coordinate) of every ``step``-th vector, id-offset +100000."""
    copies = (e.filter(F.col("vec_id") % step == 0)
              .withColumn("vec_id", F.col("vec_id") + F.lit(100000))
              .withColumn(
                  "embedding",
                  F.concat(F.array(F.col("embedding")[0] + F.lit(noise)),
                           F.slice("embedding", 2, 63))))
    return e.unionByName(copies)


def test_semantic_dedup_drops_noisy_copies(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _with_noisy_copies(e)
    n_copies = corpus.count() - 500
    assert n_copies > 0
    kept = semantic_dedup(corpus, k=8, iterations=2, threshold=0.999)
    ids = [r.vec_id for r in kept.select("vec_id").collect()]
    # every injected near-copy dropped, every original kept
    assert sorted(ids) == sorted(range(500))


def test_cluster_pairs_find_only_copies(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = _with_noisy_copies(e)
    pairs = cluster_near_dup_pairs(corpus, k=8, iterations=1,
                                   threshold=0.999).collect()
    assert len(pairs) == corpus.count() - 500
    for p in pairs:
        assert p.dst == p.src + 100000  # each copy pairs with its original
        assert p.sim > 0.999


def test_semantic_dedup_noop_without_duplicates(spark, sf_dir):
    """Max natural pairwise cosine in the fixture is ~0.51 — nothing may
    be dropped at a 0.95 threshold."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assert semantic_dedup(e, k=8, iterations=1, threshold=0.95).count() == 500
