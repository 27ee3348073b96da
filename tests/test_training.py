"""Training-set assembly ops (pipeline/training.py)."""

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.pipeline.training import (
    hash_split,
    pack_sequences,
    training_shuffle_rank,
)


def _docs(spark, n=200):
    return (spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
        (F.col("id") % 7 + 10).alias("n_tokens")))


def test_hash_split_stable_and_partitioned(spark):
    d = _docs(spark)
    s1 = {r.doc_id: r.split for r in hash_split(d, "doc_id").collect()}
    s2 = {r.doc_id: r.split
          for r in hash_split(d.repartition(13), "doc_id").collect()}
    assert s1 == s2  # membership independent of partitioning
    # growth-stability: the first 100 docs keep their split when 100 more appear
    small = {r.doc_id: r.split
             for r in hash_split(_docs(spark, 100), "doc_id").collect()}
    assert all(s1[k] == v for k, v in small.items())
    counts = {}
    for v in s1.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts["train"] > counts.get("val", 0)
    assert set(counts) <= {"train", "val", "test"}


def test_hash_split_seed_changes_assignment(spark):
    d = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(d, "doc_id", seed=0).collect()}
    b = {r.doc_id: r.split for r in hash_split(d, "doc_id", seed=7).collect()}
    assert a != b


def test_pack_sequences_global_matches_grouped_semantics(spark):
    """The no-group (grank) path must equal a driver-side prefix sum."""
    d = _docs(spark, 100)
    rows = pack_sequences(d, 64).orderBy("doc_id").collect()
    expect_start = 0
    for r in rows:
        assert r.start_token == expect_start
        assert r.pack_id == expect_start // 64
        assert r.pack_offset == expect_start % 64
        expect_start += r.n_tokens


def test_training_shuffle_rank_is_permutation(spark):
    d = _docs(spark, 150)
    ranks = [r.shuffle_rank
             for r in training_shuffle_rank(d, "doc_id").collect()]
    assert sorted(ranks) == list(range(1, 151))
    # deterministic across re-runs
    again = [r.shuffle_rank
             for r in training_shuffle_rank(d, "doc_id").collect()]
    assert ranks == again


def test_mixture_sample_properties(spark):
    from clickhouse_clickhouse_spark.pipeline.training import mixture_sample

    d = _docs(spark, 300)  # sources "0","1","2", 100 docs each
    out = mixture_sample(d, {"0": 0.6, "1": 0.4}, 100)
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "2" not in by_src              # unweighted source dropped
    assert by_src["0"] > by_src["1"]      # mixture ordering respected
    # reproducible and partition-independent
    again = mixture_sample(d.repartition(7), {"0": 0.6, "1": 0.4}, 100)
    assert sorted(r.doc_id for r in out.collect()) == \
        sorted(r.doc_id for r in again.collect())
    # a source short of its target keeps everything (no silent rebalance)
    keep_all = mixture_sample(d, {"0": 1.0}, 10_000)
    assert keep_all.count() == 100
