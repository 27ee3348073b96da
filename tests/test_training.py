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


def test_hash_split_string_ids_route_through_xxhash(spark):
    """String ids must NOT degenerate via cast('long')-to-NULL (round-5
    advice): they hash through xxhash64, stay partition-independent, and
    every row keeps a split."""
    d = _docs(spark, 200).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"))
    s1 = {r.doc_id: r.split for r in hash_split(d, "doc_id").collect()}
    s2 = {r.doc_id: r.split
          for r in hash_split(d.repartition(9), "doc_id").collect()}
    assert s1 == s2 and len(s1) == 200
    assert set(s1.values()) == {"train", "val", "test"}
    # not everything in one bucket (the old degenerate behavior)
    assert max(list(s1.values()).count(x) for x in set(s1.values())) < 200


def test_hash_split_null_key_raises(spark):
    """A NULL id (or one not castable to long) raises instead of being
    silently misassigned to the last split."""
    import pytest

    d = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(Exception, match="hash key is NULL"):
        hash_split(d, "doc_id").collect()


def test_knuth_hash_large_and_negative_keys(spark):
    """Keys >= ~3.5e9 and negative keys stay in [0, 2^32) — the split
    16/16-bit multiply can't overflow and pmod keeps the sign positive;
    small positive keys are bit-identical to the plain formula."""
    from clickhouse_clickhouse_spark.pipeline.training import (
        _KNUTH,
        _MOD,
        _knuth_hash,
    )

    keys = [0, 1, 12345, 2**31 - 1, 2**32 + 17, 2**62 // 3, -5, -2**33 - 7]
    d = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.h for r in
           d.select("k", _knuth_hash(F.col("k"), 0).alias("h")).collect()}
    for k in keys:
        expect = ((k % _MOD) * _KNUTH) % _MOD
        assert got[k] == expect, k
        assert 0 <= got[k] < _MOD


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


def test_temperature_sample_rebalances_toward_tail(spark):
    """alpha < 1 upweights small sources: with a 90/10 corpus and
    alpha=0.5, the kept set's tail share must exceed its corpus share;
    alpha=1 keeps proportions; membership is deterministic."""
    import pyspark.sql.functions as F
    import pytest

    from clickhouse_clickhouse_spark.pipeline.training import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(900)] + \
           [(1000 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    kept = temperature_sample(docs, 0.5, 400).groupBy("source").count()
    shares = {r.source: r["count"] for r in kept.collect()}
    total = sum(shares.values())
    # sqrt smoothing: target small-share = sqrt(100)/(sqrt(900)+sqrt(100))
    # = 0.25 vs corpus 0.10
    assert shares["small"] / total > 0.18
    # hash-threshold sampling is approximate in COUNT but the budget is
    # the scale target
    assert 0.7 * 400 < total < 1.3 * 400

    # alpha=1 is proportional sampling
    kept1 = {r.source: r["count"] for r in
             temperature_sample(docs, 1.0, 400)
             .groupBy("source").count().collect()}
    t1 = sum(kept1.values())
    assert abs(kept1["big"] / t1 - 0.9) < 0.08

    # deterministic: same call -> same membership
    a = sorted(r.doc_id for r in
               temperature_sample(docs, 0.5, 400).collect())
    b = sorted(r.doc_id for r in
               temperature_sample(docs, 0.5, 400).collect())
    assert a == b

    with pytest.raises(ValueError):
        temperature_sample(docs, 1.5, 10)
