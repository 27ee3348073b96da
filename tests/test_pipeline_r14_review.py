"""Round-14 adversarial-review regression pins for pipeline/ — each
test reproduces a reviewed failure scenario against the fixed code."""

import pytest
from pyspark.sql import functions as F


def test_pq_codebook_stays_dense_with_duplicate_seeds(spark):
    """Empty Lloyd clusters (guaranteed by duplicate seed vectors) must
    carry the previous codeword forward — a dropped code_id misaligned
    every positional ADC lookup above the gap."""
    from clickhouse_clickhouse_spark.pipeline.similarity import pq_train

    # 4 distinct vectors, the rest duplicates -> with codes=8 some
    # seeds are identical and several clusters MUST end up empty
    rows = [(i, [float(i % 4), float((i * 3) % 4), 1.0, 2.0])
            for i in range(32)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(corpus, m=2, codes=8, dim=4, iterations=2)
    per_sub = (cb.groupBy("sub")
               .agg(F.countDistinct("code_id").alias("n"),
                    F.sum(F.when(F.col("codeword").isNull(), 1)
                          .otherwise(0)).alias("nulls"))
               .collect())
    assert len(per_sub) == 2
    for r in per_sub:
        assert r.n == 8 and r.nulls == 0


def test_pq_topk_no_null_distances_on_degenerate_corpus(spark):
    from clickhouse_clickhouse_spark.pipeline.similarity import pq_topk

    rows = [(i, [float(i % 4), float((i * 3) % 4), 1.0, 2.0])
            for i in range(32)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 1.0, 2.0])], "query_id long, embedding array<double>")
    out = pq_topk(corpus, queries, 3, m=2, codes=8, dim=4).collect()
    assert len(out) == 3
    assert all(r.adc_dist is not None for r in out)


def test_ann_exclude_self_optout(spark):
    """query_id namespaces independent of corpus ids can opt out of the
    formerly hard-coded self-exclusion."""
    from clickhouse_clickhouse_spark.pipeline.similarity import (
        lsh_bucketed_topk)

    corpus = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0])], "query_id long, embedding array<double>")
    kept = lsh_bucketed_topk(corpus, queries, 5, bits=2,
                             exclude_self=False).collect()
    dropped = lsh_bucketed_topk(corpus, queries, 5, bits=2).collect()
    assert {r.corpus_id for r in kept} == {0, 1, 2, 3, 4}
    assert 0 not in {r.corpus_id for r in dropped}


def test_chunk_dedup_covers_long_documents(spark):
    """The former static 0..max_chunks explode silently dropped every
    character past max_chunks*stride+size."""
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        chunk_dedup_rebuild)

    long_text = "".join(f"{i:05d}" for i in range(1000))  # 5000 chars,
    # every 100-char window distinct
    df = spark.createDataFrame([(1, long_text), (2, ""), (3, "short")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in
           chunk_dedup_rebuild(df, "doc_id", "text").collect()}
    assert out[1].clean_text == long_text      # unique chunks all kept
    assert out[3].clean_text == "short"
    assert 2 not in out or out[2].clean_text == ""


def test_chunk_dedup_string_ids(spark):
    """String doc ids previously NULLed the arithmetic keeper key ->
    keep was NULL for every chunk -> total silent data loss."""
    from clickhouse_clickhouse_spark.pipeline.dedup import chunk_dedup

    df = spark.createDataFrame(
        [("doc-b", "x" * 100), ("doc-a", "x" * 100)],
        "doc_id string, text string")
    rows = chunk_dedup(df, "doc_id", "text").collect()
    keep = {r.doc_id: r.keep for r in rows}
    assert keep == {"doc-a": True, "doc-b": False}


def test_minhash_bands_must_divide(spark):
    from clickhouse_clickhouse_spark.pipeline.dedup import (
        minhash_candidate_pairs)

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        minhash_candidate_pairs(df, "doc_id", "text",
                                num_hashes=16, bands=3)


def test_dsir_resample_string_ids(spark):
    """String ids previously cast to NULL under ANSI-off, NULLing every
    sample_key — the resample degenerated to the k lowest ids."""
    from clickhouse_clickhouse_spark.pipeline.dsir import dsir_resample

    docs = spark.createDataFrame(
        [(f"doc-{i:03d}", "spark table join query " * (1 + i % 3))
         for i in range(30)],
        "doc_id string, text string")
    target = docs.filter(F.col("doc_id") < "doc-010").select("doc_id")
    out = dsir_resample(docs, target, 5, id_col="doc_id").collect()
    assert len(out) == 5
    assert all(r.sample_key is not None for r in out)


def test_components_star_raises_on_non_convergence(spark):
    from clickhouse_clickhouse_spark.pipeline.components import (
        connected_components_star)

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "u long, v long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_star(chain, "u", "v", max_iter=1)


def test_jpeg_report_skips_null_payload(spark):
    from clickhouse_clickhouse_spark.pipeline.multimodal import (
        jpeg_roundtrip_report, synthetic_jpeg_media)

    jpeg = synthetic_jpeg_media(spark, 2).select("media_id", "payload")
    nulled = jpeg.unionByName(
        spark.createDataFrame([(999, None)],
                              jpeg.schema))
    out = jpeg_roundtrip_report(nulled).collect()
    ids = {r.media_id for r in out}
    assert 999 not in ids and len(ids) == 2
