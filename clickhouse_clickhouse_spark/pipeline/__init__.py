from clickhouse_clickhouse_spark.pipeline.dedup import (
    exact_dedup, minhash_signatures, minhash_candidate_pairs, ngram_jaccard_pairs,
    simhash, embedding_near_dup_pairs,
)
from clickhouse_clickhouse_spark.pipeline.report import corpus_report
from clickhouse_clickhouse_spark.pipeline.similarity import brute_force_topk, lsh_bucketed_topk

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_candidate_pairs",
    "ngram_jaccard_pairs", "simhash", "embedding_near_dup_pairs",
    "brute_force_topk", "lsh_bucketed_topk", "corpus_report",
]
