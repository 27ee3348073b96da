"""Hybrid retrieval fusion — reciprocal-rank fusion (RRF) of keyword
(BM25) and embedding (cosine top-k) candidate lists ([P] Cormack,
Clarke & Buettcher, "Reciprocal Rank Fusion outperforms Condorcet and
individual rank learning methods", SIGIR 2009; reference analog: the
full-text-index + vector-index retrieval pair, [U]
src/Storages/MergeTree/MergeTreeIndexFullText.cpp /
MergeTreeIndexVectorSimilarity.cpp — the indexes accelerate candidate
generation, RRF is the standard way their rankings combine).

Scale shape: the HEAVY work is upstream candidate generation
(pipeline/bm25.bm25_topk, pipeline/similarity.brute_force_topk or the
LSH/IVF ANN paths) — each list arrives already truncated to the
per-query k, so fusion touches only |queries| x k x lists rows,
partitioned by query (per-query windows, fully parallel across
queries; no global sort, no driver collect). Deterministic: ranks tie
on the doc id, the fused score rounds to 6 dp before the final rank —
fully DuckDB-replayable (``hybrid_retrieval_rrf``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(ranked: Sequence[tuple[DataFrame, str]], query_col: str,
             id_col: str, k: int = 60, topk: int = 10) -> DataFrame:
    """Fuse per-query candidate lists by reciprocal-rank:
    ``rrf(d) = Σ_lists 1 / (k + rank_list(d))`` (absent from a list
    contributes 0).

    ``ranked``: (DataFrame, score_col) pairs, each carrying
    (query_col, id_col, score_col) candidate rows — typically the
    top-k output of BM25 and an ANN/exact cosine ranker. Ranks derive
    from (score desc, id asc) within each query. Returns
    (query_col, id_col, rrf, rank, rank_0..rank_{n-1}) truncated to
    ``topk`` per query.
    """
    fused: DataFrame | None = None
    rank_cols: list[str] = []
    for i, (df, score) in enumerate(ranked):
        w = Window.partitionBy(query_col).orderBy(F.desc(score),
                                                  F.col(id_col).asc())
        r = df.select(F.col(query_col), F.col(id_col),
                      F.row_number().over(w).alias(f"rank_{i}"))
        rank_cols.append(f"rank_{i}")
        fused = r if fused is None else fused.join(
            r, [query_col, id_col], "full_outer")
    assert fused is not None, "rrf_fuse needs at least one ranked list"
    score = None
    for c in rank_cols:
        term = F.coalesce(F.lit(1.0) / (F.lit(k) + F.col(c)), F.lit(0.0))
        score = term if score is None else score + term
    out = fused.withColumn("rrf", F.round(score, 6))
    w2 = Window.partitionBy(query_col).orderBy(F.desc("rrf"),
                                               F.col(id_col).asc())
    return (out.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= topk)
            .select(query_col, id_col, "rrf", "rank", *rank_cols))
