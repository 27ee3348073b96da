"""BM25 keyword ranking over the documents corpus — the retrieval /
decontamination twin of the embedding top-k ([P] Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009;
reference analog: the experimental full-text index's ranking use case,
[U] src/Storages/MergeTree/MergeTreeIndexFullText.cpp — the INDEX
accelerates lookup, BM25 is the standard scoring the lookup serves).

Shape: the query is a handful of terms (broadcast literals); document
term frequencies come from one explode + filtered hash aggregate; the
per-term document frequencies and the corpus averages are tiny
aggregates that ride along as broadcast single-row/one-per-term joins.
No driver-side collect; at 100 TB the only big shuffle is the per-doc
tf aggregate, hash-partitioned on (doc, term).

Deterministic float math -> DuckDB-replayable oracle (``bm25_topk_q``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.text import tokens


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
               (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1) (the
    non-negative BM25+ idf). Ties break on the id for determinism.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(F.col(id_col),
                     F.explode(tokens(F.lower(F.col(text_col))))
                     .alias("term"))
    doclen = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    # corpus stats: one row (N, avgdl) — broadcast, never collected
    stats = doclen.agg(F.count("*").alias("n_docs"),
                       F.avg("dl").alias("avgdl"))
    qt = toks.filter(F.col("term").isin(terms))
    tf = qt.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (tf.groupBy("term")
             .agg(F.countDistinct(id_col).alias("df")))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(doclen, id_col)
              .crossJoin(F.broadcast(stats)))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                 / F.col("avgdl")))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (scored.groupBy(id_col)
            .agg(F.round(F.sum(contrib), 6).alias("bm25"),
                 F.count("*").alias("n_terms_hit"))
            .orderBy(F.desc("bm25"), id_col)
            .limit(k))
