"""N-gram language-model perplexity scoring — the CCNet/Gopher-class
quality filter ([P] Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020 — KenLM perplexity
as the quality axis; reference analog: the corpus-quality half of the
LLM-pipeline surface, not an upstream SQL operator).

A bigram model with add-k smoothing is trained FROM the corpus itself
(two hash aggregations), then every document is scored by its average
negative log-likelihood and perplexity. Everything is DataFrame-native:

* train: explode tokens -> unigram counts; explode bigrams -> bigram
  counts. Two hash-partitioned aggregates, map-side combined — the
  count tables are ordinary DataFrames, so at 100 TB they stay
  distributed (no vocabulary ever collects to the driver).
* score: explode each doc's bigrams, LEFT join the two count tables on
  their gram keys (hash joins; Spark broadcasts automatically when a
  count table is small), per-doc aggregate of
  -log((B(w1,w2) + k) / (U(w1) + k·V)). Unseen bigrams smooth to the
  add-k floor instead of -inf.

Deterministic float math -> DuckDB-replayable oracle
(``lm_perplexity_by_source``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.text import tokens


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per consecutive lowercase token pair."""
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.zip_with(toks, F.slice(toks, 2, 1 << 30),
                       lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    pairs = F.filter(pairs, lambda p: p["w2"].isNotNull())
    return (df.select(F.col(id_col), F.explode(pairs).alias("p"))
            .select(id_col, "p.w1", "p.w2"))


def train_bigram_lm(df: DataFrame, id_col: str, text_col: str
                    ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables (unigrams, bigrams, stats) from the corpus.

    Returns ``(uni, bi, stats)``: ``uni(w1, u_cnt)``, ``bi(w1, w2,
    b_cnt)``, and a one-row ``stats(vocab_size)``. All lazy DataFrames —
    the caller's joins keep them distributed.
    """
    toks = (df.select(F.explode(tokens(F.lower(F.col(text_col))))
                      .alias("w1")))
    uni = toks.groupBy("w1").agg(F.count("*").alias("u_cnt"))
    bi = (_doc_bigrams(df, id_col, text_col)
          .groupBy("w1", "w2").agg(F.count("*").alias("b_cnt")))
    stats = uni.agg(F.count("*").alias("vocab_size"))
    return uni, bi, stats


def score_perplexity(df: DataFrame, id_col: str, text_col: str,
                     uni: DataFrame, bi: DataFrame, stats: DataFrame,
                     k: float = 0.5) -> DataFrame:
    """Per-document average NLL + perplexity under the bigram model.

    One explode, two hash joins on gram keys, one per-doc aggregate —
    a document with no bigram (0/1 tokens) scores NULL rather than a
    fake 0. ``stats`` rides in as a broadcast single-row cross join
    (never collected on the driver).
    """
    grams = _doc_bigrams(df, id_col, text_col)
    scored = (grams
              .join(uni, "w1", "left")
              .join(bi, ["w1", "w2"], "left")
              .crossJoin(F.broadcast(stats)))
    nll = -F.log((F.coalesce(F.col("b_cnt"), F.lit(0)) + F.lit(k))
                 / (F.coalesce(F.col("u_cnt"), F.lit(0))
                    + F.lit(k) * F.col("vocab_size")))
    return (scored.groupBy(id_col)
            .agg(F.avg(nll).alias("avg_nll"),
                 F.count("*").alias("n_bigrams"))
            .withColumn("perplexity", F.exp("avg_nll")))
