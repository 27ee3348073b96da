"""Benchmark decontamination — n-gram-overlap contamination detection.

The standard LLM training-data hygiene step (GPT-3 appendix C / PaLM /
Llama style): a training document is *contaminated* when it shares at
least one word n-gram (canonically n = 13) with any document of an
evaluation benchmark. At 100 TB the corpus side is huge but the
benchmark side is tiny (a few MB of eval suites), so the scale plan is:

- explode each side into DISTINCT per-doc n-grams (explode factor ≈
  tokens/doc, bounded by ``distinct`` before the join);
- reduce grams to 64-bit ``xxhash64`` keys so the join shuffles fixed
  8-byte keys, not full gram strings (``hash_grams=True``, the default);
- **broadcast** the benchmark gram set — the corpus never shuffles; the
  whole detection is a map-side hash-semi-join over the scan
  (``broadcast_bench=True``, the default);
- aggregate hits per training doc (one keyed shuffle on doc id).

Reference analog: upstream has no built-in decontamination operator —
this is part of the training-pipeline extension surface the engine adds
on top of the §2 inventory (same family as pipeline/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clickhouse_clickhouse_spark.functions.text import word_ngrams


def doc_ngrams(df: DataFrame, *, n: int, id_col: str = "doc_id",
               text_col: str = "text", distinct: bool = True) -> DataFrame:
    """Word n-grams per document: ``(id_col, gram)``, distinct per doc
    by default.

    Tokenization is whitespace split (the corpus-side convention of the
    other pipeline ops, via :func:`functions.text.word_ngrams` — the
    O(len) zip_with shingler). Documents shorter than ``n`` tokens
    contribute no rows. ``distinct=False`` skips the dedup shuffle —
    use it when a downstream aggregate dedups anyway.
    """
    out = df.select(F.col(id_col),
                    F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    return out.distinct() if distinct else out


def ngram_contamination(df: DataFrame, bench: DataFrame, *, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        hash_grams: bool = True,
                        broadcast_bench: bool = True) -> DataFrame:
    """Per-training-doc contamination report:
    ``(id_col, n_gram_hits, n_bench_docs)`` — the count of distinct
    n-grams shared with the benchmark and the count of distinct
    benchmark docs hit. Docs with no overlap are absent (inner join);
    use :func:`decontaminate` to subtract them from the corpus.

    A training doc that also appears in ``bench`` (same id) is not
    matched against itself, so a corpus can be screened against a
    benchmark drawn from it.

    The corpus side is NOT pre-deduplicated: the broadcast join is
    map-side, the final ``countDistinct`` dedups repeated grams, and the
    only corpus-side shuffle carries the post-join HIT set (grams that
    actually match the benchmark — tiny next to the gram stream). A
    pre-join ``distinct`` would shuffle every gram of every document.
    """
    g = doc_ngrams(df, n=n, id_col=id_col, text_col=text_col,
                   distinct=False)
    b = (doc_ngrams(bench, n=n, id_col=bench_id_col, text_col=bench_text_col)
         .withColumnRenamed(bench_id_col, "__bench_id"))
    if hash_grams:
        g = g.withColumn("__k", F.xxhash64("gram")).drop("gram")
        b = b.withColumn("__k", F.xxhash64("gram")).drop("gram")
    else:
        g = g.withColumnRenamed("gram", "__k")
        b = b.withColumnRenamed("gram", "__k")
    if broadcast_bench:
        b = F.broadcast(b)
    hits = g.join(b, "__k").filter(F.col(id_col) != F.col("__bench_id"))
    return (hits.groupBy(id_col)
            .agg(F.countDistinct("__k").alias("n_gram_hits"),
                 F.countDistinct("__bench_id").alias("n_bench_docs")))


def decontaminate(df: DataFrame, bench: DataFrame, *, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  **kw) -> DataFrame:
    """The corpus minus contaminated docs (left-anti join on the
    contamination report — one broadcastable key set per batch)."""
    bad = ngram_contamination(df, bench, n=n, id_col=id_col,
                              text_col=text_col, **kw).select(id_col)
    return df.join(bad, id_col, "left_anti")
