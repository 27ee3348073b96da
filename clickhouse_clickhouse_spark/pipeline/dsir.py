"""DSIR-style importance resampling — data selection for LM pretraining.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023). Select raw-corpus documents whose
hashed-n-gram feature distribution looks like a small in-domain target
set:

1. featurize every document into ``dim`` hash buckets (bag of unigrams);
2. estimate bucket distributions p_target and p_raw (Laplace-smoothed);
3. per-document importance log-weight = Σ_tokens log p_t(b)/p_r(b);
4. resample via Gumbel top-k on the log-weights (sampling without
   replacement proportional to the importance weights).

Scale shape (100 TB-ready): the bucket tables are ≤``dim`` rows (fixed,
small — broadcast), so the whole pipeline is one token explode, two
tiny bucket aggregations, one broadcast join back onto the exploded
tokens and one per-doc re-aggregation. No driver-side data motion, no
global sort except the final top-k (TakeOrderedAndProject).

The bucket hash and the Gumbel uniform are deterministic char-arithmetic
placeholders (ANSI-replayable, same convention as
functions/text.hashed_linear_score) so the full path is oracle-checkable;
production swaps ``xxhash64(token) % dim`` and a seeded RNG without
touching the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.text import tokens

KNUTH = 2654435761


def _bucket(t: Column, dim: int, seed: int) -> Column:
    """ANSI-replayable token → bucket hash (first/last char + length)."""
    h = (F.ascii(F.substring(t, 1, 1)) * 961
         + F.ascii(F.substring(t, F.length(t), 1)) * 31
         + F.length(t) + F.lit(seed))
    return F.pmod(h, F.lit(dim))


def doc_token_buckets(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", dim: int = 1024,
                      seed: int = 0) -> DataFrame:
    """(id, bucket) — one row per token occurrence. One narrow explode."""
    return (docs
            .select(F.col(id_col),
                    F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
            .select(id_col, _bucket(F.col("t"), dim, seed).alias("bucket")))


def importance_log_ratios(token_buckets: DataFrame, target_ids: DataFrame,
                          *, id_col: str = "doc_id", dim: int = 1024,
                          alpha: float = 1.0) -> DataFrame:
    """(bucket, log_ratio): log p_target(b) − log p_raw(b), Laplace-α
    smoothed over ``dim`` buckets. ``target_ids`` is the in-domain doc-id
    set (broadcast — a target set is small by definition in DSIR).

    The per-bucket ratio is rounded to 6 dp so downstream per-doc sums
    are grid-exact (summation-order independent at the compared
    precision)."""
    raw = token_buckets.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    tgt = (token_buckets
           .join(F.broadcast(target_ids.select(id_col).distinct()), id_col)
           .groupBy("bucket").agg(F.count("*").alias("t_cnt")))
    # totals as 1-row aggregates, cross-joined (broadcast) — no collect
    totals = (raw.agg(F.sum("r_cnt").alias("r_tot"))
              .crossJoin(tgt.agg(F.sum("t_cnt").alias("t_tot"))))
    joined = (raw.join(tgt, "bucket", "left")
              .crossJoin(F.broadcast(totals))
              .withColumn("t_cnt", F.coalesce(F.col("t_cnt"), F.lit(0))))
    a, d = float(alpha), float(dim)
    lr = (F.log((F.col("t_cnt") + a) / (F.col("t_tot") + a * d))
          - F.log((F.col("r_cnt") + a) / (F.col("r_tot") + a * d)))
    return joined.select("bucket", F.round(lr, 6).alias("log_ratio"))


def dsir_log_weights(docs: DataFrame, target_ids: DataFrame, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     dim: int = 1024, seed: int = 0,
                     alpha: float = 1.0) -> DataFrame:
    """(id, log_weight): per-document importance log-weight — the sum of
    its tokens' bucket log-ratios. The ratio table (≤dim rows) joins
    broadcast; the only corpus-wide shuffles are the bucket count and the
    per-doc re-aggregation."""
    tb = doc_token_buckets(docs, id_col=id_col, text_col=text_col,
                           dim=dim, seed=seed)
    ratios = importance_log_ratios(tb, target_ids, id_col=id_col,
                                   dim=dim, alpha=alpha)
    # round at the SAME 6-dp grid as the per-bucket ratios: the sum of
    # grid multiples is itself a grid multiple, so this round never
    # sits on a half boundary. Rounding the sum COARSER (the old 4 dp)
    # made doc sums that land exactly on a .00005 grid point flip
    # between engines (round-13 sf0.1 sweep finding, doc 971).
    return (tb.join(F.broadcast(ratios), "bucket")
            .groupBy(id_col)
            .agg(F.round(F.sum("log_ratio"), 6).alias("log_weight")))


def _gumbel(df: DataFrame, id_col: str) -> Column:
    """Deterministic per-doc Gumbel(0,1) noise from a replayable hash:
    u = hash(id) scattered to (0,1), g = −ln(−ln u). String/binary ids
    hash via xxhash64 (round-14 review: cast('long') on a string id is
    NULL under the pinned ANSI-off sessions, which NULLed every
    sample_key and silently degenerated the resample to picking the k
    lowest ids); a NULL id raises instead of sorting arbitrarily. The
    numeric path's values are unchanged."""
    dtype = dict(df.dtypes).get(id_col, "")
    key = F.col(id_col)
    if dtype in ("string", "binary"):
        h = F.pmod(F.xxhash64(key), F.lit(1000003))
    else:
        casted = key.cast("long")
        checked = F.when(
            casted.isNull() & key.isNotNull(),
            F.raise_error(F.concat(
                F.lit("_gumbel: id not castable to long: "),
                key.cast("string"))).cast("long")
        ).otherwise(casted)
        h = F.pmod(checked * F.lit(KNUTH), F.lit(1000003))
    nn = F.when(
        key.isNull(),
        F.raise_error(F.lit("_gumbel: NULL doc id")).cast("long")
    ).otherwise(h)
    u = (nn + F.lit(1)).cast("double") / F.lit(1000005.0)
    return -F.log(-F.log(u))


def dsir_resample(docs: DataFrame, target_ids: DataFrame, k: int, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  dim: int = 1024, seed: int = 0,
                  alpha: float = 1.0) -> DataFrame:
    """Gumbel top-k importance resampling: select ``k`` documents without
    replacement with probability ∝ their importance weight — equivalently
    the k largest (log_weight + Gumbel noise) keys (public equivalence:
    the Gumbel-max trick). Returns (id, log_weight, sample_key) for the
    selected documents. Global top-k is TakeOrderedAndProject (per-
    partition heaps — no single-partition sort)."""
    w = dsir_log_weights(docs, target_ids, id_col=id_col,
                         text_col=text_col, dim=dim, seed=seed, alpha=alpha)
    keyed = w.withColumn(
        "sample_key", F.round(F.col("log_weight") + _gumbel(w, id_col), 4))
    return (keyed.orderBy(F.col("sample_key").desc(), F.col(id_col))
            .limit(k))
