"""Training-set assembly ops: deterministic splits, sequence packing,
reproducible shuffling.

The last mile of a 100 TB curation pipeline (after dedup/quality/decontam)
is assembling examples: carve reproducible train/val/test splits, pack
variable-length documents into fixed-token training sequences, and give
the corpus a deterministic pseudo-random order so every rerun and every
resumption sees the same stream.

All three are pure DataFrame ops. The splitter and shuffler key on a
Knuth multiplicative hash (public: Knuth TAOCP vol. 3 §6.4, the 2654435761
= ⌊2³²/φ⌋ constant) because it is exactly replayable in ANSI SQL for the
oracle. String/binary ids route through ``F.xxhash64`` automatically
(wider mixing; not SQL-replayable — the oracles use numeric ids).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761  # ⌊2^32 / φ⌋
_MOD = 1 << 32


def _knuth_hash(key: Column, seed: int) -> Column:
    """(key ⊕ seed) · 2654435761 mod 2³² — a replayable scatter of an
    integer key to [0, 2³²).

    Hardened (round-5 advice): a key that casts to NULL raises instead of
    silently landing every such row in one split; ``pmod`` (not ``%``)
    keeps negative keys in [0, 2³²); the multiply is split 16/16-bit so
    keys ≥ ~3.5e9 cannot overflow the 64-bit product (both engines would
    otherwise diverge — DuckDB errors, Spark wraps). For small positive
    keys this is bit-identical to the plain ``(key*K) % 2³²`` the SQL
    oracles replay."""
    casted = key.cast("long")
    checked = F.when(
        casted.isNull(),
        F.raise_error(F.concat(
            F.lit("hash key is NULL / not castable to long: "),
            F.coalesce(key.cast("string"), F.lit("NULL")))).cast("long")
    ).otherwise(casted)
    k = F.pmod(checked.bitwiseXOR(F.lit(seed)), F.lit(_MOD))
    hi = F.pmod(F.shiftright(k, 16) * F.lit(_KNUTH), F.lit(_MOD)) * F.lit(65536)
    lo = k.bitwiseAND(F.lit(65535)) * F.lit(_KNUTH)
    return F.pmod(hi + lo, F.lit(_MOD))


def _key_hash(df: DataFrame, id_col: str, seed: int) -> Column:
    """Dispatch on the id column's type: numeric ids use the
    SQL-replayable Knuth hash; string/binary ids use xxhash64 (folded to
    the same [0, 2³²) range) instead of degenerating via cast('long')."""
    dtype = dict(df.dtypes).get(id_col, "")
    if dtype in ("string", "binary"):
        return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_MOD))
    return _knuth_hash(F.col(id_col), seed)


def hash_split(df: DataFrame, id_col: str,
               weights: Mapping[str, float] | None = None,
               seed: int = 0) -> DataFrame:
    """Assign every row a reproducible split label from its id hash.

    Membership depends only on (id, seed) — stable under corpus growth,
    re-partitioning, and re-runs (the property random() splits lack, and
    the reason eval contamination creeps in when splits aren't hashed).
    Narrow projection: no shuffle, no state."""
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(weights.values())
    h = _key_hash(df, id_col, seed).cast("double") / F.lit(float(_MOD))
    expr = None
    acc = 0.0
    *head, (last_name, _) = weights.items()
    for name, w in head:
        acc += w / total
        cond = h < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn("split", expr)


def pack_sequences(docs: DataFrame, max_tokens: int, *,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   group_col: str | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end
    in deterministic id order and cut into ``max_tokens`` blocks (the
    GPT-style packing used when examples are concatenated with separator
    tokens rather than padded). Returns the layout: ``pack_id`` (block
    holding the document's first token), ``pack_offset`` (token offset in
    that block), plus the exclusive running total ``start_token``.

    Distribution: one window per ``group_col`` partition (sources pack
    independently — parallel, and incremental corpora keep old packs
    stable). With no group, falls back to the distributed prefix-sum in
    ``operators/grank.py`` rather than a single-partition window."""
    toks = F.col(tokens_col).cast("long")
    if group_col is not None:
        w = (Window.partitionBy(group_col).orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
        out = docs.withColumn("start_token",
                              F.coalesce(F.sum(toks).over(w), F.lit(0)))
    else:
        from clickhouse_clickhouse_spark.operators.grank import (
            global_prefix_sums,
        )
        out = global_prefix_sums(docs, id_col, {"__cum": toks})
        # global_prefix_sums is inclusive; make it exclusive of self
        out = out.withColumn("start_token", F.col("__cum") - toks) \
                 .drop("__cum")
    return (out
            .withColumn("pack_id",
                        (F.col("start_token") / max_tokens).cast("long"))
            .withColumn("pack_offset", F.col("start_token") % max_tokens))


def training_shuffle_rank(df: DataFrame, id_col: str,
                          seed: int = 0) -> DataFrame:
    """Deterministic global shuffle order: rank every row by its id hash
    (ties broken by id). Reproducible across runs/partitionings — the
    property needed to resume a data stream mid-epoch. Uses the
    distributed global rank (no single-partition window)."""
    from clickhouse_clickhouse_spark.operators.grank import global_row_number

    hashed = df.withColumn("__h", _key_hash(df, id_col, seed))
    return (global_row_number(hashed, "__h", tiebreaks=(id_col,),
                              out="shuffle_rank")
            .drop("__h"))


def mixture_sample(docs: DataFrame, weights: Mapping[str, float],
                   total: int, *, source_col: str = "source",
                   id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic data mixing: sample each source down so the corpus
    approximates the target ``weights`` mixture at ``total`` documents
    (the composition step of training-set assembly — e.g. "60% web,
    30% code, 10% books").

    Per-source keep fraction = min(1, target_count / available), applied
    as a hash threshold on the id — so membership is reproducible and
    stable under re-partitioning, and a source short of its target keeps
    everything (under-sampling is surfaced by comparing achieved vs
    target counts, not silently rebalanced). One tiny aggregation for
    the source counts (broadcast back); the filter itself is a pure
    projection."""
    w = {k: float(v) for k, v in weights.items()}
    total_w = sum(w.values())
    counts = docs.groupBy(source_col).agg(F.count("*").alias("__n"))
    wexpr = None
    for k, v in w.items():
        cond = F.col(source_col) == k
        wexpr = F.when(cond, F.lit(v)) if wexpr is None \
            else wexpr.when(cond, F.lit(v))
    wexpr = wexpr.otherwise(F.lit(0.0)) if wexpr is not None else F.lit(0.0)
    frac = F.least(
        F.lit(1.0),
        F.when(F.col("__n") > 0,
               wexpr / F.lit(total_w) * F.lit(float(total)) / F.col("__n"))
        .otherwise(F.lit(0.0)))
    targets = counts.withColumn("__frac", frac).drop("__n")
    h = _key_hash(docs, id_col, seed).cast("double") / F.lit(float(_MOD))
    return (docs.join(F.broadcast(targets), source_col)
            .filter(h < F.col("__frac"))
            .drop("__frac"))


def temperature_sample(docs: DataFrame, alpha: float, total: int, *,
                       source_col: str = "source", id_col: str = "doc_id",
                       seed: int = 0) -> DataFrame:
    """Temperature-based (α-smoothed) source mixing — the multilingual /
    multi-domain rebalancing rule (public: the p_i^α ∕ Σ p_j^α sampling
    of the multilingual-pretraining literature, e.g. mBERT/XLM-R): a
    source's target share is its corpus share raised to ``alpha``
    (0 < α ≤ 1 upweights the tail; α = 1 is proportional, α = 0 uniform)
    and renormalized, then each source keeps a reproducible id-hash
    fraction sized to ``total`` documents.

    Everything derives from ONE tiny per-source count aggregate:
    smoothed shares, per-source keep fractions (capped at 1 — a source
    short of its target keeps everything, surfaced not rebalanced),
    broadcast back; the filter is a pure projection. Scale shape is
    identical to :func:`mixture_sample`."""
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("alpha must be in [0, 1]")
    counts = docs.groupBy(source_col).agg(F.count("*").alias("__n"))
    # Σ n_j^α via a 1-row aggregate cross-joined back (no collect); the
    # aggregate shares counts' lineage, so disambiguate with aliases
    tot = counts.agg(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha)))
        .alias("__z")).alias("__tot")
    c = counts.alias("__cnt")
    n = F.col("__cnt.__n").cast("double")
    frac = F.least(
        F.lit(1.0),
        F.pow(n, F.lit(alpha)) / F.col("__tot.__z")
        * F.lit(float(total)) / n)
    targets = (c.crossJoin(F.broadcast(tot))
               .select(F.col(f"__cnt.{source_col}").alias(source_col),
                       frac.alias("__frac")))
    h = _key_hash(docs, id_col, seed).cast("double") / F.lit(float(_MOD))
    return (docs.join(F.broadcast(targets), source_col)
            .filter(h < F.col("__frac"))
            .drop("__frac"))
