"""Ordered-event analytics: windowFunnel, retention, sequenceMatch,
sessionization (reference ``AggregateFunctionWindowFunnel/Retention/
SequenceMatch``; SURVEY.md §2.4, §4.3 item 4).

Two implementation tiers:
- DF-native cascades (used by the oracle-checked queries) — fully
  distributed, shuffle-per-level, no Python in the hot path;
- a general ``applyInPandas`` scanner for arbitrary patterns, Arrow-batched
  per entity — the slow path, bounded by max events per entity.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_funnel(df: DataFrame, entity: str, ts: str, event: str,
                  steps: Sequence[str], window: str) -> DataFrame:
    """Greedy earliest-chain funnel: per entity, level k is reached when the
    k-th step occurs after the chain's (k-1)-th timestamp and within
    ``window`` (interval string) of the chain's FIRST step.

    DF-native cascade: one conditional-min aggregation per step (k small,
    each a partial/final hash agg on the entity key — at 100 TB, k scans of
    one shuffled dataset; the per-entity state is just k timestamps).
    Returns (entity, level).
    """
    iv = F.expr(f"INTERVAL {window}")
    cur = df.filter(F.col(event) == steps[0]).groupBy(entity).agg(
        F.min(ts).alias("__t1"))
    prev_col = "__t1"
    for i, step in enumerate(steps[1:], start=2):
        nxt = (df.filter(F.col(event) == step)
               .join(cur.select(entity, "__t1", prev_col), entity)
               .filter((F.col(ts) > F.col(prev_col)) & (F.col(ts) <= F.col("__t1") + iv))
               .groupBy(entity).agg(F.min(ts).alias(f"__t{i}")))
        cur = cur.join(nxt.select(entity, f"__t{i}"), entity, "left")
        prev_col = f"__t{i}"
    # deepest reached step wins
    lvl = F.lit(1)
    for i in range(2, len(steps) + 1):
        lvl = F.when(F.col(f"__t{i}").isNotNull(), F.lit(i)).otherwise(lvl)
    return cur.select(F.col(entity), lvl.alias("level"))


def retention(df: DataFrame, entity: str, conditions: Sequence) -> DataFrame:
    """``retention(c1..cn)``: per entity, flag r1 = c1 happened; rk = c1 AND
    ck happened. One hash agg; returns (entity, r1..rn) as 0/1 ints."""
    aggs = [F.max(F.when(c, 1).otherwise(0)).alias(f"__c{i}")
            for i, c in enumerate(conditions, 1)]
    g = df.groupBy(entity).agg(*aggs)
    sel = [F.col(entity), F.col("__c1").alias("r1")]
    for i in range(2, len(conditions) + 1):
        sel.append((F.col("__c1") * F.col(f"__c{i}")).alias(f"r{i}"))
    return g.select(*sel)


def event_string(df: DataFrame, entity: str, ts: str, event: str,
                 tiebreak: str, mapping: dict[str, str]) -> DataFrame:
    """Collapse each entity's ordered event history to a compact string
    (one char per event via ``mapping``) for regex-based sequenceMatch /
    sequenceCount. Deterministic order: (ts, tiebreak).

    Per-entity strings must fit in memory — same bound as the reference's
    ``sequenceMatch`` state. Returns (entity, seq)."""
    code = F.col(event)
    for k, v in mapping.items():
        code = F.when(F.col(event) == k, F.lit(v)).otherwise(code)
    g = (df.withColumn("__c", code)
         .groupBy(entity)
         .agg(F.array_join(
             F.transform(
                 F.array_sort(F.collect_list(F.struct(F.col(ts).alias("t"),
                                                      F.col(tiebreak).alias("tb"),
                                                      F.col("__c").alias("c")))),
                 lambda s: s["c"]), "").alias("seq")))
    return g


def sequence_count(df: DataFrame, entity: str, ts: str, event: str,
                   tiebreak: str, mapping: dict[str, str], pattern: str) -> DataFrame:
    """``sequenceCount(pattern)`` over the event string: count
    non-overlapping regex matches per entity."""
    seq = event_string(df, entity, ts, event, tiebreak, mapping)
    return seq.select(
        F.col(entity),
        F.size(F.expr(f"regexp_extract_all(seq, '{pattern}', 0)")).alias("n_matches"))


def sessionize(df: DataFrame, entity: str, ts: str, gap_seconds: int) -> DataFrame:
    """Gap-based sessionization (the reference reaches this via
    windowFunnel-style idioms; Spark has ``session_window`` in streaming —
    this is the batch equivalent): new session when the gap from the
    previous event exceeds ``gap_seconds``; session id = cumulative count
    of session starts. Two stacked windows over one shuffle."""
    w = Window.partitionBy(entity).orderBy(ts)
    gap = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return (df.withColumn("__new", is_new)
            .withColumn("session_id",
                        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new"))


def funnel_apply_in_pandas(df: DataFrame, entity: str, ts: str, event: str,
                           steps: Sequence[str], window_seconds: int) -> DataFrame:
    """General windowFunnel via per-entity Arrow-batched scan
    (``applyInPandas``) — handles arbitrary step predicates/semantics the
    cascade can't. Slow path by design (SURVEY.md §2.10)."""
    steps = list(steps)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts])
        level, t0, t_prev = 0, None, None
        for _, row in pdf.iterrows():
            if level == 0:
                if row[event] == steps[0]:
                    level, t0, t_prev = 1, row[ts], row[ts]
            elif level < len(steps) and row[event] == steps[level]:
                if row[ts] > t_prev and (row[ts] - t0).total_seconds() <= window_seconds:
                    level += 1
                    t_prev = row[ts]
        return pd.DataFrame({entity: [pdf[entity].iloc[0]], "level": [level]})

    return df.groupBy(entity).applyInPandas(scan, schema=f"{entity} long, level int")


def window_funnel_hof(df: DataFrame, entity: str, ts: str, event: str,
                      steps: Sequence[str], window_seconds: int,
                      mode: str = "default",
                      tiebreak: str | None = None) -> DataFrame:
    """Single-shuffle windowFunnel: collect each entity's events into a
    sorted array and run the greedy chain scan as a JVM ``aggregate``
    higher-order fold — same semantics as the cascade form
    (window_funnel), but ONE shuffle instead of one per step. The better
    100 TB shape when k is large; per-entity history must fit in memory
    (the same bound the reference's AggregateFunctionWindowFunnel has).

    ``mode`` mirrors the reference's windowFunnel modes
    ([U] src/AggregateFunctions/AggregateFunctionWindowFunnel.cpp):

    - ``default``: greedy earliest chain; a step advances when its event
      occurs strictly after the previous step and within ``window`` of
      the chain start; unrelated events are ignored.
    - ``strict_order``: once the chain starts, ANY event other than the
      next expected step freezes the chain at its current level.
    - ``strict_dedup``: a repeat of an already-matched step event before
      the next step freezes the chain; other events are ignored.

    ``tiebreak`` names a column giving a total order for equal
    timestamps (required for deterministic strict modes). Returns
    (entity, level) for entities that reached step 1."""
    win_us = int(window_seconds) * 1_000_000
    fields = [F.unix_micros(F.col(ts)).alias("t")]
    if tiebreak:
        fields.append(F.col(tiebreak).alias("tb"))
    fields.append(F.col(event).alias("e"))
    evs = F.array_sort(F.collect_list(F.struct(*fields)))
    init = F.struct(F.lit(0).alias("level"),
                    F.lit(0).cast("long").alias("t0"),
                    F.lit(0).cast("long").alias("tp"),
                    F.lit(False).alias("dead"))

    def mk(level, t0, tp, dead=F.lit(False)):
        return F.struct(level.alias("level"), t0.alias("t0"),
                        tp.alias("tp"), dead.alias("dead"))

    def step_fn(acc, e):
        in_window = e["t"] <= acc["t0"] + F.lit(win_us)
        start = mk(F.lit(1), e["t"], e["t"])
        advanced = mk(acc["level"] + 1, acc["t0"], e["t"])
        frozen = mk(acc["level"], acc["t0"], acc["tp"], F.lit(True))
        out = F.when(acc["dead"], acc)
        out = out.when((acc["level"] == 0) & (e["e"] == steps[0]), start)
        for lvl in range(1, len(steps)):
            at = (acc["level"] == lvl) & (e["e"] == steps[lvl])
            if mode == "default":
                out = out.when(at & (e["t"] > acc["tp"]) & in_window, advanced)
            else:
                out = out.when(at & in_window, advanced)
        if mode == "strict_order":
            # any non-advancing event after the chain started freezes it
            out = out.when((acc["level"] >= 1) &
                           (acc["level"] < len(steps)), frozen)
        elif mode == "strict_dedup":
            # a repeat of an already-matched step freezes the chain
            dup = F.lit(False)
            for lvl in range(1, len(steps)):
                dup = dup | ((acc["level"] >= lvl) & (acc["level"] < len(steps)) &
                             (e["e"] == steps[lvl - 1]))
            out = out.when(dup, frozen)
        return out.otherwise(acc)

    g = df.groupBy(entity).agg(
        F.aggregate(evs, init, step_fn).getField("level").alias("level"))
    return g.filter(F.col("level") >= 1)
