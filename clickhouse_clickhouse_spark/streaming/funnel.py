"""Stateful streaming windowFunnel — the reference's windowFunnel
semantics over LIVE data (SURVEY.md §2.9: "stateful sequence detection
(windowFunnel on live data)" → ``applyInPandasWithState``).

The reference reaches this with a Kafka engine + materialized view into
an AggregatingMergeTree holding windowFunnel states ([U]
src/Storages/Kafka/StorageKafka.cpp + AggregateFunctionWindowFunnel.cpp).
Spark-first: per-entity funnel state (current level, chain-start and
last-step timestamps) lives in the state store, updated per micro-batch;
emits one row per entity per batch with the current level. State size is
O(entities × 3 longs) — the same bound the reference's state column has.

At scale the state store shards by the grouping key across executors;
no per-entity history is retained (contrast the batch HOF form, which
collects each entity's events) — this is the shape that survives an
unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_window_funnel(events: DataFrame, entity: str, ts: str,
                            event: str, steps: Sequence[str],
                            window_seconds: int,
                            output_mode: str = "update"):
    """Build the stateful funnel transformation on a STREAMING DataFrame.

    Greedy earliest-chain semantics (same as
    ``operators.events.window_funnel``): the chain starts at the first
    step-1 event seen; step k advances when its event arrives with a
    timestamp after the previous step's and within ``window_seconds`` of
    the chain start. Events may arrive across micro-batches; state
    persists between them. Returns (entity, level) in ``update`` mode.
    """
    steps = list(steps)

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            level, t0, tp = state.get
        else:
            level, t0, tp = 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts)
        for t, e in zip(rows[ts], rows[event]):
            t_us = int(pd.Timestamp(t).value // 1_000)
            if level == 0:
                if e == steps[0]:
                    level, t0, tp = 1, t_us, t_us
            elif level < len(steps) and e == steps[level]:
                if t_us > tp and t_us <= t0 + window_seconds * 1_000_000:
                    level, tp = level + 1, t_us
        state.update((level, t0, tp))
        yield pd.DataFrame({entity: [key[0]], "level": [level]})

    return (events.groupBy(entity)
            .applyInPandasWithState(
                update,
                outputStructType=f"{entity} long, level int",
                stateStructType="level int, t0 long, tp long",
                outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout))
