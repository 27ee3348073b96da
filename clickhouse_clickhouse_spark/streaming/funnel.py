"""Stateful streaming windowFunnel — the reference's windowFunnel
semantics over LIVE data (SURVEY.md §2.9: "stateful sequence detection
(windowFunnel on live data)" → ``applyInPandasWithState``).

The reference reaches this with a Kafka engine + materialized view into
an AggregatingMergeTree holding windowFunnel states ([U]
src/Storages/Kafka/StorageKafka.cpp + AggregateFunctionWindowFunnel.cpp).
Spark-first: per-entity funnel state (one chain-start timestamp per
level — the reference algorithm's events_timestamp array) lives in the
state store, updated per micro-batch; emits one row per entity per
batch with the current level. State size is O(entities × k longs) —
the same bound the reference's state column has.

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

    Reference-default re-arm semantics (round 8 — same per-level
    chain-start algorithm as ``operators.events.window_funnel`` /
    ``window_funnel_hof``): the level-1 chain start re-arms on every
    step-1 event, step k advances from level k-1's stored chain start
    when its event arrives within ``window_seconds`` of it (equal
    timestamps allowed), and the advance propagates the chain start.
    State = one chain-start timestamp per level (0 = unset) — still
    O(entities × k longs), no event history retained. Events may
    arrive across micro-batches; state persists between them. A late
    event with a timestamp BEFORE the stored chain start never
    advances (the lower bound below — without it a cross-batch
    straggler click older than the view would count); it also cannot
    retroactively start chains for already-seen later events, since no
    event history is kept — the documented trade of the O(k) state
    bound. Returns (entity, level) in ``update`` mode.
    """
    steps = list(steps)
    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    win_us = window_seconds * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        starts = list(state.get) if state.exists else [0] * k
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.assign(__i=rows[event].map(step_idx))
        rows = rows[rows["__i"].notna()].sort_values([ts, "__i"])
        for t, i in zip(rows[ts], rows["__i"]):
            t_us = int(pd.Timestamp(t).value // 1_000)
            i = int(i)
            if i == 0:
                # max, not overwrite: in time order the slot always holds
                # the latest step-1 timestamp, so a cross-batch straggler
                # older than the stored chain start must not regress it
                # (same late-event guard as the advance path below)
                starts[0] = max(starts[0], t_us)
            elif starts[i - 1] != 0 and \
                    starts[i - 1] <= t_us <= starts[i - 1] + win_us:
                starts[i] = starts[i - 1]
        level = 0
        for s in starts:
            if s == 0:
                break
            level += 1
        state.update(tuple(starts))
        yield pd.DataFrame({entity: [key[0]], "level": [level]})

    state_schema = ", ".join(f"s{i} long" for i in range(k))
    # entity keeps its column type (round-14 review: hardcoded `long`
    # crashed Arrow conversion for string keys)
    etype = dict(events.dtypes)[entity]
    return (events.groupBy(entity)
            .applyInPandasWithState(
                update,
                outputStructType=f"{entity} {etype}, level int",
                stateStructType=state_schema,
                outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout))
