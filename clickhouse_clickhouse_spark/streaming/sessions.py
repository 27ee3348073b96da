"""Live sessionization with custom state — the reference's streaming
sessionization shape (WindowView idioms, upstream
``src/Storages/WindowView/StorageWindowView.cpp``; CH itself has no
native session window, SURVEY.md §2.9 notes Spark's is a free win).

Per entity, state holds the OPEN session (start, last, n, value_sum); an
incoming event either extends it (gap <= timeout) or closes it — closed
sessions are emitted as immutable rows and the state resets. State size
is O(entities × 4 longs), sharded by key across the cluster; emission is
append-only, so downstream sinks can be exactly-once.

Two implementations:

* ``streaming_sessions`` — ``applyInPandasWithState`` (GroupState), the
  API this container fully supports; used by the tests.
* ``streaming_sessions_tws`` — ``transformWithStateInPandas`` (Spark 4's
  successor API with ValueState + timers). Its state-server protocol
  requires the ``protobuf`` Python package, which is NOT installed in
  this environment — the builder raises a clear EnvironmentError up
  front instead of crashing mid-query (same gating policy as the Kafka
  source). The processor code is real and becomes live the moment
  protobuf exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_COLS = ["entity", "start_us", "end_us", "n_events", "value_sum"]


def _fold_events(events: pd.DataFrame, ts: str, value: str, state,
                 gap_us: int):
    """Shared session fold: returns (closed rows, open-session tuple)."""
    if state is not None:
        start, last, n, vsum = state
    else:
        start, last, n, vsum = None, None, 0, 0.0
    closed = []
    events = events.sort_values(ts)
    for t, v in zip(events[ts], events[value]):
        t_us = int(pd.Timestamp(t).value // 1_000)
        if start is None:
            start, last, n, vsum = t_us, t_us, 1, float(v)
        elif t_us - last <= gap_us:
            # min/max, not overwrite: a cross-batch straggler older
            # than the stored bounds must not regress them (round-14
            # review — a regressed `last` closed the session early and
            # split it; same guard funnel.py documents on its advance
            # path)
            start, last = min(start, t_us), max(last, t_us)
            n, vsum = n + 1, vsum + float(v)
        else:
            closed.append((start, last, n, vsum))
            start, last, n, vsum = t_us, t_us, 1, float(v)
    return closed, (start, last, n, vsum)


def streaming_sessions(events: DataFrame, entity: str, ts: str,
                       value: str, gap_seconds: int,
                       close_idle: bool = False) -> DataFrame:
    """Gap-timeout sessionizer on ``applyInPandasWithState``: one output
    row per CLOSED session; the open session persists in state across
    micro-batches.

    ``close_idle`` (round-14 review): an entity that stops producing
    events holds its final session open forever — never emitted, state
    never freed. ``close_idle=True`` arms a ProcessingTime timeout of
    ``gap_seconds`` wall-clock silence that closes and emits it (wall
    clock approximates event time on idle entities). OPT-IN because a
    ProcessingTime timeout makes the engine run continuous
    state-cleanup micro-batches, so ``processAllAvailable()`` — the
    batch-style driving pattern the tests and oracles use — never
    returns (measured: 'No new data but cleaning up state' forever);
    production queries driven by triggers want it on."""
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if close_idle and state.hasTimedOut:
            if state.exists:
                s = state.get
                state.remove()
                yield pd.DataFrame(
                    [(key[0], *s)],
                    columns=[entity] + _OUT_COLS[1:])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        closed, open_s = _fold_events(
            rows, ts, value, state.get if state.exists else None, gap_us)
        state.update(open_s)
        if close_idle:
            # setTimeoutDuration raises under NoTimeout — gate it
            state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                [(key[0], *c) for c in closed],
                columns=[entity] + _OUT_COLS[1:])

    # the entity keeps ITS column type — the former hardcoded `long`
    # crashed Arrow conversion for string keys (round-14 review)
    etype = dict(events.dtypes)[entity]
    out_schema = (f"{entity} {etype}, start_us long, end_us long, "
                  f"n_events long, value_sum double")
    return (events.groupBy(entity).applyInPandasWithState(
        update, outputStructType=out_schema,
        stateStructType="start long, last long, n long, vsum double",
        outputMode="append",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if close_idle else GroupStateTimeout.NoTimeout)))


def streaming_sessions_tws(events: DataFrame, entity: str, ts: str,
                           value: str, gap_seconds: int) -> DataFrame:
    """The same sessionizer on ``transformWithStateInPandas`` (ValueState
    API). ENVIRONMENT-GATED: raises unless the protobuf package the
    state-server protocol needs is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise EnvironmentError(
            "transformWithStateInPandas requires the 'protobuf' Python "
            "package (its state-server protocol), which is not installed "
            "in this container — use streaming_sessions "
            "(applyInPandasWithState) which is feature-equivalent here"
        ) from e

    from pyspark.sql.streaming import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "session", "start long, last long, n long, vsum double")

        def handleInputRows(self, key, rows, timerValues):
            rows = pd.concat(list(rows), ignore_index=True)
            prior = self._state.get() if self._state.exists() else None
            closed, open_s = _fold_events(rows, ts, value, prior, gap_us)
            self._state.update(open_s)
            if closed:
                yield pd.DataFrame(
                    [(key[0], *c) for c in closed],
                    columns=[entity] + _OUT_COLS[1:])

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    etype = dict(events.dtypes)[entity]
    out_schema = (f"{entity} {etype}, start_us long, end_us long, "
                  f"n_events long, value_sum double")
    return (events.groupBy(entity).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=out_schema,
        outputMode="Append", timeMode="None"))
