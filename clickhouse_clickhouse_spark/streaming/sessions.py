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
            last, n, vsum = t_us, n + 1, vsum + float(v)
        else:
            closed.append((start, last, n, vsum))
            start, last, n, vsum = t_us, t_us, 1, float(v)
    return closed, (start, last, n, vsum)


def streaming_sessions(events: DataFrame, entity: str, ts: str,
                       value: str, gap_seconds: int) -> DataFrame:
    """Gap-timeout sessionizer on ``applyInPandasWithState``: one output
    row per CLOSED session; the open session persists in state across
    micro-batches."""
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        closed, open_s = _fold_events(
            rows, ts, value, state.get if state.exists else None, gap_us)
        state.update(open_s)
        if closed:
            yield pd.DataFrame(
                [(key[0], *c) for c in closed],
                columns=[entity] + _OUT_COLS[1:])

    out_schema = (f"{entity} long, start_us long, end_us long, "
                  f"n_events long, value_sum double")
    return (events.groupBy(entity).applyInPandasWithState(
        update, outputStructType=out_schema,
        stateStructType="start long, last long, n long, vsum double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


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
    out_schema = (f"{entity} long, start_us long, end_us long, "
                  f"n_events long, value_sum double")
    return (events.groupBy(entity).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=out_schema,
        outputMode="Append", timeMode="None"))
