"""t-digest mergeable quantile state — the reference's
``quantileTDigest`` / ``AggregateFunction(quantileTDigest, Float64)``
column storage (upstream ``src/AggregateFunctions/QuantileTDigest.h``),
built from the PUBLIC algorithm: Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests" (k1 scale function, merging-digest
variant with vectorized k-bin clustering).

Spark-first two-phase shape (the -State / -Merge combinator algebra):

* **partial** — ``mapInPandas``: each Arrow batch groups locally and
  compresses raw values into ≤ ~delta centroids per key. This is a
  map-side combine: only centroid states ever shuffle, never raw values,
  so the shuffle volume is O(groups x delta), independent of row count.
* **merge** — ``groupBy(keys).applyInPandas``: concatenates centroid
  lists and re-compresses. Associative and idempotent, so states can be
  merged in any tree shape (partition -> day -> month rollups).

The state is a plain ``array<struct<m double, w double>>`` column —
parquet-storable, so AggregateFunction-column persistence works exactly
like the reference: write the state table today, read it back tomorrow,
merge further, read quantiles out. Estimates are merge-order dependent
by design (as in the reference); accuracy is gated by tolerance tests,
not bit equality.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STATE_TYPE = T.ArrayType(T.StructType([
    T.StructField("m", T.DoubleType(), False),
    T.StructField("w", T.DoubleType(), False)]))


def _ship_by_value():
    """Executor workers under an external driver session (the round
    driver's plain SparkSession) don't have the repo on sys.path — ship
    this module inside the UDF closures instead."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _compress(m: np.ndarray, w: np.ndarray, delta: int):
    """One merging-digest compression pass, fully vectorized: sort by
    mean, bucket by the k1 scale function floor(k(q)) (tail buckets are
    tiny in q-space — that is the whole t-digest idea), then one
    weighted-mean reduceat per bucket."""
    if m.size == 0:
        return m, w
    o = np.argsort(m, kind="stable")
    m, w = m[o], w[o]
    total = w.sum()
    q = (np.cumsum(w) - w / 2) / total
    k = np.floor((np.arcsin(np.clip(2 * q - 1, -1.0, 1.0)) / np.pi + 0.5)
                 * delta)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
    wsum = np.add.reduceat(w, starts)
    msum = np.add.reduceat(m * w, starts)
    return msum / wsum, wsum


def _quantile(m: np.ndarray, w: np.ndarray, p: float) -> float:
    """Read one quantile out of a digest: linear interpolation between
    centroid midpoints along cumulative weight."""
    if m.size == 0:
        return float("nan")
    if m.size == 1:
        return float(m[0])
    cum = np.cumsum(w) - w / 2
    t = p * w.sum()
    if t <= cum[0]:
        return float(m[0])
    if t >= cum[-1]:
        return float(m[-1])
    i = int(np.searchsorted(cum, t))
    frac = (t - cum[i - 1]) / (cum[i] - cum[i - 1])
    return float(m[i - 1] + frac * (m[i] - m[i - 1]))


def _state_cells(m: np.ndarray, w: np.ndarray) -> list:
    return [{"m": float(a), "w": float(b)} for a, b in zip(m, w)]


def _cells_to_arrays(cells) -> tuple[np.ndarray, np.ndarray]:
    m = np.array([c["m"] for row in cells for c in row], dtype="float64")
    w = np.array([c["w"] for row in cells for c in row], dtype="float64")
    return m, w


def _keyed_schema(df: DataFrame, keys: Sequence[str],
                  state_col: str) -> T.StructType:
    return T.StructType([df.schema[k] for k in keys]
                        + [T.StructField(state_col, _STATE_TYPE)])


def tdigest_state(df: DataFrame, keys: Sequence[str], value: str,
                  delta: int = 100, state_col: str = "td") -> DataFrame:
    """quantileTDigestState(value) GROUP BY keys — partial phase.
    Returns one state row per key per Arrow batch (map-side combine);
    call :func:`tdigest_merge_states` to finish the aggregation."""
    _ship_by_value()
    keys = list(keys)
    schema = _keyed_schema(df, keys, state_col)

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for kv, g in pdf.groupby(keys, dropna=False, sort=False):
                vals = g[value].to_numpy(dtype="float64")
                vals = vals[~np.isnan(vals)]
                m, w = _compress(vals, np.ones_like(vals), delta)
                kv = kv if isinstance(kv, tuple) else (kv,)
                rows.append((*kv, _state_cells(m, w)))
            yield pd.DataFrame(rows, columns=[*keys, state_col])

    return df.select(*keys, value).mapInPandas(part, schema)


def tdigest_merge_states(df: DataFrame, keys: Sequence[str],
                         delta: int = 100,
                         state_col: str = "td") -> DataFrame:
    """quantileTDigestMerge — combine partial states per key (one
    centroid-state shuffle; raw data never moves). Input and output both
    carry the parquet-storable state column, so rollup chains compose."""
    _ship_by_value()
    keys = list(keys)
    schema = _keyed_schema(df, keys, state_col)

    def mg(pdf):
        m, w = _cells_to_arrays(pdf[state_col])
        m, w = _compress(m, w, delta)
        row = {k: pdf[k].iloc[0] for k in keys}
        row[state_col] = _state_cells(m, w)
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(mg, schema)


def tdigest_quantile(state: "T.Row | list", p: float) -> float:
    """Driver-side readout of one persisted state cell (e.g. after
    reading a stored AggregateFunction column back)."""
    m = np.array([c["m"] if isinstance(c, dict) else c.m for c in state])
    w = np.array([c["w"] if isinstance(c, dict) else c.w for c in state])
    return _quantile(m, w, p)


def tdigest_quantiles(df: DataFrame, quantiles: dict[str, float],
                      state_col: str = "td",
                      keep_state: bool = False) -> DataFrame:
    """Read quantiles out of a state column: adds one double column per
    {name: p}. Works on freshly merged states AND on states read back
    from parquet — the AggregateFunction(...) read path."""
    _ship_by_value()
    ps = dict(quantiles)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def read_out(states: pd.Series) -> pd.Series:
        out = []
        for cells in states:
            m = np.array([c["m"] for c in cells], dtype="float64")
            w = np.array([c["w"] for c in cells], dtype="float64")
            out.append([_quantile(m, w, p) for p in ps.values()])
        return pd.Series(out)

    tmp = df.withColumn("__qs", read_out(F.col(state_col)))
    for i, name in enumerate(ps):
        tmp = tmp.withColumn(name, F.col("__qs")[i])
    tmp = tmp.drop("__qs")
    return tmp if keep_state else tmp.drop(state_col)


def quantile_tdigest(df: DataFrame, keys: Sequence[str], value: str,
                     quantiles: dict[str, float],
                     delta: int = 100) -> DataFrame:
    """quantileTDigest(p)(value) GROUP BY keys, end to end: partial ->
    merge -> readout. The two-phase plan is the scale contract — shuffle
    carries only O(groups x delta) centroids."""
    st = tdigest_state(df, keys, value, delta=delta)
    merged = tdigest_merge_states(st, keys, delta=delta)
    return tdigest_quantiles(merged, quantiles)
