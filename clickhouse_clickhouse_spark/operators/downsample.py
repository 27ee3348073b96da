"""Series downsampling: largestTriangleThreeBuckets (reference
AggregateFunction largestTriangleThreeBuckets,
src/AggregateFunctions/AggregateFunctionLargestTriangleThreeBuckets.cpp).

LTTB's pick for bucket k depends on the pick for bucket k−1 (the
triangle's anchor), so it is inherently sequential per series — the
classic case for grouped ``applyInPandas``: each key's series is one
Arrow batch, the numpy kernel runs vectorized per bucket, and series
stay distributed across executors by key. Like the reference (which
holds the whole series in the aggregate state), a single series must fit
in one task's memory; the series count provides the parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def lttb_indices(xs: np.ndarray, ys: np.ndarray, n_out: int) -> list[int]:
    """Indices kept by LTTB (Steinarsson's formulation): first + last
    always; each of the n_out−2 middle buckets keeps the point with the
    largest triangle area against the previous pick and the next
    bucket's centroid. Ties break to the smallest index."""
    n = len(xs)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError("lttb: n_out must be >= 3")
    every = (n - 2) / (n_out - 2)
    a = 0
    out = [0]
    for i in range(n_out - 2):
        lo = int(np.floor(i * every)) + 1
        hi = int(np.floor((i + 1) * every)) + 1
        nlo = hi
        nhi = min(int(np.floor((i + 2) * every)) + 1, n)
        if nhi <= nlo:  # degenerate tail bucket: average the last point
            nlo, nhi = n - 1, n
        cx = xs[nlo:nhi].mean()
        cy = ys[nlo:nhi].mean()
        ax, ay = xs[a], ys[a]
        area = np.abs((ax - cx) * (ys[lo:hi] - ay)
                      - (ax - xs[lo:hi]) * (cy - ay))
        a = lo + int(np.argmax(area))
        out.append(a)
    out.append(n - 1)
    return out


def lttb(df: DataFrame, keys: Sequence[str], x: str, y: str,
         n_out: int) -> DataFrame:
    """Downsample each key's (x, y) series to ``n_out`` points with LTTB.
    Output: keys…, ``i`` (position in the x-then-y sorted series — the
    deterministic series order), ``x``, ``y``."""
    # The kernel closure references lttb_indices from this module; the
    # driver's workers don't have the repo on sys.path, so ship the
    # module by value inside the pickled closure instead of by import.
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    src = df.select(*keys, F.col(x).cast("double").alias("x"),
                    F.col(y).cast("double").alias("y"))
    key_fields = [src.schema[k] for k in keys]
    schema = T.StructType(key_fields + [
        T.StructField("i", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])

    def fn(pdf):
        pdf = pdf.sort_values(["x", "y"], kind="mergesort") \
                 .reset_index(drop=True)
        idx = lttb_indices(pdf["x"].to_numpy(float),
                           pdf["y"].to_numpy(float), n_out)
        out = pdf.iloc[idx][[*keys, "x", "y"]].copy()
        out.insert(len(keys), "i", np.asarray(idx, dtype=np.int64))
        return out

    return src.groupBy(*keys).applyInPandas(fn, schema)
