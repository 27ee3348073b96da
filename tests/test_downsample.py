"""LTTB downsampling: hand-computed selection + invariants."""

import numpy as np
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.operators.downsample import lttb, lttb_indices


def test_lttb_indices_hand_case():
    # 5 points, keep 4: bucket 2 chooses (2,0) — area 20 vs 5 for (3,5)
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 10.0, 0.0, 5.0, 0.0])
    assert lttb_indices(xs, ys, 4) == [0, 1, 2, 4]
    assert lttb_indices(xs, ys, 10) == [0, 1, 2, 3, 4]  # n_out >= n: all


def test_lttb_grouped_invariants(spark):
    rows = [("a", float(i), float((i * 7919) % 101)) for i in range(200)] + \
           [("b", float(i), float((i * 104729) % 53)) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = lttb(df, ["k"], "x", "y", 12).collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r)
    for k, pts in by_k.items():
        pts.sort(key=lambda r: r.i)
        assert len(pts) == 12
        xs = [r.x for r in pts]
        assert xs == sorted(xs)
        assert pts[0].i == 0                      # first point kept
        assert pts[-1].i == (199 if k == "a" else 49)  # last point kept
