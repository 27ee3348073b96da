"""100x scaling soak (round-6; SCALE.md) — the headline bench at a
synthetic sf10-class dataset.

Replicates every sf0.1 fixture 100x with shifted keys (join graph
preserved: each key column gets ``+ rep * 10**8``; text/payload columns
repeat verbatim, which is exactly what a de-duplicated corpus looks
like after a 100x crawl — the LSH headliner meets REAL duplicate mass).
Built once to /tmp/spark_graft_sf10 via a crossJoin with a broadcast
rep range (single linear plan, no 100-way union), then each headliner
runs twice (hot) at sf0.1 and at 100x and the ratio table prints.

A ratio <= ~100 is at-most-linear (fixed per-query overhead keeps real
ratios far below 100 on 32 cores); anything super-linear is flagged.

Usage:
    python tools/scale100.py [query ...]      # default: bench headliners
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_clickhouse_spark.registry import all_queries  # noqa: E402
from clickhouse_clickhouse_spark.session import get_spark  # noqa: E402
from clickhouse_clickhouse_spark.tables import load_table  # noqa: E402
from tools.scale_bench import SHIFT_COLS  # noqa: E402

REPS = 100
SHIFT = 10**8
OUT = "/tmp/spark_graft_sf10"


def build(spark, src_sf: str) -> None:
    reps = F.broadcast(spark.range(REPS).toDF("__rep"))
    for table, cols in SHIFT_COLS.items():
        dst = os.path.join(OUT, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        d = load_table(spark, src_sf, table).crossJoin(reps)
        for c in cols:
            d = d.withColumn(c, (F.col(c) + F.col("__rep") * SHIFT)
                             .cast("long"))
        n_out = 64 if table in ("lineitem", "orders", "events") else 16
        d.drop("__rep").repartition(n_out).write \
            .mode("overwrite").parquet(dst)
        print(f"built {dst}", flush=True)


def main() -> None:
    from bench import HEADLINE

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("scale100")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, "/root/testdata/sf0.1")
    qs = all_queries()

    rows = []
    for name in names:
        q = qs[name]
        q(spark, "/root/testdata/sf0.001").count()     # warm codegen
        t_small = min(_t(q, spark, "/root/testdata/sf0.1")
                      for _ in range(2))
        t_big = min(_t(q, spark, OUT) for _ in range(2))
        ratio = round(t_big / t_small, 1)
        rows.append((name, round(t_small, 3), round(t_big, 3), ratio))
        print(f"{name:32s} sf0.1 {t_small:7.3f}s   100x {t_big:8.3f}s   "
              f"ratio {ratio:6.1f} {'LINEAR-OK' if ratio <= 110 else 'SUPER-LINEAR'}",
              flush=True)
    print(json.dumps({"scale100": {n: {"sf0.1": a, "x100": b, "ratio": r}
                                   for n, a, b, r in rows}}))


def _t(q, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    q(spark, sf_dir).count()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
