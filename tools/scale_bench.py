"""10x scaling measurement harness (SCALE.md).

Replicates the sf0.1 fixtures 10x with shifted keys (join graph
preserved: every key column gets ``+ rep * 10**8``), written 16-way
partitioned to /tmp, then times the given queries hot (best of 2) on
both the original and the replicated data and prints the ratio table.

Usage:
    python tools/scale_bench.py q1_pricing_summary tpch_q21_waiting_suppliers ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_clickhouse_spark.registry import all_queries  # noqa: E402
from clickhouse_clickhouse_spark.session import get_spark  # noqa: E402
from clickhouse_clickhouse_spark.tables import load_table  # noqa: E402

SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
REPS = 10
SHIFT = 10**8


def build(spark, src_sf: str, out_dir: str) -> None:
    for table, cols in SHIFT_COLS.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, src_sf, table)
        parts = []
        for rep in range(REPS):
            d = base
            for c in cols:
                d = d.withColumn(c, (F.col(c) + rep * SHIFT).cast("long"))
            parts.append(d)
        u = parts[0]
        for d in parts[1:]:
            u = u.unionByName(d)
        u.repartition(16).write.mode("overwrite").parquet(dst)
        print(f"built {dst}", flush=True)


def time_query(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    names = sys.argv[1:]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale10")
    os.makedirs(big, exist_ok=True)
    spark = get_spark("scale-bench")
    build(spark, src, big)
    qs = all_queries()
    print(f"| query | sf0.1 | 10x | ratio |")
    print(f"|---|---|---|---|")
    for name in names:
        t1 = time_query(qs[name], spark, src)
        t10 = time_query(qs[name], spark, big)
        print(f"| {name} | {t1:.2f}s | {t10:.2f}s | {t10 / t1:.1f}x |",
              flush=True)


if __name__ == "__main__":
    main()
