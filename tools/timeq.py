"""Ad-hoc isolated query timer for optimization work (guide §1.1/§1.4).

Times registered queries (or all headline) with the noop sink so the
computation is measured, not the sink or driver collection. Labels jobs
so the UI/event log is readable. Best-of-N after one warmup run.

Usage: python tools/timeq.py [-n RUNS] [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--count", action="store_true",
                    help="time .count() (bench methodology) instead of noop")
    args = ap.parse_args()

    from clickhouse_clickhouse_spark.registry import all_queries
    from clickhouse_clickhouse_spark.session import get_spark

    spark = get_spark("timeq")
    qs = all_queries()
    spark.range(1000).count()

    def run(name: str) -> None:
        df = qs[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()  # warm

    for name in args.names:
        spark.sparkContext.setJobDescription(f"timeq:{name}")
        run(name)  # warmup
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(f"{name:38s} best {runs[0]:7.3f}  med {runs[len(runs)//2]:7.3f}"
              f"  all {[round(r, 3) for r in runs]}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
