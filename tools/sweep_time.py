"""Full-registry Spark-side timing sweep (optimization guide §1).

Times every registered query once with the noop sink at the given SF —
one pass to surface outliers; re-time candidates best-of-N with
tools/timeq.py before drawing conclusions (this box's noise is real).
Writes /tmp/sweep_times.json sorted slowest-first.

Usage: python tools/sweep_time.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from clickhouse_clickhouse_spark.registry import all_queries
    from clickhouse_clickhouse_spark.session import get_spark

    spark = get_spark("sweep_time")
    qs = all_queries()
    spark.range(1000).count()
    times: dict[str, float] = {}
    for name in sorted(qs):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception:
            times[name] = -1.0
            print(f"ERR {name}\n{traceback.format_exc()}", flush=True)
        print(f"{times[name]:8.3f}  {name}", flush=True)
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open("/tmp/sweep_times.json", "w") as f:
        json.dump({"sf": sf, "times": ranked}, f, indent=1)
    print(json.dumps(dict(list(ranked.items())[:30]), indent=1))


if __name__ == "__main__":
    main()
