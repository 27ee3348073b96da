"""Dump `.explain("formatted")` of registered queries to files.

Used for the optimization-round evidence artifacts
(plans/r14/<query>_{before,after}.txt). The query is EXECUTED first
(collect — headline results are small) so the dump is the final
adaptive plan, same convention as tools/gen_plans.py.

Usage: python tools/dump_plan.py <suffix> name [name ...]
       (writes plans/r14/<name>_<suffix>.txt)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
OUT = os.environ.get("PLANS_OUT", "/root/repo/plans/r15")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from clickhouse_clickhouse_spark.registry import all_queries
    from clickhouse_clickhouse_spark.session import get_spark

    spark = get_spark("dump_plan")
    qs = all_queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
