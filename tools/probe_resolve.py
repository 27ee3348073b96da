"""Dynamic dialect resolve probe: for each candidate upstream function
name, try a handful of arg exemplars through the full translate+execute
path and report which names RESOLVE (some exemplar runs), REFUSE
(translator raises a loud documented refusal), or MISS (unknown name /
Spark analysis error) — the shopping list for the next dialect batch.

Usage: python tools/probe_resolve.py [names...]   (default: built-in list)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# arg exemplars tried in order until one executes
EXEMPLARS = [
    "({})",  # zero-arg
    "({0}0.5)",
    "({0}2)",
    "({0}'abc')",
    "({0}'abc', 'b')",
    "({0}'abc', 1)",
    "({0}'abc', 1, 2)",
    "({0}toDate('2024-02-15'))",
    "({0}toDateTime('2024-02-15 10:30:45'))",
    "({0}toDateTime('2024-02-15 10:30:45'), 3)",
    "({0}[1,2,3])",
    "({0}[1,2,3], [4,5,6])",
    "({0}[1,2,3], 2)",
    "({0}2, 3)",
    "({0}0.5, 0.25)",
    "({0}map('a', 1, 'b', 2))",
    "({0}(1, 2))",
    "({0}'abc', ['a','b'])",
    "({0}55.75, 37.61)",
    "({0}55.75, 37.61, 55.76, 37.62)",
]


def main() -> None:
    from clickhouse_clickhouse_spark.ch_sql import ch_sql
    from clickhouse_clickhouse_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("probe")
    resolved, refused, missed = [], {}, {}
    for name in names:
        outcome = None
        last_err = ""
        for ex in EXEMPLARS:
            expr = name + ex.format("")
            try:
                ch_sql(spark, f"SELECT {expr} AS v").collect()
                outcome = "ok"
                break
            except Exception as exc:  # noqa: BLE001
                msg = str(exc).split("\n")[0][:160]
                low = msg.lower()
                if ("engine-specific" in low or "not supported" in low
                        or "refus" in low or "unsupported" in low
                        or "out of scope" in low):
                    outcome = "refused"
                    last_err = msg
                    break
                last_err = msg
        if outcome == "ok":
            resolved.append(name)
        elif outcome == "refused":
            refused[name] = last_err
        else:
            missed[name] = last_err
    print(f"\nRESOLVED ({len(resolved)}): {' '.join(resolved)}")
    print(f"\nREFUSED ({len(refused)}):")
    for n, m in refused.items():
        print(f"  {n}: {m}")
    print(f"\nMISS ({len(missed)}):")
    for n, m in missed.items():
        print(f"  {n}: {m}")


if __name__ == "__main__":
    main()
