"""Audit registered query output schemas for driver-canonicalizable shapes.

The driver's correctness gate canonicalizes each result with a pandas
``sort_values`` over all columns and hashes values EXACTLY. Two output
shapes defeat it (round-13 driver failures):

- Array/Map/Struct columns → ``TypeError: unhashable type: 'list'`` in the
  pandas lexsort (driver records ``err``).
- Decimal columns → Spark ``toPandas()`` yields ``decimal.Decimal`` while
  DuckDB ``.df()`` lowers DECIMAL to float64 → exact-hash mismatch even
  when every value is equal.

This script walks every registered query, builds the plan only (no
execution — ``df.schema``), and prints offending (name, column, type)
triples. tests/test_queries_registry.py runs the same walk as a lint.

Usage: python tools/audit_shapes.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from clickhouse_clickhouse_spark.shapes import (  # noqa: E402
    offending_columns,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from clickhouse_clickhouse_spark.registry import all_queries
    from clickhouse_clickhouse_spark.session import get_spark

    spark = get_spark("audit_shapes", shuffle_partitions=4, cores=8)
    bad = {}
    errs = {}
    qs = all_queries()
    for i, (name, fn) in enumerate(sorted(qs.items())):
        try:
            cols = offending_columns(fn(spark, sf_dir).schema)
        except Exception as e:  # noqa: BLE001 — audit must survey everything
            errs[name] = repr(e)[:200]
            continue
        if cols:
            bad[name] = cols
            print(f"BAD   {name}: {cols}")
    print(f"\n{len(bad)} offending queries of {len(qs)}; {len(errs)} plan errors")
    for n, e in errs.items():
        print(f"ERR   {n}: {e}")
    if bad:
        print("\nnames:", " ".join(sorted(bad)))


if __name__ == "__main__":
    main()
