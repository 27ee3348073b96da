"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor, compares row count, column names, and order-insensitive
values (sorted rows, float-tolerant elementwise). Reports one line per
query; exits nonzero if anything mismatches.

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

REPO = "/root/repo"
sys.path.insert(0, REPO)


def canon(df_pandas):
    """Canonical (sorted columns, sorted rows) list-of-tuples."""
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = []
    for row in pdf.itertuples(index=False):
        rows.append(tuple(_canon_val(v) for v in row))
    rows.sort(key=repr)
    return cols, rows


def _canon_val(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
        return None if math.isnan(v) else v
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, np.ndarray):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, list):
        return tuple(_canon_val(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def values_equal(a, b, tol=1e-9):
    if type(a) is tuple and type(b) is tuple:
        return len(a) == len(b) and all(values_equal(x, y, tol) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    args = sys.argv[1:]
    write_json = "--json" in args
    args = [a for a in args if a != "--json"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import duckdb

    from clickhouse_clickhouse_spark.registry import all_oracles, all_queries
    from clickhouse_clickhouse_spark.session import get_spark
    from clickhouse_clickhouse_spark.tables import TABLES

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = all_queries()
    oracles = all_oracles()
    names = only or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={scols} duck={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(orows)}")
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            if not values_equal(sr, orow):
                bad = (i, sr, orow)
                break
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: value diff at sorted-row {bad[0]}\n"
                  f"      spark={bad[1]}\n      duck ={bad[2]}\n"
                  f"      cols ={scols}")
            continue
        print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if write_json:
        import json
        summary = {"sf_dir": sf_dir, "total": len(names),
                   "passed": len(names) - len(failures),
                   "rows_only": [n for n in names if n not in oracles],
                   "failures": failures}
        with open(f"{REPO}/CORRECTNESS_local.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote CORRECTNESS_local.json")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
