"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor and compares row count, column names, and order-insensitive
values. Two comparison modes:

- **parity (default, round 14)** — replicates the driver's gate: pandas
  ``sort_values`` over all columns (so unhashable list cells raise
  exactly like the driver's canonicalizer) followed by EXACT cell
  comparison — no float tolerance, no Decimal→float coercion. This is
  the mode the per-round sf0.01/sf0.1 sweeps run in; anything green here
  is green under the driver's exact value hash. (The round-13 judge
  found the old tolerant gate strictly weaker than the driver's — three
  sampled entries passed locally and failed the driver.)
- **--tolerant** — the pre-round-14 behavior (1e-9 relative float
  tolerance, lists→tuples, Decimal→float). Kept for diagnosing WHERE a
  parity failure comes from (value bug vs last-ulp float noise).

Usage: python tools/check.py [--tolerant] [--json] [sf_dir] [query_name ...]
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


def canon_parity(df_pandas):
    """Driver-style canonicalization: sorted column order, pandas
    ``sort_values`` over ALL columns (raises TypeError on unhashable
    cells — list/dict — exactly like the driver's canonicalizer), then
    exact per-cell canonical reprs. Numpy scalars unwrap via ``.item()``
    (integer width is not significant, float bits are); timestamps
    normalize to naive isoformat (Spark hands back datetime64[ns],
    DuckDB datetime64[us] — equal instants must compare equal)."""
    cols = sorted(df_pandas.columns)
    # explicit unhashable-cell check: the driver's multi-column lexsort
    # raises TypeError on list/dict cells, but a SINGLE-column frame
    # takes pandas' non-lexsort path and would slip through — stay
    # conservative for any column count
    for c in cols:
        col = df_pandas[c]
        if col.dtype == object and len(col):
            # first NON-NULL cell: a leading NULL would otherwise hide
            # a list column from the check (round-14 second review)
            nn = col[col.map(
                lambda v: isinstance(v, (list, dict, set))
                or type(v).__name__ == "ndarray")]
            if len(nn):
                v = nn.iloc[0]
                raise TypeError(
                    f"unhashable cell type in column {c!r} "
                    f"({type(v).__name__}) — driver-incompatible "
                    f"output shape")
    pdf = df_pandas[cols].sort_values(by=cols, kind="mergesort")
    rows = [tuple(_parity_val(v) for v in row)
            for row in pdf.itertuples(index=False)]
    return cols, rows


def _parity_val(v):
    import datetime

    import numpy as np
    import pandas as pd

    if isinstance(v, np.generic):
        v = v.item()
    if v is pd.NaT:
        return "NaT"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    # Floats repr as shortest round-trip: equal string iff equal bits.
    # NaN reprs as 'nan' on both sides. Decimal reprs as
    # Decimal('...') and deliberately does NOT equal a float repr —
    # that exact divergence is the round-13 driver hash mismatch.
    return repr(v)


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
    parity = "--tolerant" not in args
    args = [a for a in args if a not in ("--json", "--tolerant")]
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
        try:
            if parity:
                scols, srows = canon_parity(sdf)
                ocols, orows = canon_parity(odf)
            else:
                scols, srows = canon(sdf)
                ocols, orows = canon(odf)
        except TypeError as e:
            failures.append(name)
            print(f"FAIL  {name}: driver-incompatible output shape "
                  f"(canonicalize raised {e!r})")
            continue
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
            if (sr != orow) if parity else (not values_equal(sr, orow)):
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
                   "mode": "parity" if parity else "tolerant",
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
