"""CLI runner: execute a registered query (or list them) against a
fixture scale directory.

    python -m clickhouse_clickhouse_spark.run_query --list
    python -m clickhouse_clickhouse_spark.run_query q1_pricing_summary
    python -m clickhouse_clickhouse_spark.run_query join_asof \\
        --sf /root/testdata/sf0.01 --limit 50 --explain
    python -m clickhouse_clickhouse_spark.run_query \\
        --sql "SELECT count() FROM lineitem PREWHERE l_quantity < 10"

``--sql`` is the clickhouse-client analog: the fixture tables are
registered as views and the text goes through the ch_sql dialect
translator before Catalyst.
"""

from __future__ import annotations

import argparse
import sys


def _split_statements(text: str) -> list[str]:
    """Split a script on top-level semicolons (single/double-quoted
    strings and ``--`` line comments respected)."""
    out, buf = [], []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            j = i + 1
            while j < n and text[j] != c:
                j += 2 if text[j] == "\\" else 1
            buf.append(text[i:min(j + 1, n)])
            i = j + 1
        elif c == "-" and text[i:i + 2] == "--":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
        elif c == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="run a registered engine query")
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="fixture scale directory")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead")
    ap.add_argument("--list", action="store_true", help="list query names")
    ap.add_argument("--sql", help="run a ClickHouse-dialect SQL string "
                    "against the fixture tables (ch_sql translator)")
    ap.add_argument("--file", dest="script",
                    help="run a multi-statement dialect script file "
                    "(clickhouse-client --queries-file analog; statements "
                    "split on top-level semicolons)")
    ap.add_argument("--format", dest="fmt",
                    help="output FORMAT for a named query (JSONEachRow, "
                    "CSV, TSV, Values, Markdown, Pretty, Vertical, ...)")
    args = ap.parse_args(argv)

    from clickhouse_clickhouse_spark.registry import all_oracles, all_queries

    qs = all_queries()
    if args.script:
        with open(args.script) as fh:
            text = fh.read()
        for i, stmt in enumerate(_split_statements(text)):
            print(f"-- [{i + 1}] {stmt.splitlines()[0][:76]}")
            rc = main(["--sql", stmt, "--sf", args.sf,
                       "--limit", str(args.limit)])
            if rc:
                return rc
        return 0
    if args.sql:
        from clickhouse_clickhouse_spark.ch_sql import ch_sql
        from clickhouse_clickhouse_spark.session import get_spark
        from clickhouse_clickhouse_spark.tables import TABLES, load_table

        spark = get_spark("run_query")
        for t in TABLES:
            load_table(spark, args.sf, t).createOrReplaceTempView(t)
        # DDL / metadata statements route through the dispatcher
        first = args.sql.strip().split(None, 1)[0].upper() \
            if args.sql.strip() else ""
        if first in ("CREATE", "DESCRIBE", "DESC", "SHOW", "EXISTS",
                     "DROP", "TRUNCATE", "ALTER", "DELETE", "SET",
                     "EXPLAIN", "RENAME", "EXCHANGE"):
            from clickhouse_clickhouse_spark.ch_sql import ch_statement

            ch_statement(spark, args.sql).show(args.limit, truncate=False)
            return 0
        # INSERT statements: parse inline VALUES, or FORMAT payload from
        # stdin (the clickhouse-client contract)
        if args.sql.lstrip().upper().startswith("INSERT"):
            from clickhouse_clickhouse_spark.ch_sql import (
                _INSERT_RE,
                append_to_view,
                ch_insert,
            )
            # stdin supplies FORMAT payload ONLY when the statement has
            # none inline and stdin is piped — an empty-stdin [] would
            # shadow an inline payload (ch_insert prefers non-None data),
            # and a TTY would block
            data = None
            mi = _INSERT_RE.match(args.sql)
            if (mi and mi.group("fmt") and not mi.group("payload")
                    and not sys.stdin.isatty()):
                data = [ln for ln in sys.stdin.read().splitlines() if ln]
            rows = ch_insert(spark, args.sql, data)
            import re as _re
            view = _re.search(r"INSERT\s+INTO\s+(\w+)", args.sql,
                              _re.IGNORECASE).group(1)
            total = append_to_view(spark, view, rows)
            print(f"inserted {rows.count()} rows into {view} "
                  f"(now {total.count()})")
            return 0
        # honor a trailing FORMAT <name> (the translator strips it as a
        # client directive — the CLI is that client)
        import re

        from clickhouse_clickhouse_spark.sources import render

        fmt = None
        m = re.search(r"\bFORMAT\s+(\w+)\s*$", args.sql, re.IGNORECASE)
        if m:
            fmt = m.group(1)
        # SELECT ... INTO OUTFILE 'path' [FORMAT x] — client-side export,
        # exactly as the reference CLI handles it
        sql = args.sql
        mo = re.search(r"\bINTO\s+OUTFILE\s+'([^']+)'", sql, re.IGNORECASE)
        outfile = mo.group(1) if mo else None
        if outfile:
            sql = re.sub(r"\bINTO\s+OUTFILE\s+'[^']+'", "", sql,
                         flags=re.IGNORECASE)
        df = ch_sql(spark, sql)
        if outfile:
            from clickhouse_clickhouse_spark.sources.render import (
                into_outfile,
            )
            into_outfile(df, outfile, fmt or "TSV")
            print(f"wrote {outfile} ({fmt or 'TSV'})")
        elif args.explain:
            df.explain("formatted")
        elif fmt in render.LINE_FORMATS:
            for h in render.header_lines(df, fmt):
                print(h)
            for row in render.serialize_lines(df, fmt).toLocalIterator():
                print(row["line"])
        elif fmt == "Vertical":
            print(render.render_vertical(df, args.limit))
        elif fmt in ("JSON", "JSONCompact"):
            print(render.render_json_envelope(
                df, args.limit, compact=fmt == "JSONCompact"))
        elif fmt in ("Pretty", "PrettyCompact"):
            print(render.render_pretty(df, args.limit))
        else:
            df.show(args.limit, truncate=False)
        return 0
    if args.list or not args.name:
        oracles = all_oracles()
        for name in sorted(qs):
            kind = "oracle" if name in oracles else "rows  "
            print(f"{kind}  {name}")
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2

    from clickhouse_clickhouse_spark.session import get_spark

    spark = get_spark("run_query")
    df = qs[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    elif args.fmt:
        from clickhouse_clickhouse_spark.sources import render

        if args.fmt in render.LINE_FORMATS:
            for h in render.header_lines(df, args.fmt):
                print(h)
            for row in render.serialize_lines(df, args.fmt) \
                    .toLocalIterator():
                print(row["line"])
        elif args.fmt == "Vertical":
            print(render.render_vertical(df, args.limit))
        else:
            print(render.render_pretty(df, args.limit))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
