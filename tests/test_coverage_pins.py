"""COVERAGE.md stays trustworthy: rows declared out of scope must not
name a registered query, and every backticked registry-shaped name in
the map must actually exist in the registry (round-8 verdict item —
the sparkbar row claimed out-of-scope while `agg_sparkbar` was
implemented and oracle-green)."""

from __future__ import annotations

import re

from clickhouse_clickhouse_spark.registry import all_queries

COVERAGE = "/root/repo/COVERAGE.md"


def _rows():
    with open(COVERAGE, encoding="utf-8") as f:
        for line in f:
            if line.startswith("|") and not set(line.strip()) <= set("|- "):
                yield line.rstrip("\n")


def test_out_of_scope_rows_have_no_registered_query():
    names = set(all_queries())
    offenders = []
    for row in _rows():
        if "out of scope" not in row:
            continue
        hit = [n for n in names
               if re.search(rf"\b{re.escape(n)}\b", row)]
        if hit:
            offenders.append((row, hit))
    assert not offenders, (
        "COVERAGE.md rows marked 'out of scope' reference registered "
        f"queries: {offenders}")


def test_backticked_query_references_exist():
    """In rows whose Check column claims an oracle/rows-checked query,
    the registry pointer (the backticked names after the last '→', or
    the whole Query cell when there is no '→') must name real
    registered queries — catches stale renames in the map."""
    names = set(all_queries())
    stale = []
    for row in _rows():
        cells = [c.strip() for c in row.strip().strip("|").split("|")]
        if len(cells) < 3:
            continue
        check, qcell = cells[-1], cells[-2]
        if not (check.startswith("oracle") or check.startswith("rows")):
            continue
        if ":" in check:
            # explicit form "oracle: `name1`, `name2` + tests" — those
            # names are the registry pointers
            toks = re.findall(r"`([a-z][a-z0-9_]*)`", check)
        elif "→" in qcell:
            # pointer convention "op → `registry_name`" — validate the
            # first name after the last arrow
            toks = re.findall(r"`([a-z][a-z0-9_]*)`",
                              qcell.rsplit("→", 1)[-1])[:1]
        else:
            toks = re.findall(r"`([a-z][a-z0-9_]*)`", qcell)
        for tok in toks:
            if "_" in tok and not tok.startswith("test_") \
                    and tok not in names:
                stale.append((tok, row))
    assert not stale, f"stale backticked query references: {stale}"


def test_recall_record_covers_every_ann_variant():
    """RECALL.md (round-9 verdict item 6) must carry a recall row and a
    recorded correctness gate for every ANN variant the registry
    exposes, so recall regressions are as visible as perf regressions."""
    with open("/root/repo/RECALL.md", encoding="utf-8") as f:
        recall = f.read()
    for variant in ("brute_force", "lsh", "ivf ", "pq ", "ivf-pq"):
        assert f"| {variant}" in recall, f"missing RECALL.md row: {variant}"
    for row in recall.splitlines():
        if row.startswith("|") and not set(row.strip()) <= set("|- ") \
                and "variant" not in row:
            gate = row.strip().strip("|").split("|")[-1].strip()
            assert gate, f"RECALL.md row missing its gate column: {row}"
