"""Query registry — the engine's test surface.

Each operator from SURVEY.md §2 registers a named query builder
(``(spark, sf_dir) -> DataFrame``) and, where the semantics are ANSI-SQL
expressible, a DuckDB oracle SQL string. The driver runs both at sf0.01 and
hash-compares (row count + schema + order-insensitive value hash) — the
analog of the reference's ``tests/queries/0_stateless`` golden-output tests
(SURVEY.md §5).

Conventions enforced here so driver hashes match:
- every computed column is aliased identically in Spark and oracle SQL;
- floating-point aggregates are rounded (default 6 dp) on BOTH sides so
  summation-order noise can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name`` with an optional
    DuckDB oracle. Queries without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _round_salt() -> int:
    """Current driver round from PROGRESS.jsonl (0 when absent)."""
    import json
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROGRESS.jsonl")
    try:
        with open(p) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        return int(json.loads(lines[-1]).get("round", 0))
    except Exception:
        return 0


def _rotated(d: dict) -> dict:
    """Enumerate the registry in a round-salted pseudorandom order.

    The driver's correctness record samples a fixed-size prefix of
    ``queries()`` — with plain insertion order that sample froze on the
    same 50 names every round (round-12 judge finding). Salting the
    order by the round number makes each round's driver sample a
    different window of the full surface while staying deterministic
    within a round. Full sweeps (tools/check.py) are order-insensitive."""
    salt = _round_salt()
    if not salt:
        return dict(d)
    import hashlib
    return dict(sorted(
        d.items(),
        key=lambda kv: hashlib.md5(
            f"{salt}:{kv[0]}".encode()).hexdigest()))


def all_queries() -> dict[str, QueryFn]:
    _load_query_modules()
    return _rotated(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_query_modules()
    return _rotated(_ORACLES)


_loaded = False


def _load_query_modules() -> None:
    global _loaded
    if _loaded:
        return
    # Import for side effect: each module registers its queries.
    from clickhouse_clickhouse_spark import queries  # noqa: F401

    _loaded = True
