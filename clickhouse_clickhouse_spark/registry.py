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


def all_queries() -> dict[str, QueryFn]:
    _load_query_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_query_modules()
    return dict(_ORACLES)


_loaded = False


def _load_query_modules() -> None:
    global _loaded
    if _loaded:
        return
    # Import for side effect: each module registers its queries.
    from clickhouse_clickhouse_spark import queries  # noqa: F401

    _loaded = True
