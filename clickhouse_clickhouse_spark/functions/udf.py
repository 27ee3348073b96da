"""UDF surface (SURVEY.md §2.10).

Reference mapping:
- ``CREATE FUNCTION f AS (x) -> expr`` (SQL lambda UDF) →
  ``sql_lambda``: a named Python helper that composes Column expressions.
  Zero serialization cost — it IS the expression, exactly like the
  reference's substitution-based UDFs.
- Executable UDFs (external process over a pipe) → ``pandas_udf``
  (Arrow-batched; see pipeline/multimodal.py for the mapInPandas variant).
- ``executable`` table functions / UDTF → Python UDTF (Spark ≥3.5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, SparkSession


_REGISTRY: dict[str, Callable[..., Column]] = {}


def sql_lambda(name: str, fn: Callable[..., Column]) -> Callable[..., Column]:
    """Register a named expression-composition UDF (the CREATE FUNCTION
    analog). Returns the callable; also retrievable via ``get_function``."""
    _REGISTRY[name] = fn
    return fn


def get_function(name: str) -> Callable[..., Column]:
    return _REGISTRY[name]


def register_sql_function(spark: SparkSession, name: str,
                          fn: Callable[..., Column], *arg_names: str) -> None:
    """Expose a sql_lambda to the SQL API too: builds a temp view-level
    expression via spark.udf? No — expression composition can't cross the
    SQL string boundary without serialization, so for SQL-side use we
    register the equivalent as a SQL expression macro using CREATE
    TEMPORARY FUNCTION semantics is unavailable in PySpark; instead the
    recommended path is selectExpr with the expression inlined. Kept as
    documentation of the boundary."""
    raise NotImplementedError(
        "SQL-string-side lambda functions need Spark SQL macros; use the "
        "Python composition (sql_lambda) or inline the expression")
