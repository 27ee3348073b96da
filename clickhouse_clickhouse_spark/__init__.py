"""clickhouse_clickhouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference OLAP engine (``2lambda123/ClickHouse-ClickHouse``,
a fork of the public ClickHouse codebase — see SURVEY.md for the full
operator inventory and provenance).

Design stance (SURVEY.md §7): a Python library of *query builders* and
*semantic helpers* over PySpark DataFrames — not an interpreter of the
reference's SQL dialect. Catalyst/Tungsten/AQE supply the execution engine
(vectorization, partial aggregation, spill, shuffle, codegen); this package
supplies the operator *semantics* the reference has and Spark lacks a 1:1
primitive for (ASOF JOIN, LIMIT BY, WITH FILL, FINAL dedup, windowFunnel,
minhash near-dup, ...), plus LLM-data-pipeline operators designed for
100 TB scale.
"""

from clickhouse_clickhouse_spark.session import get_spark, stop_spark
from clickhouse_clickhouse_spark.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "stop_spark", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"
