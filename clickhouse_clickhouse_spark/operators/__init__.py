from clickhouse_clickhouse_spark.operators.joins import any_join, asof_join, paste_join
from clickhouse_clickhouse_spark.operators.aggregates import (
    final_dedup,
    limit_by,
    sum_map,
    top_k_per_group,
    with_totals,
)
from clickhouse_clickhouse_spark.operators.fill import with_fill
from clickhouse_clickhouse_spark.operators.windows import limit_with_ties, qualify

__all__ = [
    "any_join", "asof_join", "paste_join",
    "final_dedup", "limit_by", "sum_map", "top_k_per_group", "with_totals",
    "with_fill", "limit_with_ties", "qualify",
]
