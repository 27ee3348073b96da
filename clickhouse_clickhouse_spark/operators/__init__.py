from clickhouse_clickhouse_spark.operators.joins import any_join, asof_join, paste_join
from clickhouse_clickhouse_spark.operators.aggregates import (
    delta_sum,
    final_dedup,
    histogram,
    limit_by,
    sum_map,
    top_k_per_group,
    with_totals,
)
from clickhouse_clickhouse_spark.operators.advanced import (
    cramers_v,
    ema,
    entropy,
    haversine_km,
    interval_length_sum,
    ipv4_num_to_string,
    ipv4_string_to_num,
    max_intersections,
    mode,
    welch_t_statistic,
)
from clickhouse_clickhouse_spark.operators.events import (
    event_string,
    funnel_apply_in_pandas,
    retention,
    sequence_count,
    sessionize,
    window_funnel,
)
from clickhouse_clickhouse_spark.operators.dictionary import Dictionary, dict_get_join
from clickhouse_clickhouse_spark.operators.fill import with_fill
from clickhouse_clickhouse_spark.operators.skew import salted_join
from clickhouse_clickhouse_spark.operators.windows import limit_with_ties, qualify

__all__ = [
    "any_join", "asof_join", "paste_join",
    "delta_sum", "final_dedup", "histogram", "limit_by", "sum_map",
    "top_k_per_group", "with_totals",
    "cramers_v", "ema", "entropy", "haversine_km", "interval_length_sum",
    "ipv4_num_to_string", "ipv4_string_to_num", "max_intersections", "mode",
    "welch_t_statistic",
    "event_string", "funnel_apply_in_pandas", "retention", "sequence_count",
    "sessionize", "window_funnel",
    "Dictionary", "dict_get_join",
    "with_fill", "salted_join", "limit_with_ties", "qualify",
]
