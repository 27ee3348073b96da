from clickhouse_clickhouse_spark.functions.vectors import (
    cosine_similarity, dot_product, l2_distance, l2_norm,
)
from clickhouse_clickhouse_spark.functions.datetime_fmt import ch_format_to_java

__all__ = [
    "cosine_similarity", "dot_product", "l2_distance", "l2_norm",
    "ch_format_to_java",
]
