from clickhouse_clickhouse_spark.plans.summary import SummaryTable, route_aggregation

__all__ = ["SummaryTable", "route_aggregation"]
