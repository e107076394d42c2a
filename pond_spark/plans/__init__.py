from pond_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_join",
    "has_partial_aggregate",
    "has_sort_merge_join",
    "pushed_filters",
    "read_schema_columns",
]
