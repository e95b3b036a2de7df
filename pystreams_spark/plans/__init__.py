from .introspect import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_count,
)
from .lint import assert_clean, lint

__all__ = [
    "assert_clean",
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_partial_aggregate",
    "has_take_ordered",
    "lint",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "wholestage_codegen_count",
]
