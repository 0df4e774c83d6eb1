from .explain import (
    explain_str,
    assert_in_plan,
    assert_not_in_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "assert_in_plan",
    "assert_not_in_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
]
