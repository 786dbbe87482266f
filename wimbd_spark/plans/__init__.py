from wimbd_spark.plans.inspect import (
    assert_column_pruning,
    explain_str,
    has_pushed_filters,
    shuffle_count,
)

__all__ = [
    "assert_column_pruning",
    "explain_str",
    "has_pushed_filters",
    "shuffle_count",
]
