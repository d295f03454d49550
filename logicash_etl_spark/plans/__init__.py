"""Physical-plan introspection and assertions."""

from logicash_etl_spark.plans.inspect import (
    plan_string,
    scans,
    has_pushed_filter,
    join_strategies,
    count_exchanges,
    has_take_ordered,
    assert_plan,
)

__all__ = [
    "plan_string",
    "scans",
    "has_pushed_filter",
    "join_strategies",
    "count_exchanges",
    "has_take_ordered",
    "assert_plan",
]
