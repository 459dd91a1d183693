from .inspect import (  # noqa: F401
    broadcast_join_count,
    has_partial_aggregation,
    physical_plan,
    pushed_filters,
    uses_python_eval,
)
