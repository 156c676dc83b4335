"""Plan inspection helpers — the engine's "explain and iterate" discipline
as code. Operators in this repo carry claims in their docstrings ("filter is
pushed to the scan", "the dim side broadcasts", "one shuffle"); these helpers
let tests assert those claims against the actual physical plan, so a
regression that silently de-optimizes a plan (a lost broadcast, a filter
stuck above the scan) fails CI instead of surfacing as a 100 TB incident.

Used by tests/test_plans.py.
"""

from big_data_medical_analysis_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    observed_metrics,
    exchange_count,
    has_node,
    node_count,
    physical_plan,
    pushed_filters,
    read_schemas,
    unpartitioned_window_count,
)

__all__ = [
    "observed_metrics",
    "physical_plan",
    "has_node",
    "node_count",
    "exchange_count",
    "broadcast_join_count",
    "pushed_filters",
    "read_schemas",
    "unpartitioned_window_count",
]
