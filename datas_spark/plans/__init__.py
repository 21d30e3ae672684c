"""Physical-plan introspection utilities (SURVEY §7 layout: the
``plans/`` package) — the machinery behind the repo's plan-shape
regression gates, exposed as a library so pipelines can assert their
own scale invariants (no cartesian products, no partition-less windows
over raw rows, pushdown reached the scan) in their own CI.
"""

from datas_spark.plans.audit import (
    broadcast_join_count,
    global_window_violations,
    has_node,
    plan_text,
    scan_info,
    shuffle_count,
    walk_plan,
)

__all__ = [
    "plan_text",
    "walk_plan",
    "has_node",
    "global_window_violations",
    "scan_info",
    "shuffle_count",
    "broadcast_join_count",
]
