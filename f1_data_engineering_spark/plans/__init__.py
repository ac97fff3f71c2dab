"""Plan introspection — capture and assert on physical plans.

The 100 TB posture is enforced here, not hoped for: tests assert that
filters reach the parquet scan (PushedFilters), small dims broadcast
(BroadcastHashJoin), scans prune columns (ReadSchema), and hot
expression pipelines stay inside WholeStageCodegen.
"""

from .introspect import (
    assert_broadcast_join,
    attach_audit,
    assert_column_pruned,
    assert_no_cartesian,
    assert_pushed_filters,
    count_exchanges,
    physical_plan,
)

__all__ = [
    "physical_plan",
    "count_exchanges",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_column_pruned",
    "assert_no_cartesian",
    "attach_audit",
]
