from docarray_spark.plans.blocks import persistent_rdd_ids, released_after
from docarray_spark.plans.audit import (
    audit,
    broadcast_join_count,
    codegen_span_count,
    exchange_blocks,
    explain_str,
    has_cartesian,
    has_take_ordered,
    has_window_group_limit,
    partition_filters,
    pushed_filters,
    read_schemas,
    scan_count,
    shuffle_count,
)

__all__ = [
    "audit",
    "broadcast_join_count",
    "codegen_span_count",
    "exchange_blocks",
    "explain_str",
    "has_cartesian",
    "has_take_ordered",
    "has_window_group_limit",
    "partition_filters",
    "persistent_rdd_ids",
    "pushed_filters",
    "read_schemas",
    "released_after",
    "scan_count",
    "shuffle_count",
]
