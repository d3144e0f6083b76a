from couch_to_postgres_spark.plans.inspect import (
    executed_plan,
    has_broadcast_hash_join,
    num_exchanges,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "executed_plan",
    "has_broadcast_hash_join",
    "num_exchanges",
    "pushed_filters",
    "scan_read_schema",
]
