from .checkpoint import (
    PartitionRecord,
    completed_partitions,
    manifest_path,
    run_partitioned,
    write_partition,
)
from .incremental import sessionize_append, sessionize_state_read

__all__ = [
    "PartitionRecord",
    "completed_partitions",
    "manifest_path",
    "run_partitioned",
    "sessionize_append",
    "sessionize_state_read",
    "write_partition",
]
