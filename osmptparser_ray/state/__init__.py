from .checkpoint import (
    PartitionRecord,
    completed_partitions,
    manifest_path,
    run_partitioned,
    write_partition,
)
from .incremental import (
    heavy_hitters_append,
    heavy_hitters_state_read,
    sessionize_append,
    sessionize_state_read,
)

__all__ = [
    "PartitionRecord",
    "completed_partitions",
    "heavy_hitters_append",
    "heavy_hitters_state_read",
    "manifest_path",
    "run_partitioned",
    "sessionize_append",
    "sessionize_state_read",
    "write_partition",
]
