from .checkpoint import (
    PartitionRecord,
    completed_partitions,
    manifest_path,
    run_partitioned,
    write_partition,
)

__all__ = [
    "PartitionRecord",
    "completed_partitions",
    "manifest_path",
    "run_partitioned",
    "write_partition",
]
