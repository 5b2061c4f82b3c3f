"""Partitioned checkpoint/resume: per-partition lineage + manifest.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". Realization for a batch engine (guide §sinks): the output of a
stage is a DIRECTORY of partitions, each written atomically (tmp dir →
rename) with a manifest line recording lineage (input partition, row
count, wall time). A rerun lists the manifest and processes only the
missing partitions — an anti-join of planned vs completed work.

Used by ``run_partitioned`` to shard any pages→Dataset pipeline by input
partition; the flagship bench uses it for its Parquet sinks.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Callable, Sequence

import ray.data as rd

MANIFEST = "_MANIFEST.jsonl"


@dataclass
class PartitionRecord:
    partition: str
    input_ref: str
    rows: int
    wall_s: float
    ts: float


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def completed_partitions(out_dir: str) -> dict[str, PartitionRecord]:
    """Read the manifest → {partition: record}. Missing file ⇒ empty."""
    path = manifest_path(out_dir)
    out: dict[str, PartitionRecord] = {}
    if not os.path.exists(path):
        return out
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            rec = PartitionRecord(**json.loads(line))
            out[rec.partition] = rec
    return out


def _append_manifest(out_dir: str, rec: PartitionRecord) -> None:
    with open(manifest_path(out_dir), "a", encoding="utf-8") as f:
        f.write(json.dumps(rec.__dict__) + "\n")


def write_partition(
    ds: rd.Dataset, out_dir: str, partition: str, input_ref: str = ""
) -> PartitionRecord:
    """Atomically write one partition: tmp dir → rename, then manifest line.

    Returns the lineage record. Skips (returns existing record) if the
    manifest already lists the partition.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    if partition in done:
        return done[partition]
    final = os.path.join(out_dir, f"part={partition}")
    tmp = os.path.join(out_dir, f".tmp-{partition}-{uuid.uuid4().hex[:8]}")
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    rows = _count_parquet_rows(tmp)
    if os.path.exists(final):  # stale dir from a crashed run without manifest line
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)
    rec = PartitionRecord(
        partition=partition,
        input_ref=input_ref,
        rows=rows,
        wall_s=time.perf_counter() - t0,
        ts=time.time(),
    )
    _append_manifest(out_dir, rec)
    return rec


def _count_parquet_rows(d: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(d):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(d, name)).metadata.num_rows
    return total


def run_partitioned(
    partitions: Sequence[str],
    make_ds: Callable[[str], rd.Dataset],
    out_dir: str,
    input_ref_of: Callable[[str], str] = lambda p: p,
) -> list[PartitionRecord]:
    """Process only partitions missing from the manifest (resume = anti-join).

    ``make_ds(partition)`` builds the lazy Dataset for one partition.
    """
    done = completed_partitions(out_dir)
    records = list(done.values())
    for p in partitions:
        if p in done:
            continue
        records.append(write_partition(make_ds(p), out_dir, p, input_ref_of(p)))
    return records
