"""Small shared helpers for stage configuration."""

from __future__ import annotations

import ray


def default_actor_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: (1, total CPUs).

    Leaves scheduling headroom to Ray's autoscaler rather than pinning the
    pool; pass an explicit ``concurrency`` to any stage to override.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(2, cpus))


def join_partitions(cap: int = 16, rows: int | None = None) -> int:
    """Hash-join partition count sized to the cluster.

    Each partition pins an aggregator actor whose spin-up is the dominant
    fixed cost of a Dataset.join at sub-TB scale — fewer, larger partitions
    win until a partition no longer fits in a worker's heap. Measured on
    this Ray version: npart=8 beats 16/32 by 20-55% on a 600k-row join.

    ``rows``: optional size hint for the BIGGER join side; when the caller
    already knows it (a materialized side), partitions shrink to
    ~1 per 150k rows so sub-100k joins pay 2 actor spin-ups, not 8
    (round-5: the dominant fixed cost of every small gate join).
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n = max(2, min(cap, cpus // 4))
    if rows is not None:
        n = max(2, min(n, rows // 150_000 + 1))
    return n


JOIN_AGG_ARGS = {"num_cpus": 0.25}


_BROADCAST_CACHE: dict = {}


def cached_get(ref):
    """ray.get memoized per worker process.

    Numpy payloads are plasma zero-copy on every get, but python dicts /
    lists unpickle per call — caching by object-ref id gives actor-style
    state amortization to stateless map tasks."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _BROADCAST_CACHE[key] = hit
    return hit
