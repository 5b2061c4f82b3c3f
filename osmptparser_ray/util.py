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
