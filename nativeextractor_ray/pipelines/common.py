"""Shared pipeline knobs."""

from __future__ import annotations

DEFAULT_BATCH_SIZE = 1024


def pool_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool size derived from the live cluster: leave
    headroom for the read/write stages so no stage starves."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(2, cpus - 1))
