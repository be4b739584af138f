"""Shared pipeline knobs.

Measured on the sf0.1 bench (200k turns, 32 CPUs): large batches amortize
per-call overhead AND shrink the shuffled partial tables (more per-batch
combining); a fixed half-the-CPUs actor pool beats both a (1, N) autoscaler
(slow ramp) and an all-CPUs pool (startup cost + starving the read/shuffle
stages)."""

from __future__ import annotations

DEFAULT_BATCH_SIZE = 4096
KG_BATCH_SIZE = 32768


def _cpus() -> int:
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def pool_concurrency() -> int:
    """Fixed actor-pool size: half the cluster CPUs, capped at 16 per
    stage — leaves headroom for the read/derive tasks and the shuffle so
    no stage starves."""
    return max(2, min(16, _cpus() // 2))
