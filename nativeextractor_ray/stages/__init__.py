"""Actor-pool stages: compile-once miner state, per-batch Arrow transforms."""

from nativeextractor_ray.stages.miner_pool import STD_MINER_SPECS, MinerPool
from nativeextractor_ray.stages.kg_extract import KgExtract

__all__ = ["MinerPool", "KgExtract", "STD_MINER_SPECS"]
