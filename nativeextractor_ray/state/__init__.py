"""Compile-once, per-actor state: dictionary tries and broadcast artifacts."""

from nativeextractor_ray.state.patricia import PatriciaTrie

__all__ = ["PatriciaTrie"]
