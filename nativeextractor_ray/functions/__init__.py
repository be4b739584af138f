"""Pure helper functions (linking, normalization, hashing)."""

from nativeextractor_ray.functions.linking import (
    best_dict_match,
    entity_id,
    normalize_surface,
)

__all__ = ["best_dict_match", "entity_id", "normalize_surface"]
