"""Ray Data pipelines: extraction, KG construction, dedup, similarity,
text stats, windows, checkpointed runs."""
