"""Sources: Parquet readers and the deterministic transcripts derivation."""

from nativeextractor_ray.sources.transcripts import (
    DICT_NAMES,
    TRANSCRIPTS_SQL,
    derive_transcripts_table,
    transcripts_dataset,
)

__all__ = [
    "DICT_NAMES",
    "TRANSCRIPTS_SQL",
    "derive_transcripts_table",
    "transcripts_dataset",
]
