"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()``/``ray.shutdown()``.

- ``entry()`` — flagship KG pipeline (transcripts → mentions → link →
  canonicalize → triples) on sf0.001.
- ``queries()`` — one entry per implemented pipeline/operator
  (SURVEY.md §2 + the training-data operators); each callable takes
  ``sf_dir`` and returns a Dataset / pandas DataFrame / pyarrow Table.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query where expressible
  (non-SQL ops — MinHash/SimHash dedup, LSH ANN — are rows-only checked).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from nativeextractor_ray.pipelines.kg import triples_dataset

    return triples_dataset("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from nativeextractor_ray.pipelines import extract, kg
    from nativeextractor_ray.sources.transcripts import transcripts_dataset

    q: dict[str, Callable[[str], Any]] = {
        "transcripts": transcripts_dataset,
        "mention_counts": extract.mention_counts,
        "triples": kg.triples_dataset,
        "triples_tool": kg.triples_tool,
        "canonical_map": kg.canonical_map,
        "conv_entity_flow": kg.conv_entity_flow,
        "conv_stats": kg.conv_stats,
    }
    for label in ("Email", "Url", "Date", "Phone", "Dict"):
        q[f"mentions_{label.lower()}"] = (
            lambda sf, lab=label: extract.mentions_by_label(sf, lab)
        )
    return q


def oracle_sql() -> dict[str, str]:
    from nativeextractor_ray.pipelines import oracles as o

    sqls = {
        "transcripts": o.TRANSCRIPTS_ONLY_SQL,
        "mention_counts": o.MENTION_COUNTS_SQL,
        "triples": o.TRIPLES_SQL,
        "triples_tool": o.TRIPLES_TOOL_SQL,
        "canonical_map": o.CANONICAL_MAP_SQL,
        "conv_entity_flow": o.CONV_ENTITY_FLOW_SQL,
        "conv_stats": o.CONV_STATS_SQL,
    }
    sqls.update(o.mention_sqls())
    return sqls
