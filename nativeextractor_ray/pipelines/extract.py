"""Mention extraction pipeline: transcripts → mentions.

``read_parquet`` (column-pruned) → stateless derive → actor-pool
``map_batches(MinerPool)`` → mentions rows.  Mention detection is per-turn
and embarrassingly parallel: no grouping, no shuffle anywhere
(SURVEY.md §4.3.1)."""

from __future__ import annotations

from typing import Sequence

import pyarrow.compute as pc

from nativeextractor_ray.pipelines.common import DEFAULT_BATCH_SIZE, pool_concurrency
from nativeextractor_ray.sources.transcripts import transcripts_dataset
from nativeextractor_ray.stages.miner_pool import STD_MINER_SPECS, MinerPool


def mentions_dataset(
    sf_dir: str,
    specs: Sequence = tuple(STD_MINER_SPECS),
    *,
    no_enclosed: bool = False,
    carry: Sequence[str] = (),
    replicate: int = 1,
):
    ds = transcripts_dataset(sf_dir, replicate=replicate)
    return ds.map_batches(
        MinerPool,
        fn_constructor_args=(list(specs),),
        fn_constructor_kwargs={"no_enclosed": no_enclosed, "carry": tuple(carry)},
        batch_format="pyarrow",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=pool_concurrency(),
    )


def mentions_by_label(sf_dir: str, label: str, specs=None):
    """Mentions of one label, projected for the correctness oracle."""
    ds = mentions_dataset(sf_dir, specs=tuple(specs) if specs else tuple(STD_MINER_SPECS))
    ds = ds.map_batches(
        lambda t, lab=label: t.filter(pc.equal(t.column("label"), lab)),
        batch_format="pyarrow",
    )
    return ds.select_columns(["conv_id", "turn_idx", "label", "surface"])


def mention_counts(sf_dir: str):
    """Count per label — pre-aggregated per batch, then a tiny groupby."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = mentions_dataset(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        g = t.group_by("label").aggregate([("label", "count")])
        return pa.table(
            {"label": g.column("label"), "n": pc2.cast(g.column("label_count"), pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("label").aggregate(Sum("n", alias_name="n"))
