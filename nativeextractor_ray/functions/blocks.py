"""Block-level Dataset consumption helper.

``Dataset.to_arrow_refs()`` hands back the plan's INTERNAL block refs
without conversion, and a pipeline that runs through ``sort`` /
``map_groups(batch_format="pandas")`` can leave *pandas* blocks in its
output even when the final ``map_batches`` fn emitted Arrow tables
(observed: the same materialized connected-components pipeline yielded
one Arrow block and one pandas block, which crashed every
``.num_rows``-based consumer on the pandas one).  Every driver-side
small-result collection in the library goes through :func:`arrow_blocks`
so the block format is normalized in exactly one place.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa


def arrow_blocks(ds, stream: bool = True) -> Iterator[pa.Table]:
    """Yield the blocks of ``ds`` as NON-EMPTY pyarrow Tables.

    ``stream=True`` (default) fetches one ref at a time — a streamed
    fold where each block is released before the next is pulled; use it
    when individual blocks are large (the bloom / shingle-buffer folds).
    ``stream=False`` issues ONE batched ``ray.get`` for all refs — use
    it for tiny-partials collection (rows ∝ blocks/groups, never the
    corpus), where per-block round-trips would serialize the driver on
    blocks × RPC latency.  Callers keep their own empty-stream guards
    for the all-blocks-empty case."""
    import pandas as pd
    import ray

    refs = ds.to_arrow_refs()
    blocks = ray.get(refs) if not stream else (ray.get(r) for r in refs)
    for b in blocks:
        if isinstance(b, pd.DataFrame):
            if not len(b):
                continue
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows:
            yield b
