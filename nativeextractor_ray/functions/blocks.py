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


def arrow_blocks(ds) -> Iterator[pa.Table]:
    """Yield the blocks of ``ds`` as NON-EMPTY pyarrow Tables, fetched
    one ref at a time (a streamed fold — each block is released before
    the next is pulled).  Callers collecting tiny partials (the only
    legitimate use — rows ∝ blocks/groups, never the corpus) keep their
    own empty-stream guards for the all-blocks-empty case."""
    import pandas as pd
    import ray

    for ref in ds.to_arrow_refs():
        b = ray.get(ref)
        if isinstance(b, pd.DataFrame):
            if not len(b):
                continue
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows:
            yield b
