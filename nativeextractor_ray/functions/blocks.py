"""Block-level Dataset consumption helper.

Every driver-side small-result collection in the library goes through
:func:`arrow_blocks` so the block format is normalized in exactly one
place (a pipeline that runs through ``sort`` / ``map_groups(batch_format=
"pandas")`` can leave *pandas* blocks in its output even when the final
``map_batches`` fn emitted Arrow tables — observed crashing every
``.num_rows``-based consumer).

Consumption path: ``iter_batches(batch_format="pyarrow",
batch_size=None)`` — the STREAMING pull.  The previous implementation
used ``Dataset.to_arrow_refs()`` + ``ray.get``, which takes a
bulk-materialization path in the executor and measured a consistent
~2 s FIXED overhead per collection on an sf0.1 pipeline (3.9-4.3 s vs
2.0-2.2 s for the identical plan consumed via iter_batches, 64-block
aggregate output, 32 CPUs).  With ~100 driver-fold collections across
the suite that overhead dominated several "AllToAll floor" rows.
``batch_size=None`` yields whole blocks (no re-batching copy), and the
pyarrow batch format converts stray pandas blocks in the iterator
itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa


def arrow_blocks(ds, stream: bool = True) -> Iterator[pa.Table]:
    """Yield the blocks of ``ds`` as NON-EMPTY pyarrow Tables.

    ``stream=True`` (default) lazily pulls one block at a time — a
    streamed fold where each block can be released before the next is
    pulled; use it when individual blocks are large (the bloom /
    shingle-buffer folds).  ``stream=False`` drains the iterator before
    yielding — use it for tiny-partials collection (rows ∝
    blocks/groups, never the corpus).  Callers keep their own
    empty-stream guards for the all-blocks-empty case."""
    it = ds.iter_batches(batch_format="pyarrow", batch_size=None,
                         prefetch_batches=4)

    def gen():
        for b in it:
            if isinstance(b, pa.RecordBatch):
                b = pa.Table.from_batches([b])
            if b.num_rows:
                yield b

    if stream:
        yield from gen()
    else:
        yield from list(gen())


def concat_blocks(ds, empty: pa.Table | None = None) -> pa.Table:
    """Collect a bounded Dataset into ONE pyarrow Table via the streaming
    pull (``arrow_blocks(stream=False)``).  ``empty`` supplies the typed
    schema when every block is empty (pa.concat_tables of nothing has no
    schema to give)."""
    parts = list(arrow_blocks(ds, stream=False))
    if not parts:
        return empty if empty is not None else pa.table({})
    return pa.concat_tables(parts, promote_options="default")
