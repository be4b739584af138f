"""Vector-column decode kernels shared by the similarity / dedup family.

``ListArray<float>`` → ``(n, d)`` numpy in C (offsets reshape), replacing
the ``np.stack(col.to_pylist())`` pattern that materialized one Python
list object PER ROW on every batch of every embedding operator — at 10^9
vectors that object churn, not the matmul, dominated the probe stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """Decode a fixed-dimension list<float> column to an ``(n, d)``
    matrix without per-row Python: flatten the child values (offset- and
    slice-aware) and reshape.  Raises on ragged rows — every caller's
    math assumes one dimensionality, so a ragged input is corrupt data,
    not a case to paper over."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype)
    widths = np.diff(np.asarray(arr.offsets))
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column (expected fixed dim "
                         f"{d}, saw widths {np.unique(widths)[:5]})")
    return np.asarray(arr.flatten()).reshape(n, d).astype(dtype, copy=False)


def explode_list(col):
    """Shared row-explosion offset math: ``ListArray`` → ``(row_idx,
    ordinal, flat)`` where ``row_idx[i]`` is the parent row of flat value
    ``i`` and ``ordinal[i]`` its 0-based position within that row.  One
    C-level pass (slice-aware offsets), no per-row Python — the common
    kernel under sentence_split / masked_spans / bpe_encode."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.asarray(arr.offsets)
    off = off - off[0]
    counts = np.diff(off)
    row_idx = np.repeat(np.arange(len(arr)), counts)
    ordinal = np.arange(int(off[-1])) - np.repeat(off[:-1], counts)
    return row_idx, ordinal, arr.flatten()
