"""Raw text corpus source — the Ray analogue of the reference's
``stream_file_c`` input path (mmap one plaintext file,
``/root/reference/src/stream.c:26-79``): a directory (or list) of text
files becomes a Dataset with one row per file, ``conv_id`` = file path,
``turn_idx`` = 0 — the shape every miner stage already consumes.

The reference pages one huge file through a cursor; at cluster scale the
equivalent unit is one file (or one chunk) per row with Ray streaming
blocks of rows, so a million-file corpus reads in parallel with no shared
cursor."""

from __future__ import annotations

import pyarrow as pa


def text_corpus_dataset(paths: str | list[str]):
    """(conv_id=path, turn_idx=0, text=file contents) — whole-file rows
    (``read_binary_files``; ``read_text`` would split lines, but the
    reference scans whole files)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def decode(t: pa.Table) -> pa.Table:
        texts = [b.decode("utf-8", errors="replace") for b in t.column("bytes").to_pylist()]
        return pa.table({
            "conv_id": t.column("path"),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(decode, batch_format="pyarrow")
