"""Raw text corpus source — the Ray analogue of the reference's
``stream_file_c`` input path (mmap one plaintext file,
``/root/reference/src/stream.c:26-79``).

The reference pages ONE huge file (up to 2^48 bytes) through a cursor in
batches, suppressing occurrences already covered by earlier batches via
``extractor->last_max`` (``src/extractor.c:69-76,243-252``).  The Ray-native
equivalent must not share a cursor: files larger than ``chunk_bytes`` are
split into independent chunk rows that tile the file EXACTLY at delimiter
boundaries, so no suppression state is needed at all —

- nominal cut points every ``chunk_bytes``;
- each cut is snapped forward to the first byte after a ``\\n`` within
  ``overlap_bytes`` (falling back to the next UTF-8 codepoint start when a
  pathological chunk has no newline), a rule deterministic in the local
  bytes, so the producer of chunk *i* and of chunk *i+1* agree on the
  boundary without coordination — each task reads its nominal range plus
  ``overlap_bytes`` and computes BOTH its own snapped start and its
  successor's;
- chunk rows carry ``chunk_offset`` (global byte offset of the chunk's
  text) so global mention positions are ``chunk_offset + pos``; pass
  ``carry=("chunk_offset",)`` to :class:`MinerPool` to keep it on mentions.

Equivalence to the whole-file scan: exact for every miner that cannot match
across the snap delimiter (``\\n``) — the same property the joined-batch
fast path already relies on (``stages/miner_pool.py``: fast-safe miners
never consume newlines) — because the chunks partition the byte stream and
per-miner non-overlap / enclosed-filter state never crosses a newline for
such miners.  A miner that CAN consume newlines may match across a cut and
is only approximated (bounded by one lost/split occurrence per
``chunk_bytes``); the reference's own batch mode has the mirror-image edge
(an occurrence longer than one batch).  Asserted whole-vs-chunked in
``tests/test_textcorpus_chunks.py``.

Scale shape: the driver touches file METADATA only (one stat per file —
the same planning cost ``read_binary_files`` pays); every byte read happens
inside a map task, one task per chunk, so a single 100 GB file fans out to
~1600 parallel 64 MB reads instead of one OOM-ing row.
"""

from __future__ import annotations

import os

import pyarrow as pa

DEFAULT_CHUNK_BYTES = 64 << 20
DEFAULT_OVERLAP_BYTES = 4096


def _expand_paths(paths: "str | list[str]") -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out.extend(os.path.join(root, f) for f in sorted(files))
        else:
            out.append(p)
    return sorted(out)


def _snap(buf: bytes, rel: int, overlap: int) -> int:
    """Deterministic boundary snap, relative to ``buf``: first byte after
    the first ``\\n`` in ``buf[rel:rel+overlap]``; else the first UTF-8
    codepoint start at/after ``rel``.  Callers guarantee ``rel == 0`` is
    never passed (position 0 never snaps)."""
    j = buf.find(b"\n", rel, rel + overlap)
    if j >= 0:
        return j + 1
    k = rel
    while k < len(buf) and (buf[k] & 0xC0) == 0x80:
        k += 1
    return k


def text_corpus_dataset(
    paths: "str | list[str]",
    chunk_bytes: "int | None" = DEFAULT_CHUNK_BYTES,
    overlap_bytes: int = DEFAULT_OVERLAP_BYTES,
):
    """(conv_id=path, turn_idx=chunk_idx, text, chunk_offset) rows.

    Files at most ``chunk_bytes`` long arrive as single rows via
    ``read_binary_files``; larger files are tiled into chunk rows as
    described in the module docstring.  ``chunk_bytes=None`` disables
    splitting (the pre-r3 whole-file behavior)."""
    import ray.data

    if chunk_bytes is not None and chunk_bytes < 4 * overlap_bytes:
        raise ValueError("chunk_bytes must be >= 4 * overlap_bytes")

    all_files = _expand_paths(paths)
    sizes = {p: os.path.getsize(p) for p in all_files}  # metadata only
    small = [p for p in all_files if chunk_bytes is None or sizes[p] <= chunk_bytes]
    large = [p for p in all_files if p not in set(small)]

    parts = []
    if small:
        ds = ray.data.read_binary_files(small, include_paths=True)

        def decode(t: pa.Table) -> pa.Table:
            texts = [b.decode("utf-8", errors="replace")
                     for b in t.column("bytes").to_pylist()]
            n = len(texts)
            return pa.table({
                "conv_id": t.column("path"),
                "turn_idx": pa.array([0] * n, pa.int32()),
                "text": pa.array(texts, pa.string()),
                "chunk_offset": pa.array([0] * n, pa.int64()),
            })

        parts.append(ds.map_batches(decode, batch_format="pyarrow"))

    if large:
        plan = []
        for p in large:
            size = sizes[p]
            n_chunks = (size + chunk_bytes - 1) // chunk_bytes
            for i in range(n_chunks):
                plan.append({
                    "path": p,
                    "chunk_idx": i,
                    "start": i * chunk_bytes,
                    "end": min((i + 1) * chunk_bytes, size),
                    "fsize": size,
                })

        def read_chunk(t: pa.Table) -> pa.Table:
            conv, turn, text, off = [], [], [], []
            for row in t.to_pylist():
                p, start, end, fsize = (row["path"], row["start"],
                                        row["end"], row["fsize"])
                with open(p, "rb") as f:
                    f.seek(start)
                    buf = f.read(min(end + overlap_bytes, fsize) - start)
                lo = 0 if start == 0 else _snap(buf, 0, overlap_bytes)
                hi = (len(buf) if end >= fsize
                      else _snap(buf, end - start, overlap_bytes))
                if hi <= lo:
                    continue  # the whole chunk fell before its snap point
                conv.append(p)
                turn.append(row["chunk_idx"])
                text.append(buf[lo:hi].decode("utf-8", errors="replace"))
                off.append(start + lo)
            return pa.table({
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int32()),
                "text": pa.array(text, pa.string()),
                "chunk_offset": pa.array(off, pa.int64()),
            })

        chunk_ds = ray.data.from_items(
            plan, override_num_blocks=len(plan)
        ).map_batches(read_chunk, batch_format="pyarrow", batch_size=1)
        parts.append(chunk_ds)

    if not parts:
        return ray.data.from_arrow(pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "text": pa.array([], pa.string()),
            "chunk_offset": pa.array([], pa.int64()),
        }))
    out = parts[0]
    for extra in parts[1:]:
        out = out.union(extra)
    return out
