"""Output sinks — the Ray analogues of the reference's plain / NDJSON /
CSV occurrence formatting (``/root/reference/src/example/ngrep.c:53-89``)
plus the primary partitioned-parquet sink.

Parquet is the scale path (resumable layout lives in state/checkpoint.py);
JSON/CSV mirror ngrep's ``--json`` / ``--csv`` flags for interop.  All
sinks stream — ``Dataset.write_*`` never materializes on the driver.
"""

from __future__ import annotations


def write_parquet(ds, path: str, **kwargs):
    """Primary sink: partitioned parquet (one file per block)."""
    ds.write_parquet(path, **kwargs)
    return path


def write_json(ds, path: str, **kwargs):
    """NDJSON lines — ngrep ``--json`` (format_pos, ngrep.c:74-80)."""
    ds.write_json(path, **kwargs)
    return path


def write_csv(ds, path: str, **kwargs):
    """RFC-4180 CSV — ngrep ``--csv`` escapes cells the same way the
    reference's ``escape_csv`` does (ngrep.c:53-72); Arrow's CSV writer
    applies the identical quote-doubling rule."""
    ds.write_csv(path, **kwargs)
    return path


def format_mentions_plain(ds, limit: int = 1000) -> str:
    """ngrep default output: one ``pos;len;surface;label`` line per
    occurrence (print_pos, occurrence.c:21-27).  Driver-side; for human
    inspection of small results only — use the write_* sinks at scale."""
    rows = ds.take(limit)
    return "\n".join(
        f"{r['pos']};{r['len']};{r['surface']};{r['label']}" for r in rows
    )


def write_parquet_partitioned(ds, path: str, cols: list[str], **kwargs):
    """Hive-layout sink: one ``col=value/`` directory per key value —
    the resumable / prunable output layout (a rerun can skip finished
    key directories, a reader can push ``filter`` straight at the
    partition path).  Streams exactly like ``write_parquet``."""
    ds.write_parquet(path, partition_cols=cols, **kwargs)
    return path
