"""Shared parquet readers.

The driver's test tables are single-row-group files, which Ray Data reads
as ONE block — serializing every downstream stage behind a single task.  At
real scale the input has thousands of files/row-groups and this never
triggers; for small inputs we split the read into enough blocks to feed the
cluster (`repartition` without shuffle — a cheap block split, not an
all-to-all).
"""

from __future__ import annotations


def target_parallelism() -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(8, cpus * 2)


def read_table(
    sf_dir: str, name: str, columns: list[str] | None = None,
    blocks: int | None = None,
):
    import os

    import ray.data

    # A table may be a single file (`<name>.parquet`) or a DIRECTORY of
    # parquet files (`<name>/`).  The distinction matters beyond
    # convenience: Ray decodes each parquet FILE as ONE read task, so a
    # multi-GB single-file table serializes the whole pipeline behind
    # one core's decode (measured: a 1.6 GB lineitem cost ~24 s of
    # serial read at EVERY cpu count, capping 4→16 scaling at 0.3) —
    # directory tables decode file-parallel, which is how any real
    # 100-TB corpus is laid out anyway (scripts/split_table.py converts).
    path = f"{sf_dir}/{name}"
    if not os.path.isdir(path):
        path = f"{path}.parquet"

    # single-row-group small files come back as one block; override the
    # block count so the READ op itself splits (SplitBlocks — a cheap
    # post-read slice, streaming) instead of a downstream ``repartition``,
    # which plans as an AllToAll BARRIER and serializes pipeline start.
    return ray.data.read_parquet(
        path,
        columns=columns,
        override_num_blocks=blocks or target_parallelism(),
    )
