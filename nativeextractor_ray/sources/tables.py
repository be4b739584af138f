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
    import ray.data

    # single-row-group small files come back as one block; override the
    # block count so the READ op itself splits (SplitBlocks — a cheap
    # post-read slice, streaming) instead of a downstream ``repartition``,
    # which plans as an AllToAll BARRIER and serializes pipeline start.
    return ray.data.read_parquet(
        f"{sf_dir}/{name}.parquet",
        columns=columns,
        override_num_blocks=blocks or target_parallelism(),
    )
