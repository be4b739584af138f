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


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data

    path = f"{sf_dir}/{name}.parquet"
    ds = ray.data.read_parquet(path, columns=columns)
    blocks = target_parallelism()
    # single-row-group small files come back as one block; split them so
    # downstream map_batches/actor pools actually parallelize.  Row-group
    # count is read from local parquet metadata (no execution triggered).
    try:
        import pyarrow.parquet as pq

        n_groups = pq.ParquetFile(path).num_row_groups
    except Exception:
        n_groups = blocks
    if n_groups < blocks:
        ds = ds.repartition(blocks)
    return ds
