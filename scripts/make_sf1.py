"""Synthesize a deterministic sf1 test-data directory from sf0.1.

The driver ships sf{0.001,0.01,0.1}; several suite rows at sf0.1 finish in
under a second and are noise-bound (VERDICT r2 item 10), so BASELINE.md
records one full-suite run at sf1 = 10x sf0.1 (~8M transcript turns).
This script builds it: each table is replicated ``FACTOR`` times with every
key column shifted by ``replica * (max(key in its home table) + 1)``, so
referential integrity (orders->customer, lineitem->orders/part/supplier)
is preserved exactly and the derived transcripts/conv distributions keep
their shape.  All randomness is counter-based Philox with fixed keys — byte-identical output on every run.

Usage:  python scripts/make_sf1.py [SRC_DIR] [DST_DIR] [FACTOR] [TABLES]
Defaults: /root/testdata/sf0.1 -> /tmp/nxr_sf1, factor 10, all tables.
TABLES (comma-separated) restricts output — e.g. ``documents`` builds a
documents-only corpus for the dedup/curation scaling legs without paying
for a 60M-row lineitem at factor 100.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> (home table, home column) used to compute the shift stride
KEY_HOME = {
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}

# tables copied as-is (dimension tables every replica shares)
COPY = ("region", "nation")
REPLICATE = (
    "documents", "embeddings", "events", "customer", "orders", "lineitem",
    "part", "supplier",
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nxr_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst, exist_ok=True)

    strides: dict[tuple[str, str], int] = {}

    def stride(col: str) -> int:
        home_tbl, home_col = KEY_HOME[col]
        key = (home_tbl, home_col)
        if key not in strides:
            t = pq.read_table(f"{src}/{home_tbl}.parquet", columns=[home_col])
            strides[key] = int(pc.max(t.column(home_col)).as_py()) + 1
        return strides[key]

    for name in COPY:
        if only is not None and name not in only:
            continue
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: copied {t.num_rows} rows")

    for name in REPLICATE:
        if only is not None and name not in only:
            continue
        t = pq.read_table(f"{src}/{name}.parquet")
        replicas = [t]
        for k in range(1, factor):
            cols = []
            for field in t.schema:
                col = t.column(field.name)
                if field.name in KEY_HOME:
                    shifted = pc.add(col, k * stride(field.name))
                    cols.append(shifted.cast(field.type))
                elif name == "documents" and field.name == "text":
                    # Replica text must NOT form factor-member near-dup
                    # cliques.  The first attempt (one prefixed salt token)
                    # left replicas at 3-gram Jaccard ~0.9 (one token of
                    # ~60 changed), so LSH correctly bucketed all FACTOR
                    # replicas of every source doc together: 353M candidate
                    # pairs / 8 GB materialized at factor 100 — a ~99%%
                    # near-dup corpus whose pair stage is disk-spill-bound
                    # at every CPU count (a single-box artifact: a real
                    # N-node cluster scales spill disks with nodes).  Now
                    # most replicas get an independent WORD PERMUTATION
                    # (word adjacency destroyed -> shingle overlap ~0 ->
                    # NOT near-dups), and every 8th (doc_id + k) keeps the
                    # light salt to plant a ~12%% near-dup population — the
                    # realistic mix a scaling measurement should exercise.
                    # The permutation must be structureless BETWEEN
                    # replicas (a fixed stride makes replica k+1 a cyclic
                    # ROTATION of replica k, which shares all but n-1
                    # shingles — cliques again): Philox is counter-based
                    # and keyed per (doc, replica), so it is deterministic,
                    # byte-identical across runs, and unrelated across k.
                    import numpy as np

                    ids_np = t.column("doc_id").to_numpy()
                    texts = col.to_pylist()
                    out_txt = []
                    for did, txt in zip(ids_np, texts):
                        if (int(did) + k) % 8 == 0:
                            out_txt.append(f"r{k} {txt}")
                        else:
                            w = txt.split(" ")
                            m = len(w)
                            if m > 3:
                                perm = np.random.Generator(np.random.Philox(
                                    key=(int(did) << 20) | k)).permutation(m)
                                w = [w[j] for j in perm]
                            out_txt.append(f"r{k} " + " ".join(w))
                    cols.append(pa.array(out_txt, field.type))
                else:
                    cols.append(col)
            replicas.append(pa.table(dict(zip(t.schema.names, cols))))
        big = pa.concat_tables(replicas)
        # SMALL row groups are load-bearing for scaling measurements: Ray
        # fuses ReadParquet->MapBatches into one task PER FRAGMENT, and a
        # parquet row group is unsplittable — a single 500k-row group made
        # the whole map side of the doc pipelines run on ONE core at every
        # parallelism level (measured: 4->16 CPUs "efficiency" 0.30-0.37,
        # an input-layout artifact).  A real 100-TB corpus is thousands of
        # files; 8k-row groups reproduce that fan-out in one file.
        pq.write_table(big, f"{dst}/{name}.parquet",
                       row_group_size=8192)
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows "
              f"({(big.num_rows + 8191) // 8192} row groups)")


if __name__ == "__main__":
    main()
