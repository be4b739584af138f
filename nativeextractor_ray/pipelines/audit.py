"""Referential-integrity audit — the data-quality sweep a 100-TB ingest
runs before anything else: for every FK edge in the star schema, the
row count and the number of orphan rows (NOT EXISTS parents).

Scale shape: each edge is ONE streaming pass over the child table —
:func:`~nativeextractor_ray.pipelines.relational.semi_anti_join`
(anti=True) keeps the orphan rows (size-gated broadcast of DISTINCT
parent keys, co-partitioned above the bound), and both counts reduce to
one int per edge.  Child tables are column-pruned to the FK alone, so a
100-TB lineitem audit moves 8 bytes/row.  The report is seven rows.

Reference scope note: the reference engine (nativeextractor) has no
relational layer; this belongs to the prompt-mandated training-data
operator family (ingest validation).
"""

from __future__ import annotations

import pyarrow as pa

#: (edge name, child table, FK column, parent table, PK column)
FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def referential_audit(sf_dir: str) -> pa.Table:
    """One row per FK edge: ``(edge, n_rows, n_orphans)``.

    ``count()`` on a Dataset is an O(1) metadata read after the streaming
    anti-join filter; nothing materializes beyond per-block counts."""
    from nativeextractor_ray.pipelines.relational import semi_anti_join
    from nativeextractor_ray.sources.tables import read_table

    edges, n_rows, n_orphans = [], [], []
    for edge, child, fk, parent, pk in FK_EDGES:
        c = read_table(sf_dir, child, [fk])
        p = read_table(sf_dir, parent, [pk])
        edges.append(edge)
        n_rows.append(c.count())
        n_orphans.append(
            semi_anti_join(c, p, fk, anti=True, sf_dir=sf_dir).count())
    return pa.table({
        "edge": pa.array(edges, pa.string()),
        "n_rows": pa.array(n_rows, pa.int64()),
        "n_orphans": pa.array(n_orphans, pa.int64()),
    })


def referential_audit_sql() -> str:
    legs = []
    for edge, child, fk, parent, pk in FK_EDGES:
        legs.append(f"""SELECT '{edge}' AS edge,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
         AS BIGINT) AS n_orphans
FROM {child} c""")
    return "\nUNION ALL\n".join(legs)
