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
import pyarrow.compute as pc

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


def source_concentration(sf_dir: str):
    """Corpus concentration report — how dominated the corpus is by its
    largest feeds: the Herfindahl–Hirschman index over per-source doc
    shares plus the top source's share, both as EXACT half-up micro
    integers (Python-int arithmetic over the tiny per-source table — no
    float, no overflow bound even at 10^10 docs where n_s² exceeds
    int64).

    Scale shape: per-batch source-count partials → one tiny
    groupby(source) → a sources-bounded driver fold (the same bounded-
    domain argument as the day/priority tables).

    Output: one row ``(n_sources, n_docs, hhi_micro, top_share_micro)``."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from nativeextractor_ray.functions.blocks import arrow_blocks
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["source"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("source", "count")])
        return pa.table({
            "source": g.column("source"),
            "n": pc.cast(g.column("source_count"), pa.int64())})

    per_src = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("source").aggregate(Sum("n", alias_name="n")))
    counts = []
    for t in arrow_blocks(per_src):
        counts.extend(t.column("n").to_pylist())
    if not counts:
        return ray.data.from_arrow(pa.table({
            "n_sources": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "hhi_micro": pa.array([], pa.int64()),
            "top_share_micro": pa.array([], pa.int64())}))
    total = sum(counts)  # Python ints: exact at any scale
    sq = sum(c * c for c in counts)
    hhi = (2 * sq * 1_000_000 + total * total) // (2 * total * total)
    top = (2 * max(counts) * 1_000_000 + total) // (2 * total)
    return ray.data.from_arrow(pa.table({
        "n_sources": pa.array([len(counts)], pa.int64()),
        "n_docs": pa.array([total], pa.int64()),
        "hhi_micro": pa.array([hhi], pa.int64()),
        "top_share_micro": pa.array([top], pa.int64())}))


SOURCE_CONCENTRATION_SQL = """WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n) AS HUGEINT) AS total,
             CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sq,
             CAST(max(n) AS HUGEINT) AS top,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM c)
SELECT n_sources,
       CAST(total AS BIGINT) AS n_docs,
       CAST((2 * sq * 1000000 + total * total)
            // (2 * total * total) AS BIGINT) AS hhi_micro,
       CAST((2 * top * 1000000 + total) // (2 * total) AS BIGINT)
         AS top_share_micro
FROM t"""
