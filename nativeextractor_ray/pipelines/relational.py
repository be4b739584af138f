"""Relational lookup patterns over the TPC-H-ish side tables — the
engine's demonstration of SURVEY.md §2.5: the reference's only join-like
operation is a broadcast dictionary probe (trie lookup, ner.c:29-31), and
at cluster scale the same shape — **broadcast the small side, probe inside
map_batches, never shuffle the big side** — replaces a hash join whenever
one side fits in the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def orders_by_nation(sf_dir: str):
    """Per-nation order rollup via a two-hop broadcast join:
    customer(cust→nation) and nation(nation→name) are broadcast once
    (``ray.put``); the big ``orders`` table streams through one
    ``map_batches`` probe + per-batch combine; a tiny final groupby.

    Money sums in integer cents for float-free oracle comparison."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from nativeextractor_ray.sources.tables import read_table

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    c_arr = np.full(int(pc.max(cust.column("c_custkey")).as_py()) + 1, -1, dtype=np.int64)
    c_arr[cust.column("c_custkey").to_numpy()] = cust.column("c_nationkey").to_numpy()
    n_names = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    side = ray.put((c_arr, n_names))

    ds = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def probe(t: pa.Table) -> pa.Table:
        c2n, names = ray.get(side)
        nk = c2n[t.column("o_custkey").to_numpy()]
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        tmp = pa.table({"nationkey": pa.array(nk), "cents": cents})
        g = tmp.group_by("nationkey").aggregate([("cents", "sum"), ("cents", "count")])
        keys = g.column("nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([names[k] for k in keys], pa.string()),
            "n_orders": pc.cast(g.column("cents_count"), pa.int64()),
            "total_cents": pc.cast(g.column("cents_sum"), pa.int64()),
        })

    partials = ds.map_batches(probe, batch_format="pyarrow")
    return partials.groupby("n_name").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    )


def order_priority_totals(sf_dir: str):
    """Big-big hash join (``Dataset.join``, Ray's distributed hash
    shuffle-join) — the path for when NEITHER side fits in a broadcast:
    orders ⋈ lineitem on orderkey, rolled up per order priority.  Sums in
    integer cents."""
    import pyarrow.compute as pc2
    from ray.data.aggregate import Sum

    from nativeextractor_ray.sources.tables import read_table, target_parallelism

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = read_table(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    joined = orders.join(
        items,
        join_type="inner",
        num_partitions=target_parallelism(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc2.cast(pc2.round(pc2.multiply(t.column("l_extendedprice"), 100.0)),
                         pa.int64())
        tmp = pa.table({"o_orderpriority": t.column("o_orderpriority"), "cents": cents})
        g = tmp.group_by("o_orderpriority").aggregate([("cents", "sum"), ("cents", "count")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "n_items": pc2.cast(g.column("cents_count"), pa.int64()),
            "total_cents": pc2.cast(g.column("cents_sum"), pa.int64()),
        })

    partials = joined.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("o_orderpriority").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("total_cents", alias_name="total_cents"),
    )


ORDER_PRIORITY_TOTALS_SQL = """SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority"""


ORDERS_BY_NATION_SQL = """SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name"""
