"""Skyline (Pareto-frontier) operator — Börzsönyi/Kossmann/Stocker
(ICDE'01) re-expressed Ray-Data-first.

``skyline_orders``: the orders not dominated on (maximize o_totalprice,
minimize o_orderdate) — "the earliest order at every price level worth
mentioning", the multi-criteria shortlist shape (best-quality-earliest
documents, cheapest-freshest suppliers, …) that no single ORDER BY can
produce.

Scale shape — skylines compose: ``skyline(A ∪ B) ⊆ skyline(A) ∪
skyline(B)``, so ONE streaming ``map_batches`` reduces every block to its
local frontier (for n random points the expected frontier is O(log n) —
the reduction is massive), and the union of local frontiers — size-gated
with a loud raise, it is orders of magnitude below the corpus — is
resolved once on the driver with the same vectorized kernel.  No shuffle
at all.

Domination kernel (exact, integer): after one lexsort by (price desc,
date asc), a row survives iff its date is (a) the minimum within its
price-tie group — an equal-price earlier date strictly dominates — and
(b) strictly below the running min date over all strictly-higher prices.
Equal (price, date) duplicates dominate each other in neither direction
and are ALL kept, matching the SQL NOT EXISTS semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: driver-side merge bound — the union of per-block frontiers must stay
#: tiny; a corpus that violates this is pathological (totally ordered
#: anti-correlated data) and should fail loudly, not OOM silently
MERGE_BOUND = 256 << 20


def _local_skyline(key: np.ndarray, price_c: np.ndarray,
                   date_us: np.ndarray):
    """Exact skyline of one point set, vectorized (no Python pair loop)."""
    order = np.lexsort((key, date_us, -price_c))
    k, p, d = key[order], price_c[order], date_us[order]
    if len(k) == 0:
        return k, p, d
    new_price = np.empty(len(p), bool)
    new_price[0] = True
    new_price[1:] = p[1:] != p[:-1]
    # min date within each equal-price group = first row of the group
    # (date is the secondary sort key), broadcast to the group
    grp = np.cumsum(new_price) - 1
    grp_min = d[new_price][grp]
    # running min date over STRICTLY higher prices: prefix-min of group
    # mins, shifted one group back
    mins = d[new_price]
    prev = np.empty(len(mins), np.int64)
    prev[0] = np.iinfo(np.int64).max
    if len(mins) > 1:
        prev[1:] = np.minimum.accumulate(mins)[:-1]
    keep = (d == grp_min) & (d < prev[grp])
    return k[keep], p[keep], d[keep]


def skyline_orders(sf_dir: str):
    """Pareto frontier of orders on (max price, min date):
    ``(o_orderkey, price_cents, date_us)``."""
    import ray

    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_totalprice", "o_orderdate"])

    def block_frontier(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("o_totalprice"), 100.0), 0.5)), pa.int64()).to_numpy()
        date = (t.column("o_orderdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))
        k, p, d = _local_skyline(key, price, date)
        return pa.table({"o_orderkey": pa.array(k),
                         "price_cents": pa.array(p),
                         "date_us": pa.array(d)})

    local = ds.map_batches(block_frontier, batch_format="pyarrow")
    if local.size_bytes() is not None and local.size_bytes() > MERGE_BOUND:
        raise RuntimeError(
            "union of per-block skylines exceeds the driver merge bound — "
            "anti-correlated degenerate input; shard the merge")
    # tiny: O(blocks · log(block_rows)) rows
    from nativeextractor_ray.functions.blocks import arrow_blocks

    parts = list(arrow_blocks(local, stream=False))
    t = (pa.concat_tables(parts, promote_options="default") if parts
         else pa.table({"o_orderkey": pa.array([], pa.int64()),
                        "price_cents": pa.array([], pa.int64()),
                        "date_us": pa.array([], pa.int64())}))
    k, p, d = _local_skyline(
        t.column("o_orderkey").to_numpy(zero_copy_only=False),
        t.column("price_cents").to_numpy(zero_copy_only=False),
        t.column("date_us").to_numpy(zero_copy_only=False))
    return pa.table({"o_orderkey": pa.array(k, pa.int64()),
                     "price_cents": pa.array(p, pa.int64()),
                     "date_us": pa.array(d, pa.int64())})


def skyline_orders_sql() -> str:
    return """WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
         epoch_us(o_orderdate) AS date_us
  FROM orders)
SELECT o_orderkey, price_cents, CAST(date_us AS BIGINT) AS date_us
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.price_cents >= a.price_cents AND b.date_us <= a.date_us
    AND (b.price_cents > a.price_cents OR b.date_us < a.date_us))"""
