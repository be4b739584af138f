"""Exact distributed order statistics — quantiles WITHOUT a global sort.

Ray Data's ``sort`` is an all-to-all shuffle of every row; selecting a
handful of order statistics does not need one.  ``value_quantiles``
computes EXACT quantile values by iterative histogram refinement (the
classic distributed selection shape):

1. one streaming pass → global ``(count, min, max)``;
2. per round, ONE streaming ``map_batches`` pass histograms the values
   of every still-active search interval (a few hundred buckets × a few
   targets — partials are tiny rows, the data never moves); the driver
   narrows each target's interval to the bucket containing its rank;
3. when an interval's candidate population is small (or the interval has
   collapsed to a point), a final filtered pass collects per-batch
   ``(value, count)`` partials for just that sliver and the driver reads
   the exact k-th value off the tiny combined table.

Every pass streams the full column but moves only O(buckets × targets)
bytes to the driver, so at 100 TB the cost is R+1 column scans (R ≈ 2-3:
each round narrows the interval by ~B×), not a 100 TB shuffle.  The
selected value is an actual data value — no interpolation arithmetic —
so the DuckDB oracle (row_number over a window) matches hash-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 512
FINAL_N = 4096  # collect exact values once a target's sliver is this small
MAX_ROUNDS = 40

QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _exact_quantiles(ds, col: str, qs):
    """Exact q-quantiles of ``ds[col]`` (value at 1-indexed rank
    ``ceil(q*n)`` of the sorted column) via histogram refinement."""
    import ray

    # pass 0: count / min / max (one streaming aggregate)
    def minmax(t: pa.Table) -> pa.Table:
        v = t.column(col)
        n = len(v) - v.null_count
        if n == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "lo": pa.array([pc.min(v).as_py()], pa.float64()),
            "hi": pa.array([pc.max(v).as_py()], pa.float64()),
        })

    base = ds.map_batches(minmax, batch_format="pyarrow").materialize()
    parts = [r for r in base.take_all()]
    n_total = sum(r["n"] for r in parts)
    if n_total == 0:
        return {}
    glo = min(r["lo"] for r in parts)
    ghi = max(r["hi"] for r in parts)

    # one search state per target rank: interval [lo, hi] known to hold
    # the k-th value, plus how many values sit strictly below lo
    targets = {}
    for q in qs:
        k = max(1, int(np.ceil(q * n_total)))
        targets[q] = {"k": k, "lo": glo, "hi": ghi, "below": 0,
                      "in_range": n_total, "value": None}

    def active():
        return {q: t for q, t in targets.items() if t["value"] is None}

    for _ in range(MAX_ROUNDS):
        act = {q: t for q, t in active().items()
               if t["in_range"] > FINAL_N and t["hi"] > t["lo"]}
        if not act:
            break
        # edges per active target, broadcast once for the round
        edges = {q: np.linspace(t["lo"], t["hi"], N_BUCKETS + 1)
                 for q, t in act.items()}
        eref = ray.put(edges)

        def hist(t: pa.Table) -> pa.Table:
            ed = ray.get(eref)
            v = t.column(col).to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
            tids, buckets, cnts = [], [], []
            for i, (q, e) in enumerate(sorted(ed.items())):
                m = v[(v >= e[0]) & (v <= e[-1])]
                if not len(m):
                    continue
                idx = np.clip(np.searchsorted(e, m, side="right") - 1,
                              0, N_BUCKETS - 1)
                bc = np.bincount(idx, minlength=N_BUCKETS)
                nz = np.nonzero(bc)[0]
                tids.extend([i] * len(nz))
                buckets.extend(nz.tolist())
                cnts.extend(bc[nz].tolist())
            return pa.table({"tid": pa.array(tids, pa.int32()),
                             "bucket": pa.array(buckets, pa.int32()),
                             "cnt": pa.array(cnts, pa.int64())})

        partial = ds.map_batches(hist, batch_format="pyarrow").take_all()
        order = sorted(act)
        hists = {q: np.zeros(N_BUCKETS, dtype=np.int64) for q in order}
        for r in partial:
            hists[order[r["tid"]]][r["bucket"]] += r["cnt"]
        for q in order:
            t = targets[q]
            cum = np.cumsum(hists[q])
            # rank within this interval (1-indexed)
            rk = t["k"] - t["below"]
            j = int(np.searchsorted(cum, rk, side="left"))
            e = edges[q]
            t["below"] += int(cum[j - 1]) if j > 0 else 0
            t["lo"], t["hi"] = float(e[j]), float(e[j + 1])
            t["in_range"] = int(hists[q][j])
            if t["lo"] == t["hi"] or t["in_range"] == 0:
                t["value"] = t["lo"]

    rest = active()
    if rest:
        # final pass: per-batch (value, count) partials for the slivers —
        # bounded by FINAL_N distinct values per target per batch
        ivs = {q: (t["lo"], t["hi"]) for q, t in rest.items()}
        iref = ray.put(ivs)

        def collect(t: pa.Table) -> pa.Table:
            iv = ray.get(iref)
            v = t.column(col).to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
            tids, vals, cnts = [], [], []
            for i, (q, (lo, hi)) in enumerate(sorted(iv.items())):
                m = v[(v >= lo) & (v <= hi)]
                if not len(m):
                    continue
                u, c = np.unique(m, return_counts=True)
                tids.extend([i] * len(u))
                vals.extend(u.tolist())
                cnts.extend(c.tolist())
            return pa.table({"tid": pa.array(tids, pa.int32()),
                             "val": pa.array(vals, pa.float64()),
                             "cnt": pa.array(cnts, pa.int64())})

        partial = ds.map_batches(collect, batch_format="pyarrow").take_all()
        order = sorted(rest)
        byq: dict = {q: {} for q in order}
        for r in partial:
            d = byq[order[r["tid"]]]
            d[r["val"]] = d.get(r["val"], 0) + r["cnt"]
        for q in order:
            t = targets[q]
            rk = t["k"] - t["below"]
            acc = 0
            for val in sorted(byq[q]):
                acc += byq[q][val]
                if acc >= rk:
                    t["value"] = float(val)
                    break

    return {q: t["value"] for q, t in targets.items()}


def event_value_quantiles(sf_dir: str, qs=QS):
    """Exact quantiles of ``events.value`` as a tiny (q, value) table."""
    import ray.data

    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", ["value"])
    got = _exact_quantiles(ds, "value", qs)
    qs_sorted = sorted(got)
    return ray.data.from_arrow(pa.table({
        "q": pa.array(qs_sorted, pa.float64()),
        "value": pa.array([got[q] for q in qs_sorted], pa.float64()),
    }))


def event_value_quantiles_sql(qs=QS) -> str:
    vals = ", ".join(f"({q})" for q in sorted(qs))
    return f"""WITH s AS (
  SELECT value, row_number() OVER (ORDER BY value) AS r,
         count(*) OVER () AS n
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(q AS DOUBLE) AS q, value
FROM (VALUES {vals}) AS qs(q)
JOIN s ON s.r = CAST(ceil(q * n) AS BIGINT)"""
