"""Cardinality sketches — HyperLogLog distinct counting.

At 100 TB, ``COUNT(DISTINCT user_id)`` per group is a full distinct-pair
shuffle (every (group, user) pair moves).  The HLL sketch replaces that
with ONE streaming pass: each batch folds its users into a tiny register
table (``m`` = 1024 registers per group, one int each), registers merge
by ``max`` — a shuffle of at most ``groups × 1024`` 3-int rows no matter
how large the corpus is.  :func:`hll_users_by_type` computes BOTH the
sketch estimate and the exact count (the expensive path the sketch
replaces) so the driver oracle can hash-check the estimate itself and
the output exhibits the accuracy trade.

Determinism / oracle parity: the value hash is the lower 8 md5 digest
bytes little-endian — EXACTLY DuckDB's ``md5_number_lower`` (the
``dedup_simhash`` precedent, cf. ``dedup.py::_md5_h64``) — so the SQL
twin replays the identical registers: register index = top ``p=10``
hash bits, rho = leading-zero count of the remaining 54 bits + 1, capped
at 50 so the harmonic sum stays EXACT in scaled int64 arithmetic
(``Σ 2^(50-rho)`` ≤ m·2^50 < 2^63 — no float accumulation on either
side; the only floats are one identical estimate expression, rounded to
4 dp under the repo's float-parity rule).

Reference scope note: the reference engine (nativeextractor) has no
sketches; this is part of the prompt-mandated large-scale operator
family (counters economics: src/extractor.c keeps per-batch counters
only — the sketch is the distributed generalization).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HLL_P = 10
HLL_M = 1 << HLL_P            # 1024 registers
HLL_RHO_CAP = 50              # keeps the scaled harmonic sum in int64
HLL_SCALE = 1 << HLL_RHO_CAP  # fixed-point denominator for Σ 2^-rho
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
ROUND = 4

#: md5 hash cache — user ids repeat heavily across batches; the cache
#: lives per worker process (the minhash token-cache pattern)
_H_CACHE: dict[int, int] = {}


def _reg_rho(uids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per uid — md5-lower64-LE hashed, so the SQL
    twin recomputes the identical values with ``md5_number_lower``."""
    regs = np.empty(len(uids), dtype=np.int64)
    rhos = np.empty(len(uids), dtype=np.int64)
    mask54 = (1 << 54) - 1
    for i, u in enumerate(uids):
        u = int(u)
        h = _H_CACHE.get(u)
        if h is None:
            h = int.from_bytes(
                hashlib.md5(str(u).encode()).digest()[8:16], "little")
            if len(_H_CACHE) < (1 << 20):
                _H_CACHE[u] = h
        regs[i] = h >> (64 - HLL_P)
        w = (h & mask54) << HLL_P  # remaining bits, left-aligned in 64
        # rho = leading zeros of w + 1 == 65 - bit_length(w); w == 0 and
        # deep-zero tails both cap at HLL_RHO_CAP (identically in SQL)
        rhos[i] = min(65 - w.bit_length(), HLL_RHO_CAP)
    return regs, rhos


def hll_users_by_type(sf_dir: str) -> pa.Table:
    """Distinct users per ``event_type``: exact count + HLL estimate.

    Output: ``(event_type, n_exact, n_regs, hll_est)`` sorted by type.

    Scale shape — two independent legs over ``events``:

    1. **Sketch leg (the 100-TB path)**: one streaming ``map_batches``
       pass folds each batch to per-(type, register) max-rho rows
       (≤ types × 1024 per block), a tiny two-key ``groupby().max``
       merges them, and per-block partials reduce the registers to one
       ``(present, Σ 2^(50-rho))`` row per type.  Nothing proportional
       to the corpus ever shuffles.
    2. **Exact leg (the path the sketch replaces, kept as the
       comparison column)**: per-batch distinct (type, user) pairs →
       one pair-key shuffle → per-block counts → tiny sum.

    The finish joins the two ≤|types|-row tables on the driver."""
    from ray.data.aggregate import Count, Max, Sum

    from nativeextractor_ray.functions.blocks import arrow_blocks
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    # ---- sketch leg ----
    def reg_partial(t: pa.Table) -> pa.Table:
        pairs = (t.group_by(["event_type", "user_id"]).aggregate([]))
        uids = pairs.column("user_id").to_numpy()
        regs, rhos = _reg_rho(uids)
        tmp = pa.table({"event_type": pairs.column("event_type"),
                        "reg": pa.array(regs, pa.int64()),
                        "rho": pa.array(rhos, pa.int64())})
        g = tmp.group_by(["event_type", "reg"]).aggregate([("rho", "max")])
        return pa.table({"event_type": g.column("event_type"),
                         "reg": g.column("reg"),
                         "rho": g.column("rho_max")})

    regs = (ds.map_batches(reg_partial, batch_format="pyarrow")
              .groupby(["event_type", "reg"])
              .aggregate(Max("rho", alias_name="rho")))

    # aggregates can emit schema-LESS empty blocks on small inputs (the
    # relational.py::_attach_order_dates lesson) — pin before probing
    regs_schema = pa.schema([("event_type", pa.string()),
                             ("reg", pa.int64()), ("rho", pa.int64())])

    def ensure_regs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return regs_schema.empty_table()
        return t.select(["event_type", "reg", "rho"]).cast(regs_schema)

    regs = regs.map_batches(ensure_regs, batch_format="pyarrow")

    def est_partial(t: pa.Table) -> pa.Table:
        rho = t.column("rho").to_numpy()
        tmp = pa.table({
            "event_type": t.column("event_type"),
            "present": pa.array(np.ones(t.num_rows, np.int64)),
            # exact scaled 2^-rho terms: int64, no float accumulation
            "s_present": pa.array(
                np.left_shift(np.int64(1),
                              (HLL_RHO_CAP - rho).astype(np.int64)),
                pa.int64()),
        })
        g = tmp.group_by("event_type").aggregate(
            [("present", "sum"), ("s_present", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "present": g.column("present_sum"),
                         "s_present": g.column("s_present_sum")})

    est = (regs.map_batches(est_partial, batch_format="pyarrow")
               .groupby("event_type")
               .aggregate(Sum("present", alias_name="present"),
                          Sum("s_present", alias_name="s_present")))

    # ---- exact leg ----
    def pair_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("user_id", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "n": pc.cast(g.column("user_id_count"), pa.int64())})

    pair_schema = pa.schema([("event_type", pa.string()),
                             ("user_id", pa.int64())])

    def ensure_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        return t.select(["event_type", "user_id"]).cast(pair_schema)

    exact = (ds.map_batches(pair_partial, batch_format="pyarrow")
               .groupby(["event_type", "user_id"])
               .aggregate(Count(alias_name="c"))
               .map_batches(ensure_pairs, batch_format="pyarrow")
               .map_batches(count_partial, batch_format="pyarrow")
               .groupby("event_type")
               .aggregate(Sum("n", alias_name="n_exact")))

    # ---- finish: two ≤|types|-row tables ----
    by_type: dict[str, list] = {}
    for t in arrow_blocks(est, stream=False):
        for et, pres, s in zip(t.column("event_type").to_pylist(),
                               t.column("present").to_pylist(),
                               t.column("s_present").to_pylist()):
            by_type[et] = [int(pres), int(s)]
    n_exact: dict[str, int] = {}
    for t in arrow_blocks(exact, stream=False):
        n_exact.update(zip(t.column("event_type").to_pylist(),
                           (int(x) for x in t.column("n_exact").to_pylist())))

    types = sorted(by_type)
    ests, nregs = [], []
    for et in types:
        present, s_present = by_type[et]
        v = HLL_M - present                       # empty registers
        s_all = s_present + v * HLL_SCALE         # exact int64
        raw = HLL_ALPHA * HLL_M * HLL_M * float(HLL_SCALE) / float(s_all)
        if raw <= 2.5 * HLL_M and v > 0:          # small-range correction
            e = HLL_M * math.log(HLL_M / v)
        else:
            e = raw
        ests.append(round(e, ROUND))
        nregs.append(present)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_exact": pa.array([n_exact.get(t, 0) for t in types], pa.int64()),
        "n_regs": pa.array(nregs, pa.int64()),
        "hll_est": pa.array(ests, pa.float64()),
    })


def hll_users_by_type_sql() -> str:
    """SQL twin: replays the identical md5 registers (bit_length via the
    exact smear + bit_count identity — no float log anywhere in the
    integer leg) and the identical estimate expression."""
    mask54 = (1 << 54) - 1
    return f"""WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
),
h AS (
  SELECT event_type,
         md5_number_lower(CAST(user_id AS VARCHAR)) AS h
  FROM du
),
w0 AS (
  SELECT event_type, h >> {64 - HLL_P} AS reg,
         (h & {mask54}) * {1 << HLL_P} AS w
  FROM h
),
w1 AS (SELECT event_type, reg, w | (w >> 1) AS w FROM w0),
w2 AS (SELECT event_type, reg, w | (w >> 2) AS w FROM w1),
w3 AS (SELECT event_type, reg, w | (w >> 4) AS w FROM w2),
w4 AS (SELECT event_type, reg, w | (w >> 8) AS w FROM w3),
w5 AS (SELECT event_type, reg, w | (w >> 16) AS w FROM w4),
w6 AS (SELECT event_type, reg, w | (w >> 32) AS w FROM w5),
regs AS (
  SELECT event_type, reg,
         max(LEAST(65 - bit_count(w), {HLL_RHO_CAP})) AS rho
  FROM w6 GROUP BY 1, 2
),
est AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS present,
         CAST(sum(CAST(1 AS BIGINT) << CAST({HLL_RHO_CAP} - rho AS INTEGER))
              AS BIGINT) AS s_present
  FROM regs GROUP BY 1
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
),
fin AS (
  SELECT e.event_type, ex.n_exact, e.present,
         {HLL_M} - e.present AS v,
         e.s_present + ({HLL_M} - e.present)
           * (CAST(1 AS BIGINT) << {HLL_RHO_CAP}) AS s_all
  FROM est e JOIN ex ON ex.event_type = e.event_type
)
SELECT event_type, n_exact, present AS n_regs,
       round(CASE WHEN ((0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0
                        * {HLL_M}.0 * {float(HLL_SCALE)!r}
                        / CAST(s_all AS DOUBLE)) <= {2.5 * HLL_M}
                   AND v > 0
              THEN {HLL_M}.0 * ln({HLL_M}.0 / v)
              ELSE (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0
                   * {HLL_M}.0 * {float(HLL_SCALE)!r}
                   / CAST(s_all AS DOUBLE)
              END, {ROUND}) AS hll_est
FROM fin ORDER BY event_type"""
