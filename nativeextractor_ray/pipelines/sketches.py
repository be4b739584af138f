"""Frequency/cardinality sketches — HyperLogLog distinct counting and
Count-Min heavy hitters.

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

_T_CACHE: dict[str, int] = {}


def _type_hash(name: str) -> int:
    """53-bit md5 hash of a group name — packs with a 10-bit register
    index into one non-negative int64 shuffle key."""
    th = _T_CACHE.get(name)
    if th is None:
        th = int.from_bytes(
            hashlib.md5(name.encode()).digest()[8:16], "little") >> 11
        _T_CACHE[name] = th
    return th


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
       (≤ types × 1024 per block), and a tiny two-key ``groupby().max``
       merges them into the ≤ types × 1024 register table.  Nothing
       proportional to the corpus ever shuffles.
    2. **Exact leg (the path the sketch replaces, kept as the
       comparison column)**: per-batch distinct (type, user) pairs →
       one pair-key shuffle → per-block count partials.

    The finish reduces both BOUNDED streams on the driver (registers ≤
    types × 1024 rows, count partials ∝ blocks × types — the
    tiny-partials pattern); distributed finishes would add two groupby
    shuffles of pure fixed overhead."""
    from ray.data.aggregate import Count, Max

    from nativeextractor_ray.functions.blocks import arrow_blocks
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    # ---- sketch leg ----
    # the register shuffle key is ONE packed int64 — hash54(type) in the
    # high 53 bits, register in the low 10 — instead of the natural
    # (event_type, reg) string pair: a string multi-key hash shuffle
    # measured ~4× the cost of the int64 shuffle on the same rows, and
    # this shuffle IS the sketch's scale path.  Names are recovered at
    # the finish from the exact leg's output (same input, so the same
    # type set), with a loud collision check.
    def reg_partial(t: pa.Table) -> pa.Table:
        pairs = (t.group_by(["event_type", "user_id"]).aggregate([]))
        uids = pairs.column("user_id").to_numpy()
        regs, rhos = _reg_rho(uids)
        th = np.fromiter(
            (_type_hash(et) for et in
             pairs.column("event_type").to_pylist()),
            dtype=np.int64, count=pairs.num_rows)
        tmp = pa.table({"k": pa.array((th << 10) | regs, pa.int64()),
                        "rho": pa.array(rhos, pa.int64())})
        g = tmp.group_by("k").aggregate([("rho", "max")])
        return pa.table({"k": g.column("k"), "rho": g.column("rho_max")})

    regs = (ds.map_batches(reg_partial, batch_format="pyarrow")
              .groupby("k")
              .aggregate(Max("rho", alias_name="rho")))

    # aggregates can emit schema-LESS empty blocks on small inputs (the
    # relational.py::_attach_order_dates lesson) — pin before probing
    regs_schema = pa.schema([("k", pa.int64()), ("rho", pa.int64())])

    def ensure_regs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return regs_schema.empty_table()
        return t.select(["k", "rho"]).cast(regs_schema)

    regs = regs.map_batches(ensure_regs, batch_format="pyarrow")

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
               .map_batches(count_partial, batch_format="pyarrow"))

    # ---- finish on the driver: both streams are BOUNDED — registers by
    # types × 1024 rows, exact-count partials by blocks × types — so the
    # two extra groupby shuffles a distributed finish would cost are pure
    # fixed overhead (measured: they dominated the op's wall time).
    # The two legs are independent Datasets; collecting them from two
    # driver threads overlaps their executions (each leg's AllToAll has
    # ~2.5 s fixed latency that otherwise runs back-to-back).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(
            lambda: list(arrow_blocks(exact, stream=False)))
        f_regs = pool.submit(
            lambda: list(arrow_blocks(regs, stream=False)))
        exact_blocks = f_exact.result()
        reg_blocks = f_regs.result()

    n_exact: dict[str, int] = {}
    for t in exact_blocks:
        for et, n in zip(t.column("event_type").to_pylist(),
                         t.column("n").to_pylist()):
            n_exact[et] = n_exact.get(et, 0) + int(n)

    # hash54 → name map from the exact leg's (identical) type set
    names: dict[int, str] = {}
    for et in n_exact:
        th = _type_hash(et)
        if names.setdefault(th, et) != et:
            raise ValueError(
                "hll_users_by_type: event_type 53-bit hash collision "
                f"between {names[th]!r} and {et!r} — widen the key")

    by_hash: dict[int, list] = {}
    for t in reg_blocks:
        rho = t.column("rho").to_numpy()
        terms = np.left_shift(np.int64(1),
                              (HLL_RHO_CAP - rho).astype(np.int64))
        for k, term in zip(t.column("k").to_numpy() >> 10, terms):
            acc = by_hash.setdefault(int(k), [0, 0])
            acc[0] += 1
            acc[1] += int(term)
    by_type = {names[th]: acc for th, acc in by_hash.items()}

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


# ------------------------------------------------------ Count-Min sketch


CMS_D = 4                     # hash rows
CMS_W = 512                   # counters per row
#: heavy-hitter threshold as an exact rational fraction of N (8/1000 =
#: 0.8%) — integer ceiling division on BOTH engines; a float literal
#: would ceil differently (DuckDB parses 0.008 as exact DECIMAL, Python
#: floats give 0.008·1000 = 8.000000000000002 → ceil 9)
CMS_PHI_NUM = 8
CMS_PHI_DEN = 1000

#: per-process cache of the D per-row column indices for a user id —
#: ids repeat across batches (the HLL _H_CACHE pattern)
_CMS_CACHE: dict[int, tuple] = {}


def _cms_cols(uids: np.ndarray, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(len(uids), d) int64 column indices — row-r hash is the md5
    lower-64-LE of ``"{uid}:{r}"`` mod w, so the SQL twin recomputes the
    identical placement with ``md5_number_lower``."""
    out = np.empty((len(uids), d), dtype=np.int64)
    for i, u in enumerate(uids):
        u = int(u)
        cols = _CMS_CACHE.get(u)
        if cols is None:
            cols = tuple(
                int.from_bytes(
                    hashlib.md5(f"{u}:{r}".encode()).digest()[8:16],
                    "little") % w
                for r in range(d))
            if len(_CMS_CACHE) < (1 << 20):
                _CMS_CACHE[u] = cols
        out[i] = cols
    return out


def cms_heavy_hitters(sf_dir: str) -> pa.Table:
    """Heavy hitters: every user whose Count-Min ESTIMATE is ≥ ``phi·N``
    events, with the exact count alongside (CMS guarantees est ≥ exact,
    so no true heavy hitter is missed; collisions can only add FALSE
    candidates, which the exact column exposes).

    Output: ``(user_id, n_exact, cms_est)``.

    Scale shape — the sketch makes the candidate set cheap so the exact
    leg never shuffles the full key space:

    1. **Counter pass (streaming)**: each batch folds its rows into
       per-(row, column) count partials via ``np.bincount`` — at most
       ``d × w`` rows per block regardless of corpus size — and one tiny
       packed-int64-key ``groupby().sum`` merges them into the global
       ``d × w`` counter table (the ``hll_users_by_type`` register
       economics; counters are order-independent sums, so the merged
       table is exact and deterministic).
    2. **Candidate pass (streaming)**: the counter table (``d·w`` ints)
       broadcasts once via ``ray.put``; each batch emits (user, partial
       count) rows ONLY for users whose global CMS estimate clears the
       threshold — the one ``groupby(user).sum`` shuffle moves candidate
       rows, not the corpus key space.  est ≥ exact makes this filter
       lossless for true heavy hitters.

    The counter table is the only driver-side state: ``d × w`` int64s,
    constant in the corpus (the HLL register bound argument)."""
    import ray
    from ray.data.aggregate import Sum

    from nativeextractor_ray.functions.blocks import arrow_blocks
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", ["user_id"])
    n_total = ds.count()
    thresh = -(-n_total * CMS_PHI_NUM // CMS_PHI_DEN)  # exact ceil

    # ---- pass 1: global d x w counter table ----
    def counter_partial(t: pa.Table) -> pa.Table:
        uids, cnts = np.unique(t.column("user_id").to_numpy(),
                               return_counts=True)
        cols = _cms_cols(uids)
        ks, vs = [], []
        for r in range(CMS_D):
            acc = np.bincount(cols[:, r], weights=cnts, minlength=CMS_W)
            nz = np.nonzero(acc)[0]
            ks.append(r * CMS_W + nz)
            vs.append(acc[nz].astype(np.int64))
        return pa.table({"k": pa.array(np.concatenate(ks), pa.int64()),
                         "cnt": pa.array(np.concatenate(vs), pa.int64())})

    counters = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    merged = (ds.map_batches(counter_partial, batch_format="pyarrow")
                .groupby("k").aggregate(Sum("cnt", alias_name="cnt")))
    for t in arrow_blocks(merged, stream=False):
        if t.num_rows:
            counters[t.column("k").to_numpy()] += t.column("cnt").to_numpy()
    cref = ray.put(counters)

    def _est(uids: np.ndarray, ctrs: np.ndarray) -> np.ndarray:
        cols = _cms_cols(uids)
        ests = ctrs[np.arange(CMS_D) * CMS_W + cols]  # (n, d) gather
        return ests.min(axis=1)

    # ---- pass 2: candidate partials -> exact counts ----
    def candidate_partial(t: pa.Table) -> pa.Table:
        ctrs = ray.get(cref)
        uids, cnts = np.unique(t.column("user_id").to_numpy(),
                               return_counts=True)
        keep = _est(uids, ctrs) >= thresh
        return pa.table({"user_id": pa.array(uids[keep], pa.int64()),
                         "n": pa.array(cnts[keep].astype(np.int64))})

    exact = (ds.map_batches(candidate_partial, batch_format="pyarrow")
               .groupby("user_id").aggregate(Sum("n", alias_name="n")))

    out_schema = pa.schema([("user_id", pa.int64()), ("n_exact", pa.int64()),
                            ("cms_est", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ctrs = ray.get(cref)
        uids = t.column("user_id").to_numpy()
        return pa.table({"user_id": t.column("user_id"),
                         "n_exact": pc.cast(t.column("n"), pa.int64()),
                         "cms_est": pa.array(_est(uids, ctrs), pa.int64())})

    return exact.map_batches(finish, batch_format="pyarrow")


def cms_heavy_hitters_sql() -> str:
    """SQL twin: replays the identical md5 column placement and the
    identical global counters, then applies the same est ≥ ⌈phi·N⌉ gate."""
    return f"""WITH ex AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
placement AS (
  SELECT ex.user_id, r.range AS r,
         md5_number_lower(CAST(ex.user_id AS VARCHAR) || ':'
                          || CAST(r.range AS VARCHAR)) % {CMS_W} AS col
  FROM ex, range({CMS_D}) r
),
counters AS (
  SELECT p.r, p.col, sum(ex.cnt) AS cnt
  FROM placement p JOIN ex USING (user_id)
  GROUP BY 1, 2
),
est AS (
  SELECT p.user_id, min(c.cnt) AS est
  FROM placement p JOIN counters c ON c.r = p.r AND c.col = p.col
  GROUP BY 1
)
SELECT ex.user_id, ex.n_exact, CAST(e.est AS BIGINT) AS cms_est
FROM est e JOIN (SELECT user_id, cnt AS n_exact FROM ex) ex USING (user_id)
WHERE e.est >= ((SELECT count(*) FROM events) * {CMS_PHI_NUM}
                + {CMS_PHI_DEN - 1}) // {CMS_PHI_DEN}"""


# --------------------------------------- mergeable MinHash source sketch


MHS_K = 16  # permutations


def source_similarity_minhash(sf_dir: str, k: int = MHS_K):
    """Corpus-level similarity between SOURCES by mergeable MinHash —
    "which crawl domains feed near-identical material?"  Each source's
    sketch is the per-permutation MIN over its distinct word universe;
    min is associative/commutative, so per-batch partials fold map-side
    and the shuffle carries ≤ sources × k 24-byte rows — the sketch
    property that makes corpus-level similarity O(sources²), never
    O(docs²).

    Determinism: permutation ``i`` hashes a word as
    ``md5_number_lower(i || ':' || word)`` — exactly replayable in SQL
    (the HLL/simhash precedent; the xor-multiply family used for
    per-DOC MinHash needs mod-2⁶⁴ wraparound DuckDB's checked arithmetic
    can't express).  The estimate is the exact half-up micro ratio
    ``matches / k``.

    Output: ``(src_a, src_b, matches, est_jacc_micro)``, src_a < src_b."""
    import hashlib

    import pandas as pd
    import ray
    from ray.data.aggregate import Min

    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(t.column("text"), " ")
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        src = t.column("source").to_numpy(zero_copy_only=False)[parent]
        df = pd.DataFrame({"source": src,
                           "w": flat.to_numpy(zero_copy_only=False)})
        df = df.drop_duplicates()
        words = df["w"].unique()
        # k md5s per DISTINCT word in the batch (vocab-bounded, cached
        # upstream of the min fold)
        hs = {w: [int.from_bytes(
            hashlib.md5(f"{i}:{w}".encode()).digest()[8:16], "little")
            for i in range(k)] for w in words}
        rows_src, rows_i, rows_h = [], [], []
        for s, grp in df.groupby("source", sort=False):
            hm = np.array([hs[w] for w in grp["w"]], dtype=np.uint64)
            # top-bit xor: unsigned order ⟺ signed order, so the int64
            # Min aggregate (uint64 blocks overflow Ray's rebuild) folds
            # the same sketch; only equality is consumed downstream
            mins = (hm.min(axis=0)
                    ^ np.uint64(0x8000000000000000)).view(np.int64)
            rows_src.extend([s] * k)
            rows_i.extend(range(k))
            rows_h.extend(int(v) for v in mins)
        return pa.table({
            "source": pa.array(rows_src, pa.string()),
            "i": pa.array(rows_i, pa.int64()),
            "h": pa.array(np.array(rows_h, np.int64))})

    sig = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["source", "i"]).aggregate(Min("h", alias_name="h")))
    from nativeextractor_ray.functions.blocks import concat_blocks

    t = concat_blocks(sig, empty=pa.table(
        {"source": pa.array([], pa.string()),
         "i": pa.array([], pa.int64()),
         "h": pa.array([], pa.int64())}))
    df = t.to_pandas().sort_values(["source", "i"])
    srcs = sorted(df["source"].unique())
    sigs = {s: df[df["source"] == s].sort_values("i")["h"].to_numpy()
            for s in srcs}
    out = []
    for a_i in range(len(srcs)):
        for b_i in range(a_i + 1, len(srcs)):
            a, b = srcs[a_i], srcs[b_i]
            m = int((sigs[a] == sigs[b]).sum())
            out.append({"src_a": a, "src_b": b, "matches": m,
                        "est_jacc_micro": (2 * m * 1_000_000 + k)
                        // (2 * k)})
    res = pd.DataFrame(out)
    res["matches"] = res["matches"].astype("int64")
    res["est_jacc_micro"] = res["est_jacc_micro"].astype("int64")
    return res


def source_similarity_minhash_sql(k: int = MHS_K) -> str:
    return f"""WITH w AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents),
sig AS (
  SELECT source, CAST(r.i AS BIGINT) AS i,
         min(md5_number_lower(CAST(r.i AS VARCHAR) || ':' || w)) AS h
  FROM w, range(0, {k}) r(i)
  GROUP BY 1, 2),
p AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) FILTER (a.h = b.h) AS BIGINT) AS matches
  FROM sig a JOIN sig b ON a.i = b.i AND a.source < b.source
  GROUP BY 1, 2)
SELECT src_a, src_b, matches,
       CAST((2 * matches * 1000000 + {k}) // (2 * {k}) AS BIGINT)
         AS est_jacc_micro
FROM p"""
