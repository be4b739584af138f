"""Similarity search over the ``embeddings`` table.

- :func:`ann_cosine_topk` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one float64 matmul and
  emits only its local top-k per query; a tiny ``groupby(query_id)`` merge
  finishes.  Work per batch is O(B·Q·d); nothing but (query_id, vec_id,
  score) candidate rows ever shuffle.
- :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH buckets
  (8-bit signatures, deterministic seed) cut the candidate set before the
  exact rerank; recall < 1 by construction (rows-only checked).

Scores are rounded to 4dp before ranking (DuckDB evaluates
``list_cosine_similarity`` in float32; 4dp is the precision both engines
agree on — see tests), ties broken by vec_id asc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_QUERIES = 10
TOP_K = 5
ROUND = 4


def _load_queries(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = np.array(t.column("vec_id").to_numpy() < N_QUERIES)
    t = t.filter(pa.array(mask))
    qids = t.column("vec_id").to_numpy()
    q = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    order = np.argsort(qids)
    return qids[order], q[order]


def _topk_per_query(g):
    """Final per-query merge: global top-k by (score desc, vec_id asc)."""
    import pandas as pd

    g = g.sort_values(["score", "vec_id"], ascending=[False, True], kind="stable")
    g = g.head(TOP_K).copy()
    g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
    return g[["query_id", "vec_id", "score", "rank"]]


def ann_cosine_topk(sf_dir: str):
    import ray

    from nativeextractor_ray.sources.tables import read_table

    qids, qmat = _load_queries(sf_dir)
    qref = ray.put((qids, qmat))

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def block_topk(t: pa.Table) -> pa.Table:
        ids_q, q = ray.get(qref)
        bid = t.column("vec_id").to_numpy()
        bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = np.round(q @ bm.T, ROUND)  # (Q, B)
        q_out, v_out, s_out = [], [], []
        k = min(TOP_K, len(bid))
        for qi in range(len(ids_q)):
            # local top-k candidates; ties beyond k resolved at the merge
            idx = np.lexsort((bid, -sims[qi]))[:k]
            for j in idx:
                q_out.append(int(ids_q[qi]))
                v_out.append(int(bid[j]))
                s_out.append(float(sims[qi, j]))
        return pa.table({"query_id": pa.array(q_out, pa.int64()),
                         "vec_id": pa.array(v_out, pa.int64()),
                         "score": pa.array(s_out, pa.float64())})

    cand = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=512)
    return cand.groupby("query_id").map_groups(_topk_per_query, batch_format="pandas")


ANN_TOPK_SQL = f"""WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}
),
s AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.embedding, e.embedding), {ROUND}) AS score
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {TOP_K}"""


# ---------------------------------------------------------------- IVF ANN


N_CENTROIDS = 16
N_PROBE = 4
_IVF_SEED = 11


def _train_centroids(mat: np.ndarray, k: int = N_CENTROIDS, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (seeded init, fixed iterations) —
    the coarse quantizer.  At 10^9+ vectors this trains on a sample; the
    centroid matrix stays broadcast-sized (k × d)."""
    rng = np.random.default_rng(_IVF_SEED)
    cent = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN: vectors quantize to their nearest centroid; each
    query exactly reranks only the N_PROBE closest centroid buckets.
    Approximate (recall < 1; rows-only checked — tests assert recall vs
    the brute-force baseline instead)."""
    import pyarrow.parquet as pq
    import ray

    from nativeextractor_ray.sources.tables import read_table

    qids, qmat = _load_queries(sf_dir)
    # train the quantizer once on the driver (sampled at real scale)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cent = _train_centroids(mat)
    qprobe = np.argsort(-(qmat @ cent.T), axis=1)[:, :N_PROBE]  # (Q, nprobe)
    qref = ray.put((qids, qmat, cent, qprobe))

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def block(t: pa.Table) -> pa.Table:
        ids_q, q, c, probe = ray.get(qref)
        bid = t.column("vec_id").to_numpy()
        bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(bm @ c.T, axis=1)
        q_out, v_out, s_out = [], [], []
        for qi in range(len(ids_q)):
            mask = np.isin(assign, probe[qi])
            if not mask.any():
                continue
            sims = np.round(q[qi] @ bm[mask].T, ROUND)
            sub_ids = bid[mask]
            k = min(TOP_K, len(sub_ids))
            idx = np.lexsort((sub_ids, -sims))[:k]
            for j in idx:
                q_out.append(int(ids_q[qi]))
                v_out.append(int(sub_ids[j]))
                s_out.append(float(sims[j]))
        return pa.table({"query_id": pa.array(q_out, pa.int64()),
                         "vec_id": pa.array(v_out, pa.int64()),
                         "score": pa.array(s_out, pa.float64())})

    cand = ds.map_batches(block, batch_format="pyarrow", batch_size=512)
    return cand.groupby("query_id").map_groups(_topk_per_query, batch_format="pandas")


# ---------------------------------------------------------------- LSH ANN


N_PLANES = 8
_LSH_SEED = 7


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((N_PLANES, dim))


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed ANN: only vectors sharing the query's hyperplane
    signature are reranked exactly.  Approximate (recall < 1)."""
    import ray

    from nativeextractor_ray.sources.tables import read_table

    qids, qmat = _load_queries(sf_dir)
    planes = _planes(qmat.shape[1])
    qsig = (qmat @ planes.T > 0).astype(np.uint8)
    qbuckets = np.packbits(qsig, axis=1)[:, 0]
    qref = ray.put((qids, qmat, qbuckets))

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def block(t: pa.Table) -> pa.Table:
        ids_q, q, qb = ray.get(qref)
        bid = t.column("vec_id").to_numpy()
        bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sig = (bm @ _planes(bm.shape[1]).T > 0).astype(np.uint8)
        buckets = np.packbits(sig, axis=1)[:, 0]
        q_out, v_out, s_out = [], [], []
        for qi in range(len(ids_q)):
            mask = buckets == qb[qi]
            if not mask.any():
                continue
            sims = np.round(q[qi] @ bm[mask].T, ROUND)
            sub_ids = bid[mask]
            k = min(TOP_K, len(sub_ids))
            idx = np.lexsort((sub_ids, -sims))[:k]
            for j in idx:
                q_out.append(int(ids_q[qi]))
                v_out.append(int(sub_ids[j]))
                s_out.append(float(sims[j]))
        return pa.table({"query_id": pa.array(q_out, pa.int64()),
                         "vec_id": pa.array(v_out, pa.int64()),
                         "score": pa.array(s_out, pa.float64())})

    cand = ds.map_batches(block, batch_format="pyarrow", batch_size=512)
    return cand.groupby("query_id").map_groups(_topk_per_query, batch_format="pandas")
