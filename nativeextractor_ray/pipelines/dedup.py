"""Deduplication operators over the ``documents`` table — the training-data
pipeline family: exact, MinHash+LSH, SimHash, exact n-gram Jaccard, and
embedding-cosine near-dup.

Scale shape (each documented inline):
- exact:     per-batch md5 keys → ``groupby(key)`` (shuffles 16-byte keys +
             ids, never text).
- minhash:   shingle→signature per batch (stateless, vectorized) → emit one
             (bucket, doc_id, sig) row per LSH band → ``groupby(bucket)`` →
             in-bucket pairs (bucket size capped) → pair-level groupby to
             dedup across bands.  The only rows shuffled are (bucket, id,
             64×u64 sig) — no text moves after stage 1.
- simhash:   64-bit signature per doc, 4×16-bit band buckets, in-bucket
             Hamming filter.
- ngram:     exact Jaccard via co-occurrence counting: (tri, doc_id, n_tri)
             rows → groupby(tri) emits pair partials → groupby(pair) sums.
             No broadcast of per-doc counts (they ride on each row), no join.
- embedding: normalized matrix broadcast once via ``ray.put`` (the IVF
             bucketing path takes over when the matrix outgrows a broadcast;
             see similarity.py), per-batch numpy matmul.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from nativeextractor_ray.functions.hashing import (
    h64,
    h64_many,
    hamming64,
    minhash_perms,
    minhash_signature,
    simhash64,
    word_shingles,
)

# LSH geometry: 16 bands x 4 rows over a 64-wide signature → catches
# pairs from ~Jaccard 0.5 up with high probability.
MINHASH_K = 64
BANDS = 16
ROWS_PER_BAND = 4
MAX_BUCKET = 1000  # skip pathological buckets (logged), SURVEY.md §4.3.2 skew rule


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------- exact


def dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on md5(text), keep min doc_id per group."""
    from ray.data.aggregate import Count, Min

    def keys(t: pa.Table) -> pa.Table:
        key = [hashlib.md5(s.encode()).hexdigest() for s in t.column("text").to_pylist()]
        return pa.table({"key": pa.array(key, pa.string()), "doc_id": t.column("doc_id")})

    ds = _docs(sf_dir).map_batches(keys, batch_format="pyarrow")
    return ds.groupby("key").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )


DEDUP_EXACT_SQL = """SELECT md5(text) AS key, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)"""


# ---------------------------------------------------------------- minhash/LSH


class MinHasher:
    """Stateless-per-row but compile-once state (permutation table) — actor."""

    def __init__(self, shingle_n: int = 3):
        self.perms = minhash_perms(MINHASH_K)
        self.n = shingle_n

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        b_bucket, b_id, b_sig = [], [], []
        for d, txt in zip(ids, texts):
            sh = word_shingles(txt, self.n)
            sig = minhash_signature(h64_many(sh), self.perms)
            sig_bytes = sig.tobytes()
            for band in range(BANDS):
                lo = band * ROWS_PER_BAND
                band_key = hashlib.blake2b(
                    sig[lo : lo + ROWS_PER_BAND].tobytes(), digest_size=8
                ).hexdigest()
                b_bucket.append(f"{band}:{band_key}")
                b_id.append(d)
                b_sig.append(sig_bytes)
        return pa.table(
            {
                "bucket": pa.array(b_bucket, pa.string()),
                "doc_id": pa.array(b_id, pa.int64()),
                "sig": pa.array(b_sig, pa.binary()),
            }
        )


def _bucket_pairs(g, threshold: float):
    """In-bucket candidate pairs with signature-estimated Jaccard."""
    import pandas as pd

    n = len(g)
    if n < 2 or n > MAX_BUCKET:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "est_jaccard": pd.array([], dtype="float64")})
    ids = g["doc_id"].to_numpy()
    sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    a_out, b_out, j_out = [], [], []
    for i in range(n):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        hit = np.nonzero(eq >= threshold)[0]
        for h in hit:
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + h]))
            j_out.append(round(float(eq[h]), 6))
    return pd.DataFrame({"doc_a": pd.array(a_out, dtype="int64"),
                         "doc_b": pd.array(b_out, dtype="int64"),
                         "est_jaccard": pd.array(j_out, dtype="float64")})


def minhash_pairs(ds, threshold: float = 0.5):
    """MinHash+LSH near-dup pairs over any (doc_id, text) Dataset."""
    from ray.data.aggregate import Max

    buckets = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 8))
    pairs = buckets.groupby("bucket").map_groups(
        lambda g: _bucket_pairs(g, threshold), batch_format="pandas"
    )
    # a pair can surface from several bands — dedup on the pair key
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


def dedup_minhash_pairs(sf_dir: str, threshold: float = 0.5):
    return minhash_pairs(_docs(sf_dir), threshold)


# ---------------------------------------------------------------- simhash


class SimHasher:
    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        sigs = []
        for txt in texts:
            toks = [w for w in txt.split(" ") if w]
            uniq, cnt = np.unique(np.array(toks, dtype=object), return_counts=True)
            sigs.append(simhash64(h64_many(list(uniq)), cnt))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sig": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64))})


def _sim_bucket_pairs(g, max_hamming: int):
    import pandas as pd

    n = len(g)
    if n < 2 or n > MAX_BUCKET:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "hamming": pd.array([], dtype="int64")})
    ids = g["doc_id"].to_numpy()
    sigs = g["sig"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    a_out, b_out, h_out = [], [], []
    for i in range(n):
        hd = hamming64(sigs[i + 1 :], sigs[i])
        for j in np.nonzero(hd <= max_hamming)[0]:
            a_out.append(int(ids[i]))
            b_out.append(int(ids[i + 1 + j]))
            h_out.append(int(hd[j]))
    return pd.DataFrame({"doc_a": pd.array(a_out, dtype="int64"),
                         "doc_b": pd.array(b_out, dtype="int64"),
                         "hamming": pd.array(h_out, dtype="int64")})


def simhash_pairs(ds, max_hamming: int = 3):
    """SimHash near-dup: 4×16-bit band buckets guarantee recall for
    Hamming ≤ 3 (pigeonhole: one band must match exactly)."""
    from ray.data.aggregate import Min

    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))

    def bands(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        s = t.column("sig").to_numpy().astype(np.int64).view(np.uint64)
        out_b, out_i, out_s = [], [], []
        for band in range(4):
            part = (s >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out_b.extend([f"{band}:{int(v)}" for v in part])
            out_i.extend(ids.tolist())
            out_s.extend(s.view(np.int64).tolist())
        return pa.table({"bucket": pa.array(out_b, pa.string()),
                         "doc_id": pa.array(out_i, pa.int64()),
                         "sig": pa.array(out_s, pa.int64())})

    b = sigs.map_batches(bands, batch_format="pyarrow")
    pairs = b.groupby("bucket").map_groups(
        lambda g: _sim_bucket_pairs(g, max_hamming), batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    return simhash_pairs(_docs(sf_dir), max_hamming)


# ---------------------------------------------------------------- exact n-gram jaccard


def ngram_jaccard_pairs(ds, n: int = 3, threshold: float = 0.3):
    """Exact n-gram Jaccard without a join or broadcast: each (ngram, doc)
    row carries the doc's distinct-ngram count, so the final pair groupby
    has everything it needs."""
    from ray.data.aggregate import Max, Sum

    def grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        g_out, i_out, n_out = [], [], []
        for d, txt in zip(ids, texts):
            sh = word_shingles(txt, n)
            for s in sh:
                g_out.append(h64(s) & 0x7FFFFFFFFFFFFFFF)
                i_out.append(d)
                n_out.append(len(sh))
        return pa.table({"g": pa.array(g_out, pa.int64()),
                         "doc_id": pa.array(i_out, pa.int64()),
                         "n_tri": pa.array(n_out, pa.int64())})

    def gram_pairs(grp):
        import pandas as pd

        m = len(grp)
        if m < 2 or m > MAX_BUCKET:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "na": pd.array([], dtype="int64"),
                                 "nb": pd.array([], dtype="int64"),
                                 "common": pd.array([], dtype="int64")})
        grp = grp.sort_values("doc_id", kind="stable")
        ids = grp["doc_id"].to_numpy()
        ns = grp["n_tri"].to_numpy()
        a, b, na, nb = [], [], [], []
        for i in range(m):
            for j in range(i + 1, m):
                a.append(int(ids[i])); b.append(int(ids[j]))
                na.append(int(ns[i])); nb.append(int(ns[j]))
        return pd.DataFrame({"doc_a": pd.array(a, dtype="int64"),
                             "doc_b": pd.array(b, dtype="int64"),
                             "na": pd.array(na, dtype="int64"),
                             "nb": pd.array(nb, dtype="int64"),
                             "common": pd.array([1] * len(a), dtype="int64")})

    g = ds.map_batches(grams, batch_format="pyarrow")
    pairs = g.groupby("g").map_groups(gram_pairs, batch_format="pandas")
    acc = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("common", alias_name="common"),
        Max("na", alias_name="na"),
        Max("nb", alias_name="nb"),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        common = t.column("common").to_numpy().astype(np.float64)
        na = t.column("na").to_numpy().astype(np.float64)
        nb = t.column("nb").to_numpy().astype(np.float64)
        j = common / (na + nb - common)
        keep = j >= threshold
        out = t.filter(pa.array(keep))
        jac = pa.array(np.round(j[keep], 6))
        return pa.table({"doc_a": out.column("doc_a"), "doc_b": out.column("doc_b"),
                         "jaccard": jac})

    return acc.map_batches(finish, batch_format="pyarrow")


def dedup_ngram_jaccard(sf_dir: str, n: int = 3, threshold: float = 0.3):
    return ngram_jaccard_pairs(_docs(sf_dir), n, threshold)


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.3) -> str:
    """DuckDB rendering of the exact n-gram Jaccard (distinct word n-grams,
    space-split tokens, empties dropped)."""
    return f"""WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
tri AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[i:i+{n - 1}], ' ') AS g
  FROM toks, UNNEST(generate_series(1, greatest(len(w) - {n - 1}, 1))) AS t(i)
  WHERE len(w) > 0
),
n AS (SELECT doc_id, count(*) AS c FROM tri GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT co.doc_a, co.doc_b,
       round(common / (na.c + nb.c - common), 6) AS jaccard
FROM co JOIN n na ON na.doc_id = co.doc_a JOIN n nb ON nb.doc_id = co.doc_b
WHERE common / (na.c + nb.c - common) >= {threshold}"""


# ---------------------------------------------------------------- embedding cosine


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Embedding near-dup: broadcast the normalized matrix once (``ray.put``),
    sims rounded to 4dp (DuckDB computes list_cosine_similarity in float32;
    4dp is the precision both engines agree on — verified by test_trainingdata),
    each batch does one matmul against it.  At 10^9+ vectors the broadcast is
    replaced by the LSH/IVF bucketing in similarity.py — same pair semantics."""
    import pyarrow.parquet as pq
    import ray

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    mat = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def block(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bid = t.column("vec_id").to_numpy()
        bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_mat.T
        a_out, b_out, s_out = [], [], []
        for r in range(len(bid)):
            hit = np.nonzero((sims[r] >= threshold) & (all_ids > bid[r]))[0]
            for h in hit:
                a_out.append(int(bid[r])); b_out.append(int(all_ids[h]))
                s_out.append(round(float(sims[r, h]), 4))
        return pa.table({"vec_a": pa.array(a_out, pa.int64()),
                         "vec_b": pa.array(b_out, pa.int64()),
                         "sim": pa.array(s_out, pa.float64())})

    return ds.map_batches(block, batch_format="pyarrow", batch_size=512)


def embedding_dup_sql(threshold: float = 0.4) -> str:
    return f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}"""
