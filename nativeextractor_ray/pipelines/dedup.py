"""Deduplication operators over the ``documents`` table — the training-data
pipeline family: exact, MinHash+LSH, SimHash, exact n-gram Jaccard, and
embedding-cosine near-dup.

Scale shape (each documented inline):
- exact:     per-batch md5 keys → ``groupby(key)`` (shuffles 16-byte keys +
             ids, never text).
- minhash:   shingle→signature per batch (vectorized, token-hash cache) →
             one (bucket:int64, doc_id, sig) row per LSH band → **coarse**
             ``groupby(bucket % P)`` so each shuffle partition holds many
             buckets → vectorized pandas groupby inside the partition emits
             in-bucket pairs.  Grouping by the raw bucket would mean one
             Python UDF call per (mostly singleton) bucket — the per-group
             overhead, not the hashing, is what dominates at scale.
- simhash:   64-bit signature per doc, 4×16-bit band buckets, same coarse
             partition-then-local-groupby shape, in-bucket Hamming filter.
- ngram:     exact Jaccard via co-occurrence counting: (gram, doc_id,
             n_gram) rows → coarse partition → per-gram pair partials →
             ``groupby(pair)`` sums.  No broadcast of per-doc counts (they
             ride on each row), no join.
- embedding: banded hyperplane-LSH buckets → in-bucket exact cosine
             rerank (simhash-shaped coarse partition; nothing global is
             broadcast, the SQL oracle replays the bucketing).

All pair emitters cap pathological buckets at ``MAX_BUCKET`` docs
(SURVEY.md §4.3.2 skew rule) — a degenerate corpus (everything identical)
must not go quadratic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from nativeextractor_ray.functions.vectors import embedding_matrix
from nativeextractor_ray.functions.hashing import (
    GOLDEN,
    h64,
    hamming64,
    minhash_perms,
    minhash_signature,
)

# LSH geometry: 16 bands x 4 rows over a 64-wide signature → catches
# pairs from ~Jaccard 0.5 up with high probability.
MINHASH_K = 64
BANDS = 16
ROWS_PER_BAND = 4
MAX_BUCKET = 1000
N_PARTS = 256  # coarse shuffle partitions (buckets per partition >> 1)


def _adaptive_nparts(sf_dir: str, table: str = "documents") -> int:
    """Coarse-shuffle width scaled to the input size (metadata-only probe,
    ``common.adaptive_parts``): 256+ is right at web scale but pure
    scheduling overhead at bench scale.  Partition count never changes
    RESULTS here — every pair/keep decision is made per bucket/cluster,
    and partitions only batch buckets together."""
    from nativeextractor_ray.pipelines.common import adaptive_parts

    return adaptive_parts(sf_dir, table=table)

# Driver/broadcast size gates for the minhash verify leg and the cluster
# keep/drop application.  Below the bound the small side is pulled/broadcast
# (fast path); above it everything stays distributed.  Module-level so tests
# can force either path (set to 0) and assert bit-identical output.
PAIR_DRIVER_BOUND = 256 << 20
SHINGLE_BROADCAST_BOUND = 256 << 20
COMPONENT_BROADCAST_BOUND = 256 << 20

def _docs(sf_dir: str, columns=("doc_id", "text")):
    from nativeextractor_ray.sources.tables import read_table

    return read_table(sf_dir, "documents", list(columns))


# ---------------------------------------------------------------- exact


def dedup_exact_from(ds):
    """Exact dedup over any (doc_id, text) Dataset: hash-partition on
    md5(text), keep min doc_id per group."""
    from ray.data.aggregate import Count, Min

    def keys(t: pa.Table) -> pa.Table:
        key = [hashlib.md5(s.encode()).hexdigest() for s in t.column("text").to_pylist()]
        return pa.table({"key": pa.array(key, pa.string()), "doc_id": t.column("doc_id")})

    return ds.map_batches(keys, batch_format="pyarrow").groupby("key").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )


def dedup_exact(sf_dir: str):
    return dedup_exact_from(_docs(sf_dir))


def combine_exact_partials(ds):
    """Merge per-checkpoint-partition exact-dedup partials — the same
    associative combine as the live groupby: min keep_id, summed n_dups
    per content key."""
    from ray.data.aggregate import Min, Sum

    return ds.groupby("key").aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("n_dups", alias_name="n_dups")
    )


DEDUP_EXACT_SQL = """SELECT md5(text) AS key, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)"""


# ---------------------------------------------------------------- tokenizing


class _TokenHashCache:
    """blake2b token hashes with a per-actor cache (vocabularies are
    Zipfian: most tokens repeat, so the hash becomes a dict hit)."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def hash_tokens(self, text: str) -> np.ndarray:
        c = self.cache
        out = []
        for tok in text.split(" "):
            if not tok:
                continue
            v = c.get(tok)
            if v is None:
                v = h64(tok)
                c[tok] = v
            out.append(v)
        return np.array(out, dtype=np.uint64)


def _shingle_hashes(tok_hashes: np.ndarray, n: int) -> np.ndarray:
    """Distinct word-n-gram hashes from token hashes — vectorized mix of n
    consecutive token hashes (order-sensitive, like hashing the joined
    string but without string allocation)."""
    m = len(tok_hashes)
    if m == 0:
        return tok_hashes
    if m < n:
        n = m
    with np.errstate(over="ignore"):
        # multiply-THEN-xor chain: xor-first ((a^b)*G) is symmetric in the
        # first two tokens, so transposed grams collided (caught by the
        # minhash-vs-exact-SQL oracle); acc*G ^ t is order-sensitive at
        # every position
        acc = tok_hashes[: m - n + 1].copy()
        for k in range(1, n):
            acc = (acc * GOLDEN) ^ tok_hashes[k : m - n + 1 + k]
    return np.unique(acc)


# ---------------------------------------------------------------- minhash/LSH


class MinHasher:
    """Compile-once state (permutation table, token-hash cache) — actor."""

    def __init__(self, shingle_n: int = 3, n_parts: int = N_PARTS,
                 with_sig: bool = True):
        self.perms = minhash_perms(MINHASH_K)
        self.n = shingle_n
        self.n_parts = n_parts
        #: ship the full 512 B signature per (doc, band) row only when the
        #: caller needs the estimator (``minhash_pairs``); the exact-verify
        #: pipeline (``dedup_minhash_pairs``) sets False and the candidate
        #: shuffle shrinks ~20x (24 B rows) — measured 410 MB -> 20 MB at a
        #: replica-heavy sf1
        self.with_sig = with_sig
        self.tokens = _TokenHashCache()
        # per-band mixing constants fold the band index into the bucket key
        rng = np.random.default_rng(1234)
        self.band_salt = rng.integers(1, 2**63, size=BANDS, dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        n_docs = len(texts)
        sigs = np.empty((n_docs, MINHASH_K), dtype=np.uint64)
        for i, txt in enumerate(texts):
            sh = _shingle_hashes(self.tokens.hash_tokens(txt), self.n)
            sigs[i] = minhash_signature(sh, self.perms)
        # bucket key per (doc, band): mix the band's rows into one int64
        with np.errstate(over="ignore"):
            banded = sigs.reshape(n_docs, BANDS, ROWS_PER_BAND)
            acc = self.band_salt[None, :].repeat(n_docs, axis=0)
            for r in range(ROWS_PER_BAND):
                acc = (acc ^ banded[:, :, r]) * GOLDEN
        bucket = (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        cols = {
            "bucket": pa.array(bucket.ravel()),
            "part": pa.array((bucket.ravel() % self.n_parts).astype(np.int64)),
            "doc_id": pa.array(np.repeat(ids, BANDS), pa.int64()),
        }
        if self.with_sig:
            sig_bytes = [s.tobytes() for s in sigs]
            cols["sig"] = pa.array(
                [sig_bytes[i] for i in np.repeat(np.arange(n_docs), BANDS)],
                pa.binary())
        return pa.table(cols)


_MINHASHERS: "dict[tuple[int, bool], MinHasher]" = {}


def _minhash_batch(t: pa.Table, n_parts: int = N_PARTS,
                   with_sig: bool = True) -> pa.Table:
    """Task-mode MinHasher: state is cheap to build (perm table + empty
    token cache) and cached per worker PROCESS, so the map fuses with the
    upstream read instead of paying actor-pool spin-up per query."""
    key = (n_parts, with_sig)
    mh = _MINHASHERS.get(key)
    if mh is None:
        mh = _MINHASHERS[key] = MinHasher(n_parts=n_parts, with_sig=with_sig)
    return mh(t)


def _empty_pairs_df() -> pd.DataFrame:
    return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                         "doc_b": pd.array([], dtype="int64"),
                         "est_jaccard": pd.array([], dtype="float64")})


def _minhash_partition_pairs(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """One shuffle partition = many buckets; fully vectorized.

    On replica-heavy corpora (the adversarial 30-50%-near-dup case) the
    in-bucket cliques emit millions of raw pairs per run; the previous
    per-bucket Python loop spent ~50 core-seconds appending them one at a
    time at sf1 — now every step (bucket grouping, doc dedup, i<j pair
    enumeration, signature-equality estimation) is a numpy kernel.  Pair
    enumeration batches buckets by SIZE: all buckets of size s share one
    ``triu_indices(s, 1)`` template, broadcast over their start offsets —
    distinct sizes are few, so the Python loop runs O(#distinct sizes),
    never O(#buckets).  Bit-identical output (up to row order, which every
    consumer ignores) to the scalar reference kept in
    tests/test_trainingdata.py::test_minhash_partition_pairs_vectorized."""
    g = g[g.duplicated("bucket", keep=False)]
    if not len(g):
        return _empty_pairs_df()
    codes, _ = pd.factorize(g["bucket"].to_numpy(), sort=False)
    ids = g["doc_id"].to_numpy()
    n_buckets = int(codes.max()) + 1
    raw_sizes = np.bincount(codes, minlength=n_buckets)
    # stable (bucket, doc_id) order: within a bucket ids ascend, so pair
    # emission below always has doc_a < doc_b (ties removed next)
    order = np.lexsort((ids, codes))
    codes_s, ids_s = codes[order], ids[order]
    first = np.ones(len(codes_s), dtype=bool)  # first occurrence per (b, id)
    first[1:] = (codes_s[1:] != codes_s[:-1]) | (ids_s[1:] != ids_s[:-1])
    # MAX_BUCKET skew gate applies to the RAW bucket size (pre-dedup),
    # exactly like the scalar loop did
    keep = (raw_sizes[codes_s] <= MAX_BUCKET) & first
    codes_k, ids_k, rows_k = codes_s[keep], ids_s[keep], order[keep]
    sizes = np.bincount(codes_k, minlength=n_buckets)
    emit = sizes >= 2
    if not emit.any():
        return _empty_pairs_df()
    # drop rows of non-emitting buckets, then recompute contiguous starts
    row_keep = emit[codes_k]
    codes_k, ids_k, rows_k = codes_k[row_keep], ids_k[row_keep], rows_k[row_keep]
    s = sizes[emit]
    starts = np.concatenate(([0], np.cumsum(s)[:-1]))
    ia_parts, ib_parts = [], []
    for size in np.unique(s):
        sel = np.nonzero(s == size)[0]
        ti, tj = np.triu_indices(int(size), 1)
        ia_parts.append((starts[sel][:, None] + ti[None, :]).ravel())
        ib_parts.append((starts[sel][:, None] + tj[None, :]).ravel())
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    if "sig" not in g.columns:
        # exact-verify path (dedup_minhash_pairs): every in-bucket pair IS
        # a candidate — no estimator, no signature bytes in the shuffle.
        # est_jaccard=1.0 keeps the downstream _pair_dedup schema stable.
        return pd.DataFrame({
            "doc_a": pd.array(ids_k[ia], dtype="int64"),
            "doc_b": pd.array(ids_k[ib], dtype="int64"),
            "est_jaccard": pd.array(np.ones(len(ia)), dtype="float64"),
        })
    # one contiguous signature matrix for the kept rows (bytes join is a
    # single C-level copy; no per-row frombuffer)
    sig_col = g["sig"].to_numpy()
    sigs = np.frombuffer(
        b"".join(sig_col[rows_k]), dtype=np.uint64
    ).reshape(len(rows_k), -1)
    # chunk the pair gather through PREALLOCATED buffers (np.take/np.equal
    # with out=): the naive `sigs[ca] == sigs[cb]` allocates ~128 MiB of
    # fresh pages per chunk, and first-touch page-fault cost dominates the
    # arithmetic 30-70x on memory-pressured hosts (measured 70s -> 1.9s per
    # 1.3M-pair task); small reused buffers also keep the working set in
    # cache.  Transient memory is bounded at ~2 x chunk x K x 8 B.
    k_width = sigs.shape[1]
    chunk = 16384
    buf_a = np.empty((chunk, k_width), dtype=np.uint64)
    buf_b = np.empty((chunk, k_width), dtype=np.uint64)
    eq = np.empty((chunk, k_width), dtype=bool)
    a_parts, b_parts, j_parts = [], [], []
    for lo in range(0, len(ia), chunk):
        ca, cb = ia[lo:lo + chunk], ib[lo:lo + chunk]
        m = len(ca)
        np.take(sigs, ca, axis=0, out=buf_a[:m])
        np.take(sigs, cb, axis=0, out=buf_b[:m])
        np.equal(buf_a[:m], buf_b[:m], out=eq[:m])
        est = eq[:m].mean(axis=1)
        hit = est >= threshold
        a_parts.append(ids_k[ca[hit]])
        b_parts.append(ids_k[cb[hit]])
        j_parts.append(np.round(est[hit], 6))
    return pd.DataFrame({
        "doc_a": pd.array(np.concatenate(a_parts), dtype="int64"),
        "doc_b": pd.array(np.concatenate(b_parts), dtype="int64"),
        "est_jaccard": pd.array(np.concatenate(j_parts), dtype="float64"),
    })



def _pair_dedup(pairs, value_col: str, how: str, n_parts: int = N_PARTS):
    """Coarse-partitioned pair-level dedup: the same (doc_a, doc_b) pair can
    surface from several bands/buckets; combine with a local vectorized
    pandas groupby per hash partition (a raw 2-int-key Ray aggregate costs
    an order of magnitude more at scale — see the ngram stage)."""
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return t.append_column("part2", pa.array((a * 1_000_003 + b) % n_parts))

    def combine(grp: pd.DataFrame) -> pd.DataFrame:
        out = (grp.groupby(["doc_a", "doc_b"], sort=False)[value_col]
               .agg(how).reset_index())
        return out[["doc_a", "doc_b", value_col]]

    pairs = pairs.map_batches(add_part, batch_format="pyarrow")
    return pairs.groupby("part2").map_groups(combine, batch_format="pandas")


def _minhash_candidates(ds, threshold: float, n_parts: int = N_PARTS,
                        with_sig: bool = True):
    """Raw in-bucket pair candidates (may repeat across bands — callers
    dedup, either via :func:`_pair_dedup` or inside their own verify
    partition).  ``with_sig=False`` drops the signature estimator: every
    in-bucket pair is a candidate (``threshold`` unused), and the shuffle
    carries 24 B rows instead of 536 B."""
    buckets = ds.map_batches(lambda t: _minhash_batch(t, n_parts, with_sig),
                             batch_format="pyarrow")
    return buckets.groupby("part").map_groups(
        lambda g: _minhash_partition_pairs(g, threshold), batch_format="pandas"
    )


def minhash_pairs(ds, threshold: float = 0.5, n_parts: int = N_PARTS):
    """MinHash+LSH near-dup pairs over any (doc_id, text) Dataset."""
    return _pair_dedup(_minhash_candidates(ds, threshold, n_parts),
                       "est_jaccard", "max", n_parts)


def _empty_pairs():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64())}))


def _bloom_from_pairs(pairs_ds, n_pairs: int):
    """Candidate-id semijoin filter built WITHOUT driver-resident id state:
    each pair block reduces to its unique ids (distributed), and the driver
    folds the blocks into a fixed-size Bloom filter one block at a time —
    peak driver memory is the filter (≤1 GiB bits) plus ONE block, at any
    near-dup rate.  False positives only admit extra docs into shingle
    extraction; verification is exact, so output is unchanged."""
    import ray

    from nativeextractor_ray.functions.hashing import BloomIdFilter

    n_est = max(1024, 2 * n_pairs)  # ids per pair ≤ 2
    log2 = int(np.ceil(np.log2(n_est * 16)))  # 16 bits/element → ~0.2% fp
    filt = BloomIdFilter(min(max(log2, 16), 33))

    def block_ids(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t.column("doc_a").to_numpy(), t.column("doc_b").to_numpy()]))
        return pa.table({"doc_id": pa.array(u, pa.int64())})

    from nativeextractor_ray.functions.blocks import arrow_blocks

    # streamed fold: arrow_blocks pulls one block at a time
    for t in arrow_blocks(pairs_ds.map_batches(
            block_ids, batch_format="pyarrow")):
        filt.add(t.column("doc_id").to_numpy())
        del t
    return filt


def dedup_minhash_pairs(sf_dir: str, threshold: float = 0.5, shingle_n: int = 3):
    """LSH candidates + EXACT verification (the standard production shape):

    1. MinHash/LSH banding proposes EVERY in-bucket pair as a candidate
       (no estimator gate at all — the full signatures would otherwise
       dominate the candidate shuffle at 536 B/row, and any estimator
       pre-filter can only LOSE true pairs; recall is therefore pure LSH
       bucketing, the documented P(miss));
    2. each candidate is verified with its exact word-``shingle_n``-gram
       Jaccard and kept iff ``jaccard >= threshold``.

    Scale shape — BOTH sides of the verify leg are size-gated, so no step
    ever holds O(corpus) on the driver (web crawls run 30-50% near-dup,
    so "pairs scale with the near-dup population" is NOT a small-side
    argument at 100 TB):

    - candidate pairs are ALWAYS deduped by the coarse-partitioned
      :func:`_pair_dedup` shuffle (parallel — on replica-heavy corpora the
      RAW candidate rows run ~bands × the unique-pair count, and a driver
      pandas dedup over them was the serial leg that capped 4→16 scaling
      at ~0.43 measured at sf1); only the ID-FILTER choice is size-gated
      on the DEDUPED pairs: ≤ ``PAIR_DRIVER_BOUND`` → exact sorted-int64
      id-array broadcast (8 B/id, vectorized probe), above → a
      constant-memory Bloom filter folded block-by-block
      (:func:`_bloom_from_pairs`).
    - shingles ≤ ``SHINGLE_BROADCAST_BOUND``: one ``ray.put`` + shuffle-free
      ``map_batches`` verify; above: two coarse-partitioned shuffles attach
      each side of every pair.

    Oracle: exact verification makes the output SQL-expressible —
    ``ngram_jaccard_sql(shingle_n, threshold)`` recomputes the same pairs
    quadratically in DuckDB; they agree whenever LSH recall at
    ``threshold`` is 1 on the data (16 bands × 4 rows: P(miss) at J=0.8
    is ~3e-8 — and with the estimator gate gone this is the ONLY
    approximation left; verified empirically at every sf).  Both gate paths are
    asserted bit-identical in ``tests/test_trainingdata.py`` by forcing
    the bounds to 0."""
    import ray
    import ray.data

    np_ = _adaptive_nparts(sf_dir)
    # raw candidates (band-level duplicates kept; deduped below).
    cand = _minhash_candidates(
        _docs(sf_dir), threshold, np_, with_sig=False).materialize()

    if (cand.size_bytes() or 0) <= PAIR_DRIVER_BOUND:
        # Small side: pull pair blocks, dedup exactly on the driver, and
        # broadcast the candidate ids as a sorted array.
        from nativeextractor_ray.functions.blocks import arrow_blocks

        pair_tbls = [t.select(["doc_a", "doc_b"])
                     for t in arrow_blocks(cand, stream=False)]
        if not pair_tbls:
            return _empty_pairs()

        # distinct + sort in Arrow C++ (multi-threaded kernels) — the
        # previous pandas concat/drop_duplicates/sort chain was ~2-3 s of
        # SINGLE-threaded driver time on 6M candidate rows, a measured
        # Amdahl drag on 4->16 scaling
        pairs_tbl = (pa.concat_tables(pair_tbls)
                     .group_by(["doc_a", "doc_b"]).aggregate([])
                     .sort_by([("doc_a", "ascending"),
                               ("doc_b", "ascending")]))
        CHUNK = 4096
        pair_chunks = [
            pairs_tbl.slice(i, CHUNK)
            for i in range(0, pairs_tbl.num_rows, CHUNK)
        ] or [pairs_tbl]
        pairs_ds = ray.data.from_arrow(pair_chunks)
        from nativeextractor_ray.functions.hashing import ExactIdFilter

        id_filter = ExactIdFilter(np.concatenate([
            pairs_tbl.column("doc_a").to_numpy(),
            pairs_tbl.column("doc_b").to_numpy()]))
    else:
        # Scale side: pair dedup stays a coarse shuffle; the id filter is a
        # constant-memory Bloom built by a streamed distributed fold.
        pairs_ds = _pair_dedup(cand, "est_jaccard", "max", np_).map_batches(
            lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        ).materialize()
        n_pairs = pairs_ds.count()
        if n_pairs == 0:
            return _empty_pairs()
        id_filter = _bloom_from_pairs(pairs_ds, n_pairs)
    idref = ray.put(id_filter)

    def shingle_sets(t: pa.Table) -> pa.Table:
        # task (not actor) stage: the candidate filter drops most rows, so
        # pool startup would dwarf the work; the token cache is per batch
        filt = ray.get(idref)
        ids = t.column("doc_id").to_numpy()
        mask = filt.contains(ids)
        if not mask.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.binary())})
        idx = np.nonzero(mask)[0]
        tokens = _TokenHashCache()
        texts = t.column("text").take(pa.array(idx)).to_pylist()
        s_out = []
        for txt in texts:
            sh = _shingle_hashes(tokens.hash_tokens(txt), shingle_n)
            s_out.append(sh.tobytes())  # binary, not list<int64>:
            # Ray auto-promotes equal-length list columns to a
            # tensor extension type that breaks pandas map_groups
        return pa.table({
            "doc_id": pa.array(ids[idx], pa.int64()),
            "sh": pa.array(s_out, pa.binary()),
        })

    shingles = _docs(sf_dir).map_batches(
        shingle_sets, batch_format="pyarrow"
    ).materialize()  # consumed by BOTH verify shuffles — computed once

    # Small-side broadcast fast path: when the candidate shingle sets fit
    # comfortably in the object store, ship them once via ``ray.put`` and
    # verify pairs shuffle-free; otherwise fall through to the two
    # coarse-partitioned attach shuffles below.
    if (shingles.size_bytes() or 0) <= SHINGLE_BROADCAST_BOUND:
        # flat columnar map, not a dict: (sorted ids, offsets, one buffer)
        # builds with numpy concatenates (the dict build was a serial
        # driver leg measured in seconds at sf1) and broadcasts compactly
        from nativeextractor_ray.functions.blocks import arrow_blocks

        id_arrs, len_arrs, buf_parts = [], [], []
        for t in arrow_blocks(shingles):
            sh = t.column("sh")
            id_arrs.append(t.column("doc_id").to_numpy())
            len_arrs.append(
                pc.binary_length(sh).to_numpy().astype(np.int64) // 8)
            buf_parts.append(b"".join(sh.to_pylist()))
            del t
        sh_ids = np.concatenate(id_arrs) if id_arrs else np.array([], np.int64)
        lens = (np.concatenate(len_arrs) if len_arrs
                else np.array([], np.int64)).astype(np.int64)
        flat = np.frombuffer(b"".join(buf_parts), dtype=np.uint64)
        order = np.argsort(sh_ids, kind="stable")
        starts = np.concatenate(([0], np.cumsum(lens)))
        # reorder the ragged rows to id order
        flat = np.concatenate(
            [flat[starts[i]:starts[i + 1]] for i in order]
        ) if len(order) else flat
        sh_ids, lens = sh_ids[order], lens[order]
        offs = np.concatenate(([0], np.cumsum(lens)))
        shref = ray.put((sh_ids, offs, flat))

        def bverify(t: pa.Table) -> pa.Table:
            ids_s, offs_, flat_ = ray.get(shref)
            a = t.column("doc_a").to_numpy()
            b = t.column("doc_b").to_numpy()
            if not ids_s.size or not len(a):
                return pa.table({"doc_a": pa.array([], pa.int64()),
                                 "doc_b": pa.array([], pa.int64()),
                                 "jaccard": pa.array([], pa.float64())})
            # vectorized id -> row lookup for the whole batch at once
            pa_ = np.searchsorted(ids_s, a).clip(0, ids_s.size - 1)
            pb_ = np.searchsorted(ids_s, b).clip(0, ids_s.size - 1)
            ok = (ids_s[pa_] == a) & (ids_s[pb_] == b)
            a_out, b_out, j_out = [], [], []
            for i in np.nonzero(ok)[0]:
                ia, ib = pa_[i], pb_[i]
                sa = flat_[offs_[ia]:offs_[ia + 1]]
                sb = flat_[offs_[ib]:offs_[ib + 1]]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                # two token-free docs: 0/0 — the SQL oracle's NULL-division
                # row is excluded by WHERE, so exclude here too (exact
                # dedup owns the empty-doc case)
                j = inter / union if union else 0.0
                if j >= threshold:
                    a_out.append(int(a[i])); b_out.append(int(b[i]))
                    j_out.append(round(j, 6))
            return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                             "doc_b": pa.array(b_out, pa.int64()),
                             "jaccard": pa.array(j_out, pa.float64())})

        import ray.data

        return pairs_ds.map_batches(bverify, batch_format="pyarrow")

    # shuffle A: attach doc_a's shingle list to each pair
    def tag_a(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        return pa.table({
            "key": a, "doc_b": t.column("doc_b"),
            "sh": pa.nulls(len(a), pa.binary()),
            "part3": pa.array((a % np_).astype(np.int64)),
        })

    def tag_sh(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        return pa.table({
            "key": d, "doc_b": pa.nulls(len(d), pa.int64()),
            "sh": t.column("sh"),
            "part3": pa.array((d % np_).astype(np.int64)),
        })

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        sets = df[df["doc_b"].isna()].drop_duplicates("key").set_index("key")["sh"]
        prs = df[~df["doc_b"].isna()].drop_duplicates(["key", "doc_b"])
        out = pd.DataFrame({
            "doc_a": prs["key"].astype("int64"),
            "doc_b": prs["doc_b"].astype("int64"),
            "sh_a": prs["key"].map(sets),
        })
        out["part4"] = (out["doc_b"].to_numpy() % np_).astype("int64")
        return out

    # shuffle B: attach doc_b's list, compute exact jaccard
    def tag_b_sh(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        return pa.table({
            "doc_a": pa.nulls(len(d), pa.int64()),
            "doc_b": pa.array(d, pa.int64()),
            "sh_a": t.column("sh"),
            "part4": pa.array((d % np_).astype(np.int64)),
        })

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sets = df[df["doc_a"].isna()].drop_duplicates("doc_b").set_index("doc_b")["sh_a"]
        prs = df[~df["doc_a"].isna()].drop_duplicates(["doc_a", "doc_b"])
        a_out, b_out, j_out = [], [], []
        for a, b, sh_a in zip(prs["doc_a"].astype("int64"),
                              prs["doc_b"].astype("int64"), prs["sh_a"]):
            sh_b = sets.get(b)
            if sh_a is None or sh_b is None:
                continue
            sa = np.frombuffer(sh_a, dtype=np.uint64)
            sb = np.frombuffer(sh_b, dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0  # empty docs: match the
            # oracle's NULL-division exclusion (see bverify)
            if j >= threshold:
                a_out.append(int(a)); b_out.append(int(b)); j_out.append(round(j, 6))
        return pd.DataFrame({"doc_a": pd.array(a_out, dtype="int64"),
                             "doc_b": pd.array(b_out, dtype="int64"),
                             "jaccard": pd.array(j_out, dtype="float64")})

    import ray.data

    withA = (
        pairs_ds.map_batches(tag_a, batch_format="pyarrow")
        .union(shingles.map_batches(tag_sh, batch_format="pyarrow"))
        .groupby("part3")
        .map_groups(attach_a, batch_format="pandas")
    )
    return (
        withA.map_batches(
            lambda t: t.select(["doc_a", "doc_b", "sh_a", "part4"]),
            batch_format="pyarrow")
        .union(shingles.map_batches(tag_b_sh, batch_format="pyarrow"))
        .groupby("part4")
        .map_groups(verify, batch_format="pandas")
    )


# ---------------------------------------------------------------- simhash


def _md5_h64(tok: str) -> int:
    """Lower 8 digest bytes of md5, little-endian — EXACTLY DuckDB's
    ``md5_number_lower``, so the simhash oracle can recompute token hashes
    in SQL (blake2b has no DuckDB equivalent)."""
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[8:16], "little")


class _Md5TokenHashCache(_TokenHashCache):
    def hash_tokens(self, text: str) -> np.ndarray:
        c = self.cache
        out = []
        for tok in text.split(" "):
            if not tok:
                continue
            v = c.get(tok)
            if v is None:
                v = _md5_h64(tok)
                c[tok] = v
            out.append(v)
        return np.array(out, dtype=np.uint64)


class SimHasher:
    """Vectorized simhash: per-doc weighted bit votes over token hashes.

    Token hashes are md5-lower64 (``_md5_h64``) so SIMHASH_SQL can replay
    the identical signature computation with ``md5_number_lower``."""

    def __init__(self):
        self.tokens = _Md5TokenHashCache()
        self._bits = np.arange(64, dtype=np.uint64)

    def sim64(self, th: np.ndarray) -> int:
        if th.size == 0:
            return 0
        uniq, cnt = np.unique(th, return_counts=True)
        bits = ((uniq[:, None] >> self._bits) & np.uint64(1)).astype(np.int64)
        votes = ((2 * bits - 1) * cnt[:, None].astype(np.int64)).sum(axis=0)
        return int(np.packbits((votes > 0)[::-1]).view(">u8")[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        sigs = np.array([self.sim64(self.tokens.hash_tokens(x)) for x in texts],
                        dtype=np.uint64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sig": pa.array(sigs.view(np.int64))})


_SIMHASHER: "SimHasher | None" = None


def _simhash_batch(t: pa.Table) -> pa.Table:
    """Task-mode SimHasher — same per-process state cache as
    :func:`_minhash_batch` (the md5 token cache survives across tasks in
    the same worker, which is where its Zipfian hit rate comes from)."""
    global _SIMHASHER
    if _SIMHASHER is None:
        _SIMHASHER = SimHasher()
    return _SIMHASHER(t)


def _sim_partition_pairs(g: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    g = g[g.duplicated("bucket", keep=False)]  # singleton buckets can't pair
    a_out, b_out, h_out = [], [], []
    for _, grp in g.groupby("bucket", sort=False):
        n = len(grp)
        if n < 2 or n > MAX_BUCKET:
            continue
        ids = grp["doc_id"].to_numpy()
        sigs = grp["sig"].to_numpy().astype(np.int64).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sigs = ids[order], sigs[order]
        for i in range(n - 1):
            hd = hamming64(sigs[i + 1:], sigs[i])
            for j in np.nonzero(hd <= max_hamming)[0]:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[i + 1 + j]))
                h_out.append(int(hd[j]))
    return pd.DataFrame({"doc_a": pd.array(a_out, dtype="int64"),
                         "doc_b": pd.array(b_out, dtype="int64"),
                         "hamming": pd.array(h_out, dtype="int64")})


def simhash_pairs(ds, max_hamming: int = 3, n_parts: int = N_PARTS):
    """SimHash near-dup: 4×16-bit band buckets guarantee recall for
    Hamming ≤ 3 (pigeonhole: one band must match exactly)."""
    sigs = ds.map_batches(_simhash_batch, batch_format="pyarrow")

    def bands(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        s = t.column("sig").to_numpy().astype(np.int64).view(np.uint64)
        n = len(ids)
        bucket = np.empty(4 * n, dtype=np.int64)
        for band in range(4):
            part16 = (s >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            bucket[band * n:(band + 1) * n] = (np.int64(band) << 17) | part16.astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket),
            "part": pa.array(bucket % n_parts),
            "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
            "sig": pa.array(np.tile(s.view(np.int64), 4)),
        })

    b = sigs.map_batches(bands, batch_format="pyarrow")
    pairs = b.groupby("part").map_groups(
        lambda g: _sim_partition_pairs(g, max_hamming), batch_format="pandas"
    )
    return _pair_dedup(pairs, "hamming", "min", n_parts)


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    return simhash_pairs(_docs(sf_dir), max_hamming, _adaptive_nparts(sf_dir))


# SimHash oracle: replays the EXACT signature computation in SQL (md5
# token hashes via md5_number_lower, weighted bit votes, votes > 0 → bit),
# then all-pairs Hamming ≤ 3.  Valid as a full oracle because the 4×16-bit
# banding has GUARANTEED recall for Hamming ≤ 3 (pigeonhole: at most 3
# differing bits can spoil at most 3 of the 4 bands), so the bucketed Ray
# output equals the quadratic SQL — no luck involved.
SIMHASH_SQL = """WITH tk AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
th AS (
  SELECT doc_id, md5_number_lower(tok) AS h, sum(c) AS c
  FROM tk GROUP BY doc_id, md5_number_lower(tok)
),
votes AS (
  SELECT doc_id, b.b,
         sum(c * (2 * CAST((h >> b.b) & 1 AS BIGINT) - 1)) AS v
  FROM th, UNNEST(generate_series(0, 63)) AS b(b)
  GROUP BY doc_id, b.b
),
sigu AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN v > 0 THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
             ELSE 0 END) AS HUGEINT) AS su
  FROM votes GROUP BY doc_id
),
sig AS (  -- uint64 bit pattern reinterpreted as int64 (matches the Ray view)
  SELECT doc_id,
    CAST(CASE WHEN su >= 9223372036854775808 THEN su - 18446744073709551616
         ELSE su END AS BIGINT) AS s
  FROM sigu
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 3"""


# ---------------------------------------------------------------- exact n-gram jaccard


def ngram_jaccard_pairs(ds, n: int = 3, threshold: float = 0.3,
                        n_parts: int = N_PARTS):
    """Exact n-gram Jaccard without a join or broadcast: each (gram, doc)
    row carries the doc's distinct-gram count, so the final pair groupby
    has everything it needs.

    Uses *string* grams (not hashes) so the result is bit-identical to the
    SQL oracle rendering; the coarse-partition trick keeps the shuffle
    groups chunky."""
    from nativeextractor_ray.functions.hashing import word_shingles

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
        g_arr = np.array(g_out, dtype=np.int64)
        return pa.table({"g": pa.array(g_arr),
                         "part": pa.array(g_arr % n_parts),
                         "doc_id": pa.array(i_out, pa.int64()),
                         "n_gram": pa.array(n_out, pa.int64())})

    def partition_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair generation (triu indices per gram bucket), then a
        # LOCAL combine: the same doc pair recurs for every gram the two
        # docs share within this partition — summing here shrinks the
        # global pair shuffle by the per-partition multiplicity
        grp = grp[grp.duplicated("g", keep=False)]  # single-doc grams can't pair
        a_all, b_all, na_all, nb_all = [], [], [], []
        for _, sub in grp.groupby("g", sort=False):
            m = len(sub)
            if m < 2 or m > MAX_BUCKET:
                continue
            sub = sub.sort_values("doc_id", kind="stable")
            ids = sub["doc_id"].to_numpy()
            ns = sub["n_gram"].to_numpy()
            iu, ju = np.triu_indices(m, k=1)
            a_all.append(ids[iu]); b_all.append(ids[ju])
            na_all.append(ns[iu]); nb_all.append(ns[ju])
        if not a_all:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "na": pd.array([], dtype="int64"),
                                 "nb": pd.array([], dtype="int64"),
                                 "common": pd.array([], dtype="int64")})
        df = pd.DataFrame({"doc_a": np.concatenate(a_all),
                           "doc_b": np.concatenate(b_all),
                           "na": np.concatenate(na_all),
                           "nb": np.concatenate(nb_all)})
        out = (df.groupby(["doc_a", "doc_b"], sort=False)
               .agg(na=("na", "max"), nb=("nb", "max"), common=("na", "size"))
               .reset_index())
        return out.astype("int64")

    def add_pair_part(t: pa.Table) -> pa.Table:
        # coarse key for the pair-level combine: the 2-int-key Ray
        # aggregate over millions of pair partials was the wall; the
        # partition+local-pandas pattern is ~50× cheaper
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return t.append_column("part2", pa.array((a * 1_000_003 + b) % n_parts))

    def pair_combine(grp: pd.DataFrame) -> pd.DataFrame:
        out = (grp.groupby(["doc_a", "doc_b"], sort=False)
               .agg(na=("na", "max"), nb=("nb", "max"), common=("common", "sum"))
               .reset_index())
        j = out["common"].to_numpy() / (
            out["na"].to_numpy() + out["nb"].to_numpy() - out["common"].to_numpy()
        )
        out = out[j >= threshold]
        out = out.assign(jaccard=np.round(j[j >= threshold], 6))
        return out[["doc_a", "doc_b", "jaccard"]]

    g = ds.map_batches(grams, batch_format="pyarrow")
    pairs = g.groupby("part").map_groups(partition_pairs, batch_format="pandas")
    pairs = pairs.map_batches(add_pair_part, batch_format="pyarrow")
    return pairs.groupby("part2").map_groups(pair_combine, batch_format="pandas")


def dedup_ngram_jaccard(sf_dir: str, n: int = 3, threshold: float = 0.3):
    return ngram_jaccard_pairs(_docs(sf_dir), n, threshold,
                               _adaptive_nparts(sf_dir))


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


EMB_BANDS = 8
EMB_PLANES = 8  # per band; 8 sign bits -> 256 buckets per band
MAX_EMB_BUCKET = 1000
_EMB_SEED = 23


def _emb_planes(dim: int) -> np.ndarray:
    """Seed-fixed hyperplanes (EMB_BANDS x EMB_PLANES x dim) shared by the
    Ray pipeline and the SQL oracle literals."""
    rng = np.random.default_rng(_EMB_SEED)
    return rng.standard_normal((EMB_BANDS, EMB_PLANES, dim))


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Embedding near-dup, bucketed end-to-end (VERDICT r1 item 2 on the
    quadratic broadcast path): banded random-hyperplane signatures put
    each vector in EMB_BANDS buckets; pairs are reranked exactly (float64
    cosine, 4dp) only within a bucket, using the same coarse
    ``part = bucket % N_PARTS`` shuffle shape as simhash.  Nothing global
    is broadcast and no batch touches the whole matrix — work scales with
    bucket occupancy, not corpus².

    Approximate BY DESIGN for borderline similarities, but fully
    oracle-checked: ``embedding_dup_sql`` replays the identical bucketing
    (plane literals), the MAX_EMB_BUCKET skew cap (HAVING count(*) <=
    cap) and the rerank in DuckDB.  Sign parity is safe for the same
    margin reason as ann_lsh_sql."""
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    np_ = _adaptive_nparts(sf_dir, table="embeddings")

    class EmbBucket:
        def __init__(self, n_parts: int = N_PARTS):
            self.planes = None
            self.n_parts = n_parts

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = t.column("vec_id").to_numpy()
            bm = embedding_matrix(t.column("embedding"))
            bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            if self.planes is None:
                self.planes = _emb_planes(bm.shape[1])
            n = len(bid)
            vec_bytes = [v.tobytes() for v in bm]
            b_out = np.empty(EMB_BANDS * n, dtype=np.int64)
            for band in range(EMB_BANDS):
                sig = np.packbits((bm @ self.planes[band].T > 0), axis=1)[:, 0]
                b_out[band * n:(band + 1) * n] = (np.int64(band) << 8) | sig.astype(np.int64)
            return pa.table({
                "bucket": pa.array(b_out),
                "part": pa.array(b_out % self.n_parts),
                "vec_id": pa.array(np.tile(bid, EMB_BANDS), pa.int64()),
                "vec": pa.array([vec_bytes[i] for i in np.tile(np.arange(n), EMB_BANDS)],
                                pa.binary()),
            })

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, s_out = [], [], []
        for _, grp in g.groupby("bucket", sort=False):
            grp = grp.drop_duplicates(subset="vec_id")
            m = len(grp)
            if m < 2 or m > MAX_EMB_BUCKET:
                continue
            ids = grp["vec_id"].to_numpy()
            mat = np.stack([np.frombuffer(v, dtype=np.float64) for v in grp["vec"]])
            order = np.argsort(ids, kind="stable")
            ids, mat = ids[order], mat[order]
            sims = np.round(mat @ mat.T, 4)
            raw = mat @ mat.T
            iu, ju = np.triu_indices(m, k=1)
            keep = raw[iu, ju] >= threshold
            for i, j in zip(iu[keep], ju[keep]):
                a_out.append(int(ids[i])); b_out.append(int(ids[j]))
                s_out.append(float(sims[i, j]))
        return pd.DataFrame({"vec_a": pd.array(a_out, dtype="int64"),
                             "vec_b": pd.array(b_out, dtype="int64"),
                             "sim": pd.array(s_out, dtype="float64")})

    buckets = ds.map_batches(EmbBucket, batch_format="pyarrow",
                             concurrency=(1, 8),
                             fn_constructor_kwargs={"n_parts": np_})
    pairs = buckets.groupby("part").map_groups(partition_pairs, batch_format="pandas")

    def add_part(t: pa.Table) -> pa.Table:
        a = t.column("vec_a").to_numpy()
        b = t.column("vec_b").to_numpy()
        return t.append_column("part2", pa.array((a * 1_000_003 + b) % np_))

    def combine(grp: pd.DataFrame) -> pd.DataFrame:
        out = (grp.groupby(["vec_a", "vec_b"], sort=False)["sim"].max().reset_index())
        return out[["vec_a", "vec_b", "sim"]]

    pairs = pairs.map_batches(add_part, batch_format="pyarrow")
    return pairs.groupby("part2").map_groups(combine, batch_format="pandas")


def embedding_dup_sql(threshold: float = 0.4, dim: int = 64) -> str:
    """DuckDB replay of the banded-LSH embedding dedup: plane literals →
    per-band sign buckets → skew cap → in-bucket exact cosine pairs."""
    planes = _emb_planes(dim)
    lits = ",\n    ".join(
        "(" + str(band) + ", " + str(j) + ", ["
        + ", ".join(repr(v) for v in planes[band, j]) + "]::DOUBLE[])"
        for band in range(EMB_BANDS) for j in range(EMB_PLANES)
    )
    return f"""WITH planes(band, j, p) AS (VALUES
    {lits}
),
sig AS (
  SELECT e.vec_id, e.embedding, p.band,
         CAST(sum(CASE WHEN list_inner_product(e.embedding, p.p) > 0
                  THEN 1 << (7 - p.j) ELSE 0 END) AS BIGINT) AS b
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, e.embedding, p.band
),
ok AS (
  SELECT band, b FROM sig GROUP BY band, b
  HAVING count(*) BETWEEN 2 AND {MAX_EMB_BUCKET}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b,
         a.embedding AS ea, c.embedding AS eb
  FROM sig a
  JOIN ok ON ok.band = a.band AND ok.b = a.b
  JOIN sig c ON c.band = a.band AND c.b = a.b AND c.vec_id > a.vec_id
)
SELECT vec_a, vec_b,
       round(list_cosine_similarity(ea, eb), 4) AS sim
FROM cand WHERE list_cosine_similarity(ea, eb) >= {threshold}"""


def dedup_keep_list(sf_dir: str):
    """The curated output of exact dedup: doc ids that survive (one per
    content group — the keep side of the cleaning pipeline)."""
    ds = dedup_exact(sf_dir)

    def keep(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("keep_id")})

    return ds.map_batches(keep, batch_format="pyarrow")


DEDUP_KEEP_LIST_SQL = """SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"""


# ---------------------------------------------------------- cluster resolution

CC_DRIVER_MAX = 500_000  # pair-graph size under which driver union-find wins


def dedup_clusters(sf_dir: str, threshold: float = 0.5, shingle_n: int = 3):
    """Near-dup CLUSTER RESOLUTION — the step that turns pairwise near-dup
    evidence into a per-document keep/drop decision for the whole corpus
    (the actual deliverable of corpus dedup at 100 TB: "a~b, b~c" must
    drop BOTH b and c even though a and c never formed a pair).

    Scale shape, end to end:

    1. verified pairs from the MinHash/LSH + exact-verify path
       (:func:`dedup_minhash_pairs`) — pairs scale with the near-dup
       population, never the corpus;
    2. connected components over the pair graph.  The pair set is small
       by the same argument that lets dedup_minhash_pairs dedup it on
       the driver, so up to ``CC_DRIVER_MAX`` edges an exact driver
       union-find resolves it in one pass with zero extra Ray stages;
       past that the distributed kernel takes over
       (``functions/unionfind.py::connected_components_ds`` — edge
       contraction + pointer jumping, O(log diameter) rounds, int64
       shuffle keys; doc ids enter as ZERO-PADDED strings so the
       component representative, the lexicographic min, is the numeric
       min).  Both produce identical min-member labels;
    3. the component map is applied with a SIZE-GATED strategy: under
       ``COMPONENT_BROADCAST_BOUND`` it ships once via ``ray.put``
       (sorted key array + ``searchsorted`` probe) and the corpus is
       labeled map-side in one streaming ``map_batches`` — no shuffle, no
       text movement.  Above the bound (10^10 docs × 30% dups ⇒ a ~24 GB
       map that must NOT live on the driver) the map is hash-partitioned
       on doc_id alongside the corpus ids and attached with ONE
       coarse-partitioned merge — ids only, text never moves.  Both paths
       are asserted bit-identical in ``tests/test_trainingdata.py`` by
       forcing the bound to 0.

    Oracle: recursive min-label reachability CTE over the exact-Jaccard
    pair set (same LSH-recall argument as ``dedup_minhash``'s oracle, same
    CTE shape as ``ENTITY_COMPONENTS_SQL``)."""
    import ray

    pairs = dedup_minhash_pairs(sf_dir, threshold, shingle_n).materialize()
    n_pairs = pairs.count()

    if n_pairs <= CC_DRIVER_MAX:
        # vectorized driver CC: min-label propagation + pointer jumping on
        # int64 arrays (the in-memory twin of connected_components_ds).
        # The previous per-edge Python UnionFind loop was ~2 s of SERIAL
        # driver time at 390k pairs — a measured Amdahl drag on the 4->16
        # scaling of every consumer (curation_e2e read 0.72 with it; the
        # numpy version is ~50 ms).  Identical min-member labels.
        from nativeextractor_ray.functions.blocks import arrow_blocks

        ea_parts, eb_parts = [], []
        for t in arrow_blocks(pairs, stream=False):
            ea_parts.append(t.column("doc_a").to_numpy())
            eb_parts.append(t.column("doc_b").to_numpy())
        by_node = {}
        if ea_parts:
            a = np.concatenate(ea_parts)
            b = np.concatenate(eb_parts)
            nodes, inv = np.unique(np.concatenate([a, b]),
                                   return_inverse=True)
            ea, eb = inv[: len(a)], inv[len(a):]
            lab = np.arange(len(nodes), dtype=np.int64)
            while True:
                old = lab.copy()
                np.minimum.at(lab, ea, lab[eb])
                np.minimum.at(lab, eb, lab[ea])
                while True:
                    nl = lab[lab]
                    if np.array_equal(nl, lab):
                        break
                    lab = nl
                if np.array_equal(lab, old):
                    break
            # nodes is sorted, so the min label INDEX is the min doc_id
            by_node = dict(zip(nodes.tolist(), nodes[lab].tolist()))
    else:
        from nativeextractor_ray.functions.unionfind import connected_components_ds

        def edges(t: pa.Table) -> pa.Table:
            # zero-pad: lexicographic min == numeric min inside the CC kernel
            import pyarrow.compute as pc

            def pad(col):
                return pc.utf8_lpad(pc.cast(col, pa.string()), 20, "0")

            return pa.table({"a": pad(t.column("doc_a")),
                             "b": pad(t.column("doc_b"))})

        comp = connected_components_ds(pairs.map_batches(edges, batch_format="pyarrow"))

        def comp_int(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "node": pc.cast(t.column("node"), pa.int64()),
                "component": pc.cast(t.column("component"), pa.int64()),
            })

        comp_ds = comp.map_batches(comp_int, batch_format="pyarrow").materialize()
        if (comp_ds.size_bytes() or 0) > COMPONENT_BROADCAST_BOUND:
            return _label_by_merge(_docs(sf_dir, columns=("doc_id",)), comp_ds,
                                   _adaptive_nparts(sf_dir))
        # small side after all: stream blocks into flat arrays (no dict)
        from nativeextractor_ray.functions.blocks import arrow_blocks

        by_node = {}
        for t in arrow_blocks(comp_ds, stream=False):
            by_node.update(zip(t.column("node").to_pylist(),
                               t.column("component").to_pylist()))

    keys = np.array(sorted(by_node), dtype=np.int64)
    vals = np.array([by_node[int(k)] for k in keys], dtype=np.int64)
    map_ref = ray.put((keys, vals))

    ds = _docs(sf_dir, columns=("doc_id",))

    def label(t: pa.Table) -> pa.Table:
        keys_, vals_ = ray.get(map_ref)
        ids = t.column("doc_id").to_numpy()
        cluster = ids.copy()
        if len(keys_):
            pos = np.searchsorted(keys_, ids)
            pos = np.clip(pos, 0, len(keys_) - 1)
            hit = keys_[pos] == ids
            cluster[hit] = vals_[pos[hit]]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "keep": pa.array(ids == cluster),
        })

    return ds.map_batches(label, batch_format="pyarrow")


def _label_by_merge(ids_ds, comp_ds, n_parts: int = N_PARTS):
    """Corpus labeling WITHOUT a driver-resident component map: hash-
    partition corpus doc_ids and the (node, component) map on the same
    ``doc_id % N_PARTS`` key and resolve each partition with a vectorized
    local merge.  Only int64 ids move — text is never in this exchange."""

    def tag_ids(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "key": pa.array(ids, pa.int64()),
            "component": pa.nulls(len(ids), pa.int64()),
            "partL": pa.array((ids % n_parts).astype(np.int64)),
        })

    def tag_comp(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_numpy()
        return pa.table({
            "key": pa.array(nodes, pa.int64()),
            "component": t.column("component"),
            "partL": pa.array((nodes % n_parts).astype(np.int64)),
        })

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        m = (df[df["component"].notna()]
             .drop_duplicates("key").set_index("key")["component"])
        rows = df[df["component"].isna()]
        ids = rows["key"].astype("int64")
        cluster = ids.map(m).fillna(ids).astype("int64")
        return pd.DataFrame({
            "doc_id": ids.to_numpy(),
            "cluster_id": cluster.to_numpy(),
            "keep": ids.to_numpy() == cluster.to_numpy(),
        })

    return (
        ids_ds.map_batches(tag_ids, batch_format="pyarrow")
        .union(comp_ds.map_batches(tag_comp, batch_format="pyarrow"))
        .groupby("partL")
        .map_groups(resolve, batch_format="pandas")
    )


def dedup_clusters_sql(threshold: float = 0.5, shingle_n: int = 3) -> str:
    """Recursive-CTE twin of :func:`dedup_clusters`: exact-Jaccard pairs →
    min-label reachability closure → corpus-wide left join."""
    return f"""WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({ngram_jaccard_sql(shingle_n, threshold)}) q
),
nodes AS (SELECT doc_a AS node FROM pairs UNION SELECT doc_b FROM pairs),
bi AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       UNION ALL SELECT doc_b, doc_a FROM pairs),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT bi.v, w.label FROM walk w JOIN bi ON bi.u = w.node
),
comp AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       d.doc_id = coalesce(c.cluster_id, d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"""


# ---------------------------------------------------------------- semantic


SEM_K = 32
SEM_THRESHOLD = 0.4
MAX_SEM_CLUSTER = 4000


def dedup_semantic(sf_dir: str, threshold: float = SEM_THRESHOLD,
                   k: int = SEM_K):
    """SemDeDup-style semantic dedup: k-means-cluster the embedding space
    (the deterministic spherical quantizer shared with ``ann_ivf_topk``),
    then WITHIN each cluster drop every vector that has a lower-id
    neighbour with cosine >= ``threshold``.  Output is one row per corpus
    vector: ``(vec_id, cluster, keep)``.

    Distinct algorithm from :func:`embedding_dup_pairs` (random-hyperplane
    LSH bands): here the partition is a GLOBAL learned clustering, the
    published shape for semantic dedup of web-scale corpora (SemDeDup,
    Abbas et al. 2023 — pairs are only ever compared inside a cluster, so
    work is sum(m_c^2) over cluster sizes, never corpus^2).

    Scale shape: centroids are broadcast once (`ray.put`, k x d doubles);
    assignment is one vectorized matmul per batch; the only shuffle is the
    coarse ``cluster % N_PARTS`` groupby.  At 10^10 vectors ``k`` scales
    to ~corpus/10^5 so clusters stay bounded; clusters above
    ``MAX_SEM_CLUSTER`` are kept wholesale (skew cap, replayed by the
    oracle's HAVING clause).

    Approximate BY DESIGN (cross-cluster near-dups are missed), yet fully
    oracle-checked: the trained centroids are deterministic, so
    :func:`dedup_semantic_sql` embeds them as DOUBLE[] literals and
    replays assignment (argmax cosine, ties to the lowest centroid index),
    the skew cap, and the in-cluster drop rule in DuckDB.  Float safety is
    the ann_ivf_sql argument: float64 cosine agrees to ~4e-16 while
    assignment/threshold margins on the test corpora are >= 1e-5
    (asserted in tests/test_trainingdata.py)."""
    import ray

    from nativeextractor_ray.pipelines.similarity import (
        _train_centroids,
        _train_sample,
    )
    from nativeextractor_ray.sources.tables import read_table

    cent = _train_centroids(_train_sample(sf_dir), k=k)
    cent_ref = ray.put(cent)
    np_ = _adaptive_nparts(sf_dir, table="embeddings")

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = t.column("vec_id").to_numpy()
        bm = embedding_matrix(t.column("embedding"))
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        cl = np.argmax(bm @ c.T, axis=1).astype(np.int64)  # first max == lowest j
        return pa.table({
            "cluster": pa.array(cl),
            "part": pa.array(cl % np_),
            "vec_id": pa.array(ids, pa.int64()),
            "vec": pa.array([v.tobytes() for v in bm], pa.binary()),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        id_out, cl_out, keep_out = [], [], []
        for cl, grp in g.groupby("cluster", sort=False):
            ids = grp["vec_id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            m = len(ids)
            if m < 2 or m > MAX_SEM_CLUSTER:
                keep = np.ones(m, dtype=bool)  # cap: oversized kept wholesale
            else:
                mat = np.stack([np.frombuffer(v, dtype=np.float64)
                                for v in grp["vec"].to_numpy()[order]])
                raw = mat @ mat.T
                # drop i iff some j < i (id order) has cosine >= threshold
                keep = ~np.any(np.triu(raw >= threshold, k=1), axis=0)
            id_out.append(ids)
            cl_out.append(np.full(m, cl, dtype=np.int64))
            keep_out.append(keep)
        if not id_out:
            return pd.DataFrame({"vec_id": pd.array([], dtype="int64"),
                                 "cluster": pd.array([], dtype="int64"),
                                 "keep": pd.array([], dtype="bool")})
        return pd.DataFrame({"vec_id": np.concatenate(id_out),
                             "cluster": np.concatenate(cl_out),
                             "keep": np.concatenate(keep_out)})

    asg = ds.map_batches(assign, batch_format="pyarrow")
    return asg.groupby("part").map_groups(per_part, batch_format="pandas")


def dedup_semantic_sql(sf_dir: str | None = None,
                       threshold: float = SEM_THRESHOLD,
                       k: int = SEM_K) -> str:
    """DuckDB twin of :func:`dedup_semantic` — centroids trained on
    ``$GRAFT_ORACLE_SF_DIR`` (the table the SQL runs against) embedded as
    DOUBLE[] literals, then assignment + skew cap + drop rule replayed."""
    import os

    from nativeextractor_ray.pipelines.similarity import (
        _train_centroids,
        _train_sample,
    )

    sf_dir = sf_dir or os.environ.get("GRAFT_ORACLE_SF_DIR",
                                      "/root/testdata/sf0.01")
    cent = _train_centroids(_train_sample(sf_dir), k=k)
    lits = ",\n    ".join(
        "(" + str(j) + ", [" + ", ".join(repr(v) for v in cent[j]) + "]::DOUBLE[])"
        for j in range(len(cent))
    )
    return f"""WITH cent(j, c) AS (VALUES
    {lits}
),
asg AS (
  SELECT vec_id, embedding, j,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_cosine_similarity(embedding, c) DESC, j) AS rn
  FROM embeddings CROSS JOIN cent
),
assign AS (SELECT vec_id, embedding, j AS cluster FROM asg WHERE rn = 1),
big AS (SELECT cluster FROM assign GROUP BY cluster
        HAVING count(*) > {MAX_SEM_CLUSTER}),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE a.cluster NOT IN (SELECT cluster FROM big)
    AND list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
)
SELECT v.vec_id, CAST(v.cluster AS BIGINT) AS cluster,
       v.vec_id NOT IN (SELECT vec_id FROM drops) AS keep
FROM assign v"""


# ---------------------------------------------------------------- incremental

#: broadcast gate for the existing-corpus key index; above it the semijoin
#: runs as a coarse-partitioned distributed merge (tests force 0)
INCR_BROADCAST_BOUND = 256 << 20
#: deterministic snapshot split: doc_id % INCR_MOD == 0 is the "new crawl"
INCR_MOD = 4


def _md5_u64_pairs(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """md5(text) per row as two big-endian uint64 halves (full 128-bit
    identity — no truncation-collision risk at 10^10 docs)."""
    buf = b"".join(hashlib.md5(s.encode()).digest() for s in texts)
    flat = np.frombuffer(buf, dtype=">u8").reshape(-1, 2)
    return flat[:, 0].astype(np.uint64), flat[:, 1].astype(np.uint64)


def dedup_incremental(sf_dir: str, mod: int = INCR_MOD):
    """Incremental (cross-corpus) exact dedup — the "dedup the new crawl
    snapshot against the existing corpus" stage of a continuously-updated
    training set: documents with ``doc_id % mod == 0`` are the NEW
    snapshot, the rest are the EXISTING corpus; each new doc is flagged
    with how many existing docs carry byte-identical text.

    Scale shape: the existing side never ships text — per-batch md5
    partials (16-byte keys + a count) reduce via one coarse ``ka % P``
    shuffle into a key→count index.  Below ``INCR_BROADCAST_BOUND`` the
    index broadcasts once (``ray.put`` of a SORTED structured uint64×2
    array + counts; probe = one vectorized ``searchsorted`` per batch —
    the FlatDictionary economics, ``/root/reference/src/patricia.c``
    mmap-once-share-everywhere).  Above the bound nothing lands on the
    driver: new-doc keys and the index co-partition on ``ka % P`` and
    merge per partition (the attach shape of the minhash verify leg).
    Both paths are asserted identical in tests by forcing the bound to 0.
    """
    import ray

    ds = _docs(sf_dir)
    np_ = _adaptive_nparts(sf_dir)

    def ex_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sel = np.nonzero(ids % mod != 0)[0]
        texts = t.column("text").take(pa.array(sel)).to_pylist()
        if not len(sel):
            return pa.table({"ka": pa.array([], pa.uint64()),
                             "kb": pa.array([], pa.uint64()),
                             "c": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        ka, kb = _md5_u64_pairs(texts)
        # in-batch combine before the shuffle
        g = (pa.table({"ka": ka, "kb": kb}).group_by(["ka", "kb"])
             .aggregate([([], "count_all")]))
        out = pa.table({"ka": g.column("ka"), "kb": g.column("kb"),
                        "c": pc.cast(g.column("count_all"), pa.int64())})
        part = (out.column("ka").to_numpy() % np.uint64(np_)).astype(np.int64)
        return out.append_column("part", pa.array(part))

    def part_sum(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["ka", "kb"], sort=False)["c"].sum().reset_index()
        return agg

    index = (ds.map_batches(ex_partial, batch_format="pyarrow")
             .groupby("part").map_groups(part_sum, batch_format="pandas")
             .materialize())

    def new_keys(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sel = np.nonzero(ids % mod == 0)[0]
        texts = t.column("text").take(pa.array(sel)).to_pylist()
        if not len(sel):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "ka": pa.array([], pa.uint64()),
                             "kb": pa.array([], pa.uint64())})
        ka, kb = _md5_u64_pairs(texts)
        return pa.table({"doc_id": pa.array(ids[sel], pa.int64()),
                         "ka": pa.array(ka), "kb": pa.array(kb)})

    new = ds.map_batches(new_keys, batch_format="pyarrow")
    _KDT = np.dtype([("a", ">u8"), ("b", ">u8")])

    if (index.size_bytes() or 0) <= INCR_BROADCAST_BOUND:
        from nativeextractor_ray.functions.blocks import arrow_blocks

        kas, kbs, cs = [], [], []
        for t in arrow_blocks(index, stream=False):
            kas.append(t.column("ka").to_numpy())
            kbs.append(t.column("kb").to_numpy())
            cs.append(t.column("c").to_numpy())
        if kas:
            keys = np.empty(sum(len(x) for x in kas), dtype=_KDT)
            keys["a"] = np.concatenate(kas)
            keys["b"] = np.concatenate(kbs)
            cnts = np.concatenate(cs).astype(np.int64)
            order = np.argsort(keys)
            keys, cnts = keys[order], cnts[order]
        else:
            keys, cnts = np.empty(0, dtype=_KDT), np.empty(0, np.int64)
        iref = ray.put((keys, cnts))

        def probe(t: pa.Table) -> pa.Table:
            ks, cn = ray.get(iref)
            q = np.empty(t.num_rows, dtype=_KDT)
            q["a"] = t.column("ka").to_numpy()
            q["b"] = t.column("kb").to_numpy()
            if len(ks) and t.num_rows:
                pos = np.clip(np.searchsorted(ks, q), 0, len(ks) - 1)
                hit = ks[pos] == q
                n_ex = np.where(hit, cn[pos], 0).astype(np.int64)
            else:
                n_ex = np.zeros(t.num_rows, np.int64)
            return pa.table({"doc_id": t.column("doc_id"),
                             "dup": pa.array((n_ex > 0).astype(np.int64)),
                             "n_existing": pa.array(n_ex)})

        return new.map_batches(probe, batch_format="pyarrow")

    # distributed semijoin: co-partition new keys and the index on ka % P
    def tag_new(t: pa.Table) -> pa.Table:
        ka = t.column("ka").to_numpy()
        return pa.table({
            "doc_id": t.column("doc_id"), "ka": t.column("ka"),
            "kb": t.column("kb"),
            "c": pa.nulls(t.num_rows, pa.int64()),
            "part": pa.array((ka % np.uint64(np_)).astype(np.int64)),
        })

    def tag_index(t: pa.Table) -> pa.Table:
        ka = t.column("ka").to_numpy()
        return pa.table({
            "doc_id": pa.nulls(t.num_rows, pa.int64()),
            "ka": t.column("ka"), "kb": t.column("kb"),
            "c": pc.cast(t.column("c"), pa.int64()),
            "part": pa.array((ka % np.uint64(np_)).astype(np.int64)),
        })

    both = new.map_batches(tag_new, batch_format="pyarrow").union(
        index.map_batches(tag_index, batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        isnew = df["doc_id"].notna()
        newp = df[isnew]
        exp = df[~isnew]
        m = newp.merge(exp[["ka", "kb", "c"]], on=["ka", "kb"], how="left",
                       suffixes=("", "_ex"))
        n_ex = m["c_ex"].fillna(0).astype(np.int64)
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype(np.int64),
            "dup": (n_ex > 0).astype(np.int64),
            "n_existing": n_ex,
        })

    return both.groupby("part").map_groups(attach, batch_format="pandas")


def dedup_incremental_sql(mod: int = INCR_MOD) -> str:
    return f"""WITH ex AS (
  SELECT md5(text) AS k, CAST(count(*) AS BIGINT) AS c
  FROM documents WHERE doc_id % {mod} <> 0 GROUP BY md5(text)
)
SELECT n.doc_id,
       CAST(CASE WHEN ex.c IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dup,
       CAST(coalesce(ex.c, 0) AS BIGINT) AS n_existing
FROM documents n LEFT JOIN ex ON md5(n.text) = ex.k
WHERE n.doc_id % {mod} = 0"""


# ----------------------------------------------- per-source dup rate


def dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate report — which crawl/feed is shipping
    copies: for every source, its doc count and how many of its docs
    duplicate an earlier doc (min ``doc_id`` per content key is the
    keep, everything else in the key's group is a dup, charged to ITS
    OWN source — cross-source copies count against the copier).

    Scale shape: per-batch (md5-key, source) partials — ``(key, source,
    n_docs, min_id)`` — reduce each batch before the ONLY shuffle (16-
    byte keys + a source tag, never text); per key-partition the global
    keep resolves vectorized and each (key, source) row emits its dup
    count; the final groupby sees ≤ sources × partitions rows.

    Output: ``(source, n_docs, n_dups)``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from nativeextractor_ray.functions.hashing import stable_part
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        key = [hashlib.md5(s.encode()).hexdigest()
               for s in t.column("text").to_pylist()]
        g = (pa.table({"key": pa.array(key, pa.string()),
                       "source": t.column("source"),
                       "doc_id": t.column("doc_id")})
             .group_by(["key", "source"])
             .aggregate([("doc_id", "count"), ("doc_id", "min")]))
        out = pa.table({
            "key": g.column("key"),
            "source": g.column("source"),
            "n_docs": pc.cast(g.column("doc_id_count"), pa.int64()),
            "min_id": pc.cast(g.column("doc_id_min"), pa.int64())})
        return out.append_column(
            "part", stable_part(out, ["key"], N_PARTS))

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd_

        keep = df.groupby("key", sort=False)["min_id"].transform("min")
        # every doc in the key group is a dup except the single keeper;
        # the keeper sits in the (key, source) row whose min_id == keep
        dups = df["n_docs"] - (df["min_id"] == keep).astype(np.int64)
        g = pd_.DataFrame({
            "source": df["source"],
            "n_docs": df["n_docs"],
            "n_dups": dups,
        }).groupby("source", sort=False).sum().reset_index()
        return g

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(resolve, batch_format="pandas")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_dups", alias_name="n_dups")))


DUP_RATE_BY_SOURCE_SQL = """WITH h AS (
  SELECT doc_id, source, md5(text) AS k FROM documents),
m AS (SELECT k, min(doc_id) AS keep FROM h GROUP BY k)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id <> keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dups
FROM h JOIN m USING (k) GROUP BY source"""


# ------------------------------------------- incremental minhash near-dup


INCR_MH_MOD = 10


def dedup_minhash_incremental(sf_dir: str, threshold: float = 0.5,
                              mod: int = INCR_MH_MOD, shingle_n: int = 3):
    """Near-dup flags for a NEW snapshot against the EXISTING corpus —
    the MinHash analogue of :func:`dedup_incremental` (exact) and the
    production "should this crawl batch even enter the corpus" gate:
    ``doc_id % mod == 0`` is the new snapshot; each new doc reports how
    many existing docs it near-duplicates (exact word-n-gram Jaccard ≥
    ``threshold`` among LSH candidates) and the best score.

    Scale shape: rides :func:`dedup_minhash_pairs` wholesale (LSH
    banding + size-gated exact verify — all its driver bounds and the
    documented P(miss) recall apply unchanged); the cross-pair filter
    and per-new-doc rollup are one streaming map + a doc-keyed groupby;
    the zero-match left-attach is the tagged-union co-partition (new-doc
    ids are 8 B rows — payloads never move).  Within-snapshot pairs are
    deliberately excluded (the snapshot dedups against itself via the
    ordinary :func:`dedup_minhash_pairs`).

    Output: ``(doc_id, n_matches, max_jaccard)`` for every new doc."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from nativeextractor_ray.functions.hashing import stable_part

    np_ = _adaptive_nparts(sf_dir)
    pairs = dedup_minhash_pairs(sf_dir, threshold, shingle_n)

    def cross(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        na, nb = a % mod == 0, b % mod == 0
        keep = na ^ nb
        new_id = np.where(na, a, b)[keep]
        j = t.column("jaccard").to_numpy()[keep]
        g = (pa.table({"doc_id": pa.array(new_id, pa.int64()),
                       "n_matches": pa.array(np.ones(len(new_id), np.int64)),
                       "max_jaccard": pa.array(j, pa.float64())})
             .group_by("doc_id")
             .aggregate([("n_matches", "sum"), ("max_jaccard", "max")]))
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_matches": g.column("n_matches_sum"),
            "max_jaccard": g.column("max_jaccard_max")})

    agg = (pairs.map_batches(cross, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("n_matches", alias_name="n_matches"),
                      Max("max_jaccard", alias_name="max_jaccard")))

    def new_ids(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        ids = ids[ids % mod == 0]
        out = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_matches": pa.array(np.zeros(len(ids), np.int64)),
            "max_jaccard": pa.array(np.zeros(len(ids)), pa.float64()),
            "is_doc": pa.array(np.ones(len(ids), bool)),
        })
        return out.append_column(
            "part", stable_part(out, ["doc_id"], np_))

    def tag_agg(t: pa.Table) -> pa.Table:
        out = pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_matches": t.column("n_matches"),
            "max_jaccard": t.column("max_jaccard"),
            "is_doc": pa.array(np.zeros(t.num_rows, bool)),
        })
        return out.append_column(
            "part", stable_part(out, ["doc_id"], np_))

    docs = _docs(sf_dir).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    both = (docs.map_batches(new_ids, batch_format="pyarrow")
            .union(agg.map_batches(tag_agg, batch_format="pyarrow")))

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        d = df[df["is_doc"]][["doc_id"]]
        m = df[~df["is_doc"]][["doc_id", "n_matches", "max_jaccard"]]
        out = d.merge(m, on="doc_id", how="left")
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "n_matches": out["n_matches"].fillna(0).to_numpy(np.int64),
            "max_jaccard": out["max_jaccard"].fillna(0.0)
            .to_numpy(np.float64)})

    return both.groupby("part").map_groups(resolve, batch_format="pandas")


def dedup_minhash_incremental_sql(threshold: float = 0.5,
                                  mod: int = INCR_MH_MOD,
                                  n: int = 3) -> str:
    """Quadratic exact replay restricted to cross (new, existing) pairs,
    LEFT-joined onto the full new-snapshot id list."""
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
nc AS (SELECT doc_id, count(*) AS c FROM tri GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
  WHERE (a.doc_id % {mod} = 0) <> (b.doc_id % {mod} = 0)
  GROUP BY 1, 2
),
hits AS (
  SELECT CASE WHEN co.doc_a % {mod} = 0 THEN co.doc_a ELSE co.doc_b END
           AS doc_id,
         round(common / (na.c + nb.c - common), 6) AS jaccard
  FROM co JOIN nc na ON na.doc_id = co.doc_a
          JOIN nc nb ON nb.doc_id = co.doc_b
  WHERE common / (na.c + nb.c - common) >= {threshold}
),
rollup AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         max(jaccard) AS max_jaccard
  FROM hits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(r.n_matches, 0) AS BIGINT) AS n_matches,
       COALESCE(r.max_jaccard, 0.0) AS max_jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} = 0) d
LEFT JOIN rollup r USING (doc_id)"""


# ------------------------------------------------ dup-cluster size audit


def dup_cluster_sizes(sf_dir: str, threshold: float = 0.5,
                      shingle_n: int = 3):
    """Near-dup cluster-size histogram: how many clusters have exactly
    ``s`` members — the dedup post-mortem that distinguishes a corpus of
    pairwise copies (sizes ≈ 2) from template farms (heavy tail), and
    sizes the keep-list savings before committing to a drop.

    Scale shape: rides :func:`dedup_clusters` (all its gates apply);
    per-batch (cluster_id, n) Arrow partials → one cluster-keyed
    groupby → count-of-counts folds the cluster axis away (the
    ``term_freq_histogram`` shape).  Singleton documents are excluded —
    the histogram reads over ACTUAL dup clusters (size ≥ 2).

    Output: ``(cluster_size, n_clusters)``."""
    from ray.data.aggregate import Sum

    clusters = dedup_clusters(sf_dir, threshold, shingle_n)

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["cluster_id"]).group_by("cluster_id")
             .aggregate([([], "count_all")]))
        return pa.table({
            "cluster_id": pc.cast(g.column("cluster_id"), pa.int64()),
            "n": pc.cast(g.column("count_all"), pa.int64())})

    sizes = (clusters.map_batches(partial, batch_format="pyarrow")
             .groupby("cluster_id").aggregate(Sum("n", alias_name="n")))

    def coc(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        keep = n >= 2
        g = (pa.table({"cluster_size": pa.array(n[keep], pa.int64())})
             .group_by("cluster_size").aggregate([([], "count_all")]))
        return pa.table({
            "cluster_size": g.column("cluster_size"),
            "n_clusters": pc.cast(g.column("count_all"), pa.int64())})

    # the count-of-counts partials are ≤ max-cluster-size rows per block
    # — fold them on the driver instead of a second AllToAll
    from nativeextractor_ray.functions.blocks import arrow_blocks

    acc: dict[int, int] = {}
    for t in arrow_blocks(sizes.map_batches(coc, batch_format="pyarrow"),
                          stream=False):
        for s, n in zip(t.column("cluster_size").to_pylist(),
                        t.column("n_clusters").to_pylist()):
            acc[int(s)] = acc.get(int(s), 0) + int(n)
    ks = sorted(acc)
    return pa.table({
        "cluster_size": pa.array(ks, pa.int64()),
        "n_clusters": pa.array([acc[k] for k in ks], pa.int64())})


def dup_cluster_sizes_sql(threshold: float = 0.5,
                          shingle_n: int = 3) -> str:
    return f"""WITH base AS ({dedup_clusters_sql(threshold, shingle_n)}),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
       FROM base GROUP BY cluster_id)
SELECT n AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sz WHERE n >= 2 GROUP BY n"""


#: doc→source broadcast bound for the cross-source matrix; tests force 0
#: to drive the co-partitioned double attach
SRC_MATRIX_BOUND = 64 << 20


def source_dedup_matrix(sf_dir: str, n: int = 3, threshold: float = 0.3):
    """Cross-source near-dup matrix: for every unordered source pair,
    how many exact-n-gram-Jaccard near-dup pairs straddle them — the
    "how much of crawl X is already inside crawl Y" audit that decides
    whether a new source is worth ingesting (diagonal cells =
    within-source duplication).

    Scale shape: pairs come from :func:`dedup_ngram_jaccard` (its gates
    apply; pair volume is dup-population-bounded).  Under the documents
    metadata bound the doc→source map broadcasts once (sorted ids +
    dictionary codes) and a streaming probe folds the ≤ sources² counts
    on the driver; above it the pairs attach each side's source through
    two doc-keyed co-partitions (the ssjoin join-back shape).  The
    source pair is canonicalized by NAME order on both engines.

    Output: ``(source_a, source_b, n_pairs)``."""
    import pyarrow.parquet as pq
    import ray

    from nativeextractor_ray.functions.blocks import arrow_blocks
    from nativeextractor_ray.functions.hashing import stable_part
    from nativeextractor_ray.pipelines.common import table_nrows
    from nativeextractor_ray.sources.tables import read_table

    pairs = dedup_ngram_jaccard(sf_dir, n, threshold)
    n_docs = table_nrows(sf_dir, "documents")

    def finish(acc: dict) -> pa.Table:
        ks = sorted(acc)
        return pa.table({
            "source_a": pa.array([k[0] for k in ks], pa.string()),
            "source_b": pa.array([k[1] for k in ks], pa.string()),
            "n_pairs": pa.array([acc[k] for k in ks], pa.int64())})

    if n_docs is not None and n_docs * 16 <= SRC_MATRIX_BOUND:
        dl = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
        ids = dl.column("doc_id").to_numpy()
        src = dl.column("source")
        sd = pc.dictionary_encode(
            src.combine_chunks() if isinstance(src, pa.ChunkedArray)
            else src)
        codes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = np.array(sd.dictionary.to_pylist())
        order = np.argsort(ids)
        side = ray.put((ids[order], codes[order], names))

        def probe(t: pa.Table) -> pa.Table:
            keys, code, names_ = ray.get(side)
            a = t.column("doc_a").to_numpy()
            b = t.column("doc_b").to_numpy()
            pa_ = np.clip(np.searchsorted(keys, a), 0,
                          max(0, len(keys) - 1))
            pb_ = np.clip(np.searchsorted(keys, b), 0,
                          max(0, len(keys) - 1))
            # canonicalize by NAME order via integer ranks (numpy '<U'
            # concat silently drops \x00 separators — never join names)
            name_order = np.argsort(names_)
            rank = np.empty(len(names_), np.int64)
            rank[name_order] = np.arange(len(names_))
            ra = rank[code[pa_]]
            rb = rank[code[pb_]]
            lo = np.minimum(ra, rb)
            hi = np.maximum(ra, rb)
            uniq, cnt = np.unique(lo * len(names_) + hi,
                                  return_counts=True)
            by_rank = names_[name_order]
            return pa.table({
                "source_a": pa.array(by_rank[uniq // len(names_)],
                                     pa.string()),
                "source_b": pa.array(by_rank[uniq % len(names_)],
                                     pa.string()),
                "n": pa.array(cnt.astype(np.int64))})

        acc: dict = {}
        for t in arrow_blocks(
                pairs.map_batches(probe, batch_format="pyarrow"),
                stream=False):
            for a_, b_, c_ in zip(t.column("source_a").to_pylist(),
                                  t.column("source_b").to_pylist(),
                                  t.column("n").to_pylist()):
                acc[(a_, b_)] = acc.get((a_, b_), 0) + int(c_)
        return finish(acc)

    # scale path: attach source for doc_a, then doc_b, via two doc-keyed
    # co-partitions (identical non-null columns on both union sides)
    docs_src = read_table(sf_dir, "documents", ["doc_id", "source"])

    def tag_src(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": pc.cast(t.column("doc_id"), pa.int64()),
            "other": pa.array(np.zeros(t.num_rows, np.int64)),
            "src": t.column("source"),
            "is_src": pa.array(np.ones(t.num_rows, bool))})
        return out.append_column("part", stable_part(out, ["k"], 64))

    def tag_pair_a(t: pa.Table) -> pa.Table:
        out = pa.table({
            "k": pc.cast(t.column("doc_a"), pa.int64()),
            "other": pc.cast(t.column("doc_b"), pa.int64()),
            "src": pa.array([""] * t.num_rows, pa.string()),
            "is_src": pa.array(np.zeros(t.num_rows, bool))})
        return out.append_column("part", stable_part(out, ["k"], 64))

    def attach(df):
        import pandas as pd

        s = df[df["is_src"]][["k", "src"]]
        p = df[~df["is_src"]][["k", "other"]]
        m = p.merge(s, on="k", how="inner")
        return pd.DataFrame({
            "k": m["other"].to_numpy(np.int64),     # re-key on doc_b
            "other": m["k"].to_numpy(np.int64),
            "src": m["src"].to_numpy(object),       # src of doc_a rides
            "is_src": np.zeros(len(m), bool)})

    def add_part2(t: pa.Table) -> pa.Table:
        return t.append_column("part", stable_part(t, ["k"], 64))

    with_a = (docs_src.map_batches(tag_src, batch_format="pyarrow")
              .union(pairs.map_batches(tag_pair_a,
                                       batch_format="pyarrow"))
              .groupby("part").map_groups(attach, batch_format="pandas"))

    def resolve(df):
        import pandas as pd

        s = df[df["is_src"]][["k", "src"]].rename(columns={"src": "sb"})
        p = df[~df["is_src"]][["k", "src"]].rename(columns={"src": "sa"})
        m = p.merge(s, on="k", how="inner")
        sa_ = m["sa"].to_numpy(object)
        sb_ = m["sb"].to_numpy(object)
        swap = sb_ < sa_
        lo = np.where(swap, sb_, sa_)
        hi = np.where(swap, sa_, sb_)
        g = (pd.DataFrame({"source_a": lo, "source_b": hi})
             .groupby(["source_a", "source_b"], sort=False).size()
             .reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    acc2: dict = {}
    for t in arrow_blocks(
            docs_src.map_batches(tag_src, batch_format="pyarrow")
            .union(with_a.map_batches(add_part2, batch_format="pyarrow"))
            .groupby("part").map_groups(resolve, batch_format="pandas"),
            stream=False):
        for a_, b_, c_ in zip(t.column("source_a").to_pylist(),
                              t.column("source_b").to_pylist(),
                              t.column("n").to_pylist()):
            acc2[(a_, b_)] = acc2.get((a_, b_), 0) + int(c_)
    return finish(acc2)


def source_dedup_matrix_sql(n: int = 3, threshold: float = 0.3) -> str:
    return f"""WITH p AS ({ngram_jaccard_sql(n, threshold)}),
m AS (
  SELECT least(d1.source, d2.source) AS source_a,
         greatest(d1.source, d2.source) AS source_b
  FROM p
  JOIN documents d1 ON d1.doc_id = p.doc_a
  JOIN documents d2 ON d2.doc_id = p.doc_b)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM m GROUP BY 1, 2"""
