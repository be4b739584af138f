"""Exact set-similarity self-join with prefix filtering over ``documents``
— the all-pairs Jaccard join of Vernica/Carey/Li (SIGMOD'10) / PPJoin
(Xiao et al., WWW'08), re-expressed Ray-Data-first.

This is the EXACT counterpart of the approximate ``dedup_minhash`` family:
every pair of documents whose distinct word-BIGRAM sets have Jaccard ≥ τ
is reported, with no probability of a miss — the operator a curation
pipeline uses when the dup decision must be auditable (legal takedowns,
eval decontamination) rather than statistical.

Scale shape
-----------
1. **Gram sets** — one streaming ``map_batches`` derives each doc's sorted
   distinct bigram-hash set (a list column).  A doc never spans batches,
   so per-doc sets are exact with zero shuffle.
2. **Global rarity order** — gram document-frequencies come from per-batch
   partials + one vocabulary-sized ``groupby(gram).sum``.  The df table is
   collected and broadcast (``ray.put`` once) ONLY under
   ``DF_BROADCAST_BOUND``; above it the operator falls back to raw-hash
   order, which needs NO global state at all.  Correctness is identical on
   both paths (any fixed total order of the token universe satisfies the
   prefix-filter theorem — df order is purely a bucket-size optimization),
   asserted bit-identical in ``tests/test_round4e_ops.py``.
3. **Prefix fan-out** — a doc with set size ``s`` emits only its
   ``p = s - ceil(τ·s) + 1`` RAREST grams (the prefix-filter theorem: two
   sets with J ≥ τ must share a token inside these prefixes), each row
   carrying the doc's full rank array.  Fan-out is ≤ p ≈ (1-τ)·s + 1 per
   doc, and the partition key is the gram rank — rank 0 is the RAREST
   gram, so the hot-key problem of stopword buckets is structurally
   removed (the frequent grams never appear in short prefixes).
4. **In-bucket verify** — one ``groupby(part).map_groups`` co-partitions
   equal grams; candidate pairs pass the length filter
   (``num·(sa+sb) ≤ (num+den)·min(sa,sb)``), are verified with an exact
   sorted-array intersection, and are emitted ONLY at the pair's smallest
   common prefix gram — the standard dedup rule that makes the output
   globally distinct WITHOUT a second pair-level shuffle.

Everything is integer end-to-end: the τ = num/den predicate is
``(den+num)·inter ≥ num·(sa+sb)`` and the reported similarity is the exact
half-up micro ratio ``(2·inter·10⁶ + union) // (2·union)`` — no float on
either engine, so the quadratic DuckDB oracle matches bit-for-bit.

Reference anchor: the reference scans one stream with compiled miners and
never joins documents (`/root/reference/src/extractor.c`); this operator is
part of the prompt-mandated training-data dedup family layered on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: τ = TAU_NUM / TAU_DEN (exact rational, never a float)
TAU_NUM = 1
TAU_DEN = 2

#: word n-gram order for the set universe.  Unigrams are degenerate on the
#: synthetic corpus (31-word vocabulary → dense sets); bigrams give a
#: 900+-gram universe with max df ≪ corpus.  The existing approximate
#: family (dedup_minhash / dedup_ngram_jaccard) uses 3-grams, so the two
#: operators stay distinguishable in the registry.
GRAM_N = 2

#: coarse verify partitions (matches dedup.py's conventions)
N_PARTS = 64

#: df-table broadcast bound — above this the hash-order fallback runs
DF_BROADCAST_BOUND = 256 << 20

_MASK = 0x7FFFFFFFFFFFFFFF


def _doc_gram_sets(sf_dir: str):
    """Dataset of ``(doc_id, grams: list<int64> sorted distinct, s)`` —
    one exact streaming pass, no shuffle."""
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def per_batch(t: pa.Table) -> pa.Table:
        from nativeextractor_ray.functions.hashing import GOLDEN, h64_many

        toks = pc.split_pattern(t.column("text"), " ")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        # adjacent-word bigrams within a doc (post empty-filter adjacency,
        # matching the SQL list_filter-then-slide).  Hash discipline:
        # md5 runs once per DISTINCT WORD (Zipf: vocab ≪ tokens); bigram
        # ids mix the two word hashes with the golden multiply-xor chain
        # — the gram id never leaves the operator, so no SQL replay is
        # needed (the oracle joins on the strings themselves)
        if len(parent) >= GRAM_N:
            wdict = pc.dictionary_encode(flat)
            codes = wdict.indices.to_numpy(zero_copy_only=False)
            wh = h64_many(wdict.dictionary.to_pylist()).astype(np.uint64)
            th = wh[codes]
            same = parent[GRAM_N - 1:] == parent[:-(GRAM_N - 1)]
            mix = (th[:-(GRAM_N - 1)] * GOLDEN) ^ th[GRAM_N - 1:]
            mix = (mix * GOLDEN) >> np.uint64(1)  # clears the sign bit
            gdoc = parent[:-(GRAM_N - 1)][same]
            gh = mix[same].astype(np.int64)
        else:
            gdoc = np.empty(0, np.int64)
            gh = np.empty(0, np.int64)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        # distinct (doc, gram) + per-doc sorted gram arrays, vectorized:
        # lexsort by (doc, gram), mask dup runs, then split on doc bounds
        order = np.lexsort((gh, gdoc))
        gdoc, gh = gdoc[order], gh[order]
        if len(gdoc):
            first = np.empty(len(gdoc), bool)
            first[0] = True
            first[1:] = (gdoc[1:] != gdoc[:-1]) | (gh[1:] != gh[:-1])
            gdoc, gh = gdoc[first], gh[first]
        # docs with < GRAM_N words simply have empty sets → excluded
        uniq, starts, counts = np.unique(
            gdoc, return_index=True, return_counts=True)
        offsets = np.zeros(len(uniq) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(gh))
        return pa.table({
            "doc_id": pa.array(doc_ids[uniq]),
            "grams": lists,
            "s": pa.array(counts.astype(np.int64))})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def _df_rank(sets_ds):
    """Vocabulary df table → (sorted gram-hash array, rank array) or
    ``None`` when the fallback (hash order) should run."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t.column("grams"))
        g = pa.table({"gram": flat}).group_by("gram").aggregate(
            [("gram", "count")])
        return pa.table({"gram": g.column("gram"),
                         "df": pc.cast(g.column("gram_count"), pa.int64())})

    df_tbl = (sets_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("gram").aggregate(Sum("df", alias_name="df")))
    if df_tbl.size_bytes() is not None and df_tbl.size_bytes() > DF_BROADCAST_BOUND:
        return None
    t = pa.concat_tables(
        [pa.Table.from_pandas(b) if isinstance(b, pd.DataFrame) else b
         for b in ray.get(df_tbl.to_arrow_refs())],
        promote_options="default")
    gram = t.column("gram").to_numpy()
    df = t.column("df").to_numpy()
    order = np.argsort(gram, kind="stable")
    gram, df = gram[order], df[order]
    # rank by (df asc, gram asc): rarest gram = rank 0
    rank_order = np.lexsort((gram, df))
    rank = np.empty(len(gram), np.int64)
    rank[rank_order] = np.arange(len(gram), dtype=np.int64)
    return gram, rank


def ssjoin_jaccard(sf_dir: str, use_df_order: bool = True):
    """All document pairs with distinct-bigram-set Jaccard ≥ τ:
    ``(doc_a, doc_b, inter, un, jacc_micro)``, ``doc_a < doc_b``."""
    import ray

    # materialized once: both the df pass and the prefix pass scan it,
    # and the gram-set derivation (tokenize + hash) is the expensive leg
    sets_ds = _doc_gram_sets(sf_dir).materialize()
    rank_map = _df_rank(sets_ds) if use_df_order else None
    rank_ref = ray.put(rank_map)

    num, den = TAU_NUM, TAU_DEN

    def emit_prefix(t: pa.Table) -> pa.Table:
        rm = ray.get(rank_ref)
        grams = t.column("grams")
        offs = grams.combine_chunks().offsets.to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # rebase: sliced arrays keep raw offsets
        flat = pc.list_flatten(grams).to_numpy()
        if rm is not None:
            gsort, rnk = rm
            flat = rnk[np.searchsorted(gsort, flat)]
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = (offs[1:] - offs[:-1])
        nz = s > 0
        if not nz.any():
            return pa.table({"tok": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "ranks": pa.array([], pa.list_(pa.int64())),
                             "part": pa.array([], pa.int64())})
        # in-doc rank sort, vectorized across the whole batch: one
        # lexsort on (rank, doc-segment) orders every doc's grams
        seg = np.repeat(np.arange(len(doc)), s)
        order = np.lexsort((flat, seg))
        flat = flat[order]
        # p = s - ceil(τ·s) + 1 per doc
        p = s - ((s * num + den - 1) // den) + 1
        p[~nz] = 0
        # prefix mask over the sorted flat array
        pos_in_doc = np.arange(len(flat)) - np.repeat(offs[:-1], s)
        pref_mask = pos_in_doc < np.repeat(p, s)
        tok = flat[pref_mask]
        docr = np.repeat(doc, p)
        sr = np.repeat(s, p)
        # every prefix row carries its doc's FULL sorted rank array:
        # values = doc i's slice tiled p_i times (list-of-arrays concat —
        # no per-row Python lists, one ListArray build)
        tiles = [flat[offs[i]:offs[i + 1]]
                 for i in range(len(doc)) for _ in range(int(p[i]))]
        if tiles:
            values = np.concatenate(tiles)
            lens = np.fromiter((len(a) for a in tiles), np.int64,
                               count=len(tiles))
        else:
            values = np.empty(0, np.int64)
            lens = np.empty(0, np.int64)
        loffs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=loffs[1:])
        ranks_col = pa.ListArray.from_arrays(
            pa.array(loffs, pa.int32()), pa.array(values))
        return pa.table({"tok": pa.array(tok),
                         "doc_id": pa.array(docr),
                         "s": pa.array(sr),
                         "ranks": ranks_col,
                         "part": pa.array(tok % N_PARTS)})

    _POP = np.array([bin(x).count("1") for x in range(256)],
                    dtype=np.uint8)

    def _popcount_rows(a: np.ndarray) -> np.ndarray:
        return _POP[a.view(np.uint8)].reshape(len(a), -1).sum(
            axis=1).astype(np.int64)

    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "inter": pd.Series([], dtype=np.int64),
                          "un": pd.Series([], dtype=np.int64),
                          "jacc_micro": pd.Series([], dtype=np.int64)})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized in-partition verify.  Every doc's gram set becomes
        a BITSET over partition-local dense gram ids; candidate pairs
        (docs sharing a prefix gram here) resolve with popcounted ANDs —
        no per-pair Python, no intersect1d.  A pair is emitted only in
        the partition OWNING its smallest common prefix gram
        (r0 % N_PARTS == this partition), which dedups globally without
        a second shuffle."""
        if df.empty:
            return empty
        # unique docs in this partition
        docs_all = df["doc_id"].to_numpy()
        uniq_docs, first_idx, doc_code = np.unique(
            docs_all, return_index=True, return_inverse=True)
        m = len(uniq_docs)
        sizes = df["s"].to_numpy()[first_idx].astype(np.int64)
        arrs = df["ranks"].to_numpy()[first_idx]
        # partition-local dense gram ids (works on both rank orders)
        all_grams = np.concatenate(
            [np.asarray(a, np.int64) for a in arrs])
        vocab = np.unique(all_grams)
        W = (len(vocab) + 63) // 64
        full_bs = np.zeros((m, W), np.uint64)
        pref_bs = np.zeros((m, W), np.uint64)
        prefs = sizes - ((sizes * num + den - 1) // den) + 1
        lens = np.fromiter((len(np.asarray(a)) for a in arrs), np.int64,
                           count=m)
        flat_local = np.searchsorted(vocab, all_grams)
        row_of = np.repeat(np.arange(m), lens)
        pos = np.concatenate([np.arange(l) for l in lens]) if m else \
            np.empty(0, np.int64)
        w_idx, b_idx = flat_local >> 6, flat_local & 63
        np.bitwise_or.at(full_bs, (row_of, w_idx),
                         np.uint64(1) << b_idx.astype(np.uint64))
        pm = pos < prefs[row_of]
        np.bitwise_or.at(pref_bs, (row_of[pm], w_idx[pm]),
                         np.uint64(1) << b_idx[pm].astype(np.uint64))
        # candidate pairs: docs sharing a token group (indices are cheap
        # numpy per group; the heavy math below is fully vectorized)
        tok_codes, tok_first = pd.factorize(df["tok"].to_numpy())[0], None
        order = np.argsort(tok_codes, kind="stable")
        sorted_docs = doc_code[order]
        grp_sizes = np.bincount(tok_codes)
        pi, pj = [], []
        start = 0
        for g in grp_sizes:
            if g >= 2:
                members = np.unique(sorted_docs[start:start + g])
                if len(members) >= 2:
                    ii, jj = np.triu_indices(len(members), k=1)
                    pi.append(members[ii])
                    pj.append(members[jj])
            start += g
        if not pi:
            return empty
        pi = np.concatenate(pi)
        pj = np.concatenate(pj)
        packed = np.unique(pi.astype(np.int64) * m + pj)
        pi, pj = packed // m, packed % m
        # length filter
        sa, sb = sizes[pi], sizes[pj]
        ok = num * (sa + sb) <= (num + den) * np.minimum(sa, sb)
        pi, pj, sa, sb = pi[ok], pj[ok], sa[ok], sb[ok]
        if not len(pi):
            return empty
        # exact intersection via popcounted AND
        inter = _popcount_rows(full_bs[pi] & full_bs[pj])
        ok = (den + num) * inter >= num * (sa + sb)
        pi, pj, sa, sb, inter = pi[ok], pj[ok], sa[ok], sb[ok], inter[ok]
        if not len(pi):
            return empty
        # smallest common PREFIX gram r0 → canonical owner partition
        pand = pref_bs[pi] & pref_bs[pj]
        nz = pand != 0
        first_w = np.argmax(nz, axis=1)
        any_common = nz.any(axis=1)
        words = pand[np.arange(len(pi)), first_w]
        # lowest set bit index of each word
        low = (words & (~words + np.uint64(1)))
        bit = np.zeros(len(low), np.int64)
        lowv = low.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = lowv >= (np.uint64(1) << np.uint64(shift))
            bit[big] += shift
            lowv[big] >>= np.uint64(shift)
        r0_local = first_w.astype(np.int64) * 64 + bit
        r0 = vocab[np.minimum(r0_local, len(vocab) - 1)]
        pid = int(df["part"].iloc[0])
        keep = any_common & (r0 % N_PARTS == pid)
        pi, pj, sa, sb, inter = (pi[keep], pj[keep], sa[keep], sb[keep],
                                 inter[keep])
        if not len(pi):
            return empty
        un = sa + sb - inter
        da, db = uniq_docs[pi], uniq_docs[pj]
        lo, hi = np.minimum(da, db), np.maximum(da, db)
        return pd.DataFrame({
            "doc_a": lo.astype(np.int64),
            "doc_b": hi.astype(np.int64),
            "inter": inter,
            "un": un,
            "jacc_micro": (2 * inter * 1_000_000 + un) // (2 * un)})

    return (sets_ds.map_batches(emit_prefix, batch_format="pyarrow")
            .groupby("part")
            .map_groups(verify, batch_format="pandas"))


def ssjoin_jaccard_sql() -> str:
    """Quadratic exact oracle: every shared-gram pair, exact integer
    Jaccard predicate — feasible at oracle scale, never run at corpus
    scale."""
    return f"""WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct([ws[i] || ' ' || ws[i+1]
                               for i in range(1, len(ws))])) AS t
  FROM w),
sizes AS (SELECT doc_id, count(*) AS s FROM g GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM g a JOIN g b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT doc_a, doc_b, i, sa.s + sb.s - i AS un
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE ({TAU_DEN} + {TAU_NUM}) * i >= {TAU_NUM} * (sa.s + sb.s))
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter, CAST(un AS BIGINT) AS un,
       CAST((2 * i * 1000000 + un) // (2 * un) AS BIGINT) AS jacc_micro
FROM j"""
