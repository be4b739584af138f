"""Training-data operators: planted-fixture tests for the rows-only
(LSH / approximate) paths and plumbing tests for the multimodal stages.

The oracle-checkable ops (exact dedup, n-gram Jaccard, embedding cosine,
brute-force ANN, textstats) are covered by test_oracle_parity.py; here we
cover what SQL can't: MinHash/SimHash recall on planted near-dups, LSH ANN
candidate quality, winnowing invariants, and the binary-column pipeline.
"""

import numpy as np
import pyarrow as pa
import pytest


def _doc_table(texts):
    return pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
         "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _salad(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def planted(ray_session):
    """Docs 0/1 near-identical (2 of 60 words changed), 2 a copy of 0,
    3..9 unrelated salads."""
    import random

    rng = random.Random(7)
    base = _salad(rng)
    toks = base.split()
    toks[10], toks[40] = "zulu", "yankee"
    near = " ".join(toks)
    texts = [base, near, base] + [_salad(rng) for _ in range(7)]
    return _doc_table(texts)


def _rows(ds):
    return ds.take_all()


def test_minhash_finds_planted_pairs(planted, ray_session):
    import ray.data

    from nativeextractor_ray.pipelines.dedup import minhash_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
             for r in _rows(minhash_pairs(ray.data.from_arrow(planted), threshold=0.5))}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0        # exact copy
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5        # near dup
    assert (1, 2) in pairs
    # unrelated docs don't pair at this threshold
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)


def test_simhash_finds_planted_pairs(planted, ray_session):
    import ray.data

    from nativeextractor_ray.pipelines.dedup import simhash_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in _rows(simhash_pairs(ray.data.from_arrow(planted), max_hamming=3))}
    assert pairs[(0, 2)] == 0
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)


def test_minhash_signature_estimates_jaccard():
    from nativeextractor_ray.functions.hashing import (
        h64_many, minhash_perms, minhash_signature, word_shingles,
    )

    perms = minhash_perms()
    a = set(word_shingles(" ".join(WORDS * 3), 3))
    b_toks = (WORDS * 3)[:]
    b_toks[5] = "zulu"
    b = set(word_shingles(" ".join(b_toks), 3))
    true_j = len(a & b) / len(a | b)
    sa = minhash_signature(h64_many(sorted(a)), perms)
    sb = minhash_signature(h64_many(sorted(b)), perms)
    est = float((sa == sb).mean())
    assert abs(est - true_j) < 0.25  # 64 hashes → ±~0.12 stddev


def test_winnow_invariants():
    from nativeextractor_ray.functions.hashing import rolling_hashes, winnow

    text = "the quick brown fox jumps over the lazy dog " * 5
    h = rolling_hashes(text, 8)
    fp = winnow(h, 16)
    assert fp.size > 0
    assert set(fp.tolist()) <= set(h.tolist())
    # identical text → identical fingerprints (determinism across calls)
    assert np.array_equal(fp, winnow(rolling_hashes(text, 8), 16))
    # a local edit changes few fingerprints
    edited = text.replace("fox", "cat", 1)
    fp2 = winnow(rolling_hashes(edited, 8), 16)
    inter = len(set(fp.tolist()) & set(fp2.tolist()))
    assert inter / max(len(set(fp.tolist())), 1) > 0.5


def test_rolling_hash_matches_direct():
    from nativeextractor_ray.functions.hashing import rolling_hashes

    text = "abcdefghij"
    k, base, mod = 4, 257, (1 << 61) - 1
    h = rolling_hashes(text, k, base, mod)
    for i in range(len(text) - k + 1):
        direct = 0
        for c in text[i : i + k].encode():
            direct = (direct * base + c) % mod
        assert int(h[i]) == direct, i


def test_ann_lsh_is_subset_quality(sf_dir, ray_session):
    """LSH candidates rerank exactly → every reported neighbor's score
    equals the brute-force score for that (query, vec) pair."""
    from nativeextractor_ray.pipelines.similarity import ann_cosine_topk, ann_lsh_topk

    brute = {(r["query_id"], r["vec_id"]): r["score"] for r in _rows(ann_cosine_topk(sf_dir))}
    lsh = _rows(ann_lsh_topk(sf_dir))
    assert lsh, "LSH ANN returned nothing"
    for r in lsh:
        key = (r["query_id"], r["vec_id"])
        if key in brute:
            assert r["score"] == brute[key]
    # every query's own vector lands in its own bucket → rank-1 self hit
    self_hits = {r["query_id"] for r in lsh if r["vec_id"] == r["query_id"] and r["rank"] == 1}
    assert len(self_hits) == 10


def test_multimodal_roundtrip(sf_dir, ray_session):
    from nativeextractor_ray.pipelines.multimodal import (
        MediaDecoder, fake_media_dataset, multimodal_features,
    )

    feats = {r["doc_id"]: r for r in _rows(multimodal_features(sf_dir))}
    assert len(feats) == 500
    r0 = feats[0]
    assert r0["width"] == 32 and r0["height"] == 32
    r7 = feats[7]
    assert r7["width"] == 39 and r7["height"] == 32 + 49
    # payload column is real binary
    b = fake_media_dataset(sf_dir).take(1)[0]["payload"]
    assert bytes(b[:4]) == b"IMG0"
    # real codecs are an explicit stub
    with pytest.raises(NotImplementedError):
        MediaDecoder(codec="pil")


def test_frame_sample(sf_dir, ray_session):
    from nativeextractor_ray.pipelines.multimodal import frame_sample_features

    rows = _rows(frame_sample_features(sf_dir))
    assert len(rows) == 500
    assert all(r["n_frames"] >= 1 and 0 <= r["mean_byte"] <= 255 for r in rows)


def test_ann_ivf_recall(sf_dir, ray_session):
    """IVF with nprobe=4/16 must keep high recall vs brute force on this
    data, and every reported score must be exact (rerank is exact)."""
    from nativeextractor_ray.pipelines.similarity import ann_cosine_topk, ann_ivf_topk

    brute = {(r["query_id"], r["vec_id"]): r["score"] for r in _rows(ann_cosine_topk(sf_dir))}
    ivf = _rows(ann_ivf_topk(sf_dir))
    assert ivf
    hits = sum(1 for r in ivf if (r["query_id"], r["vec_id"]) in brute)
    assert hits / len(brute) >= 0.5, f"recall {hits}/{len(brute)}"
    for r in ivf:
        key = (r["query_id"], r["vec_id"])
        if key in brute:
            assert r["score"] == brute[key]
    # self-vector lands in its own (probed) centroid bucket → rank-1 hit
    self_hits = {r["query_id"] for r in ivf if r["vec_id"] == r["query_id"] and r["rank"] == 1}
    assert len(self_hits) == 10


def test_ann_ivf_oracle_margins(sf_dir):
    """Float-safety contract of ann_ivf_sql: every bucket decision the SQL
    oracle replays (vector→centroid assignment, query probe set) must have
    a margin many orders of magnitude above DuckDB-vs-numpy float64 error
    (~4e-16), so the literal-embedded-centroid oracle cannot flake."""
    import numpy as np
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.similarity import (
        N_PROBE, _load_queries, _train_centroids, _train_sample,
    )

    cent = _train_centroids(_train_sample(sf_dir))
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
    srt = np.sort(bm @ cent.T, axis=1)
    assert (srt[:, -1] - srt[:, -2]).min() > 1e-8

    _, qmat = _load_queries(sf_dir)
    qs = np.sort(qmat @ cent.T, axis=1)
    assert (qs[:, -N_PROBE] - qs[:, -(N_PROBE + 1)]).min() > 1e-8


def test_connected_components_ds_matches_unionfind(ray_session):
    """Distributed min-label propagation == driver union-find on a graph
    with several components, a chain (propagation depth), and a cycle."""
    import ray.data

    from nativeextractor_ray.functions.unionfind import UnionFind, connected_components_ds

    edges = [("b", "a"), ("c", "b"), ("d", "c"),       # chain -> comp 'a'
             ("x", "y"), ("y", "z"), ("z", "x"),       # cycle -> comp 'x'
             ("m", "n")]                               # pair  -> comp 'm'
    t = pa.table({"a": pa.array([e[0] for e in edges]),
                  "b": pa.array([e[1] for e in edges])})
    got = {r["node"]: r["component"]
           for r in connected_components_ds(ray.data.from_arrow(t)).take_all()}
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = {m: min(ms) for _, ms in uf.components().items() for m in ms}
    assert got == want


def test_connected_components_ds_scale(ray_session):
    """10^6-edge synthetic graph (VERDICT r1 item 2's done-criterion):
    random clusters + a 512-node chain, verified against the exact
    driver UnionFind — and the distributed path never materializes the
    label table on the driver (join-free coarse-partition rounds)."""
    import numpy as np
    import ray.data

    from nativeextractor_ray.functions.unionfind import UnionFind, connected_components_ds

    rng = np.random.default_rng(11)
    n_clusters, per = 4000, 245
    a_parts, b_parts = [], []
    for c in range(n_clusters):
        src = rng.integers(0, 40, size=per)
        dst = rng.integers(0, 40, size=per)
        a_parts.append(np.char.add(f"c{c:04d}_", src.astype(str)))
        b_parts.append(np.char.add(f"c{c:04d}_", dst.astype(str)))
    chain_a = np.array([f"x{i:04d}" for i in range(511)])
    chain_b = np.array([f"x{i+1:04d}" for i in range(511)])
    a = np.concatenate(a_parts + [chain_a])
    b = np.concatenate(b_parts + [chain_b])
    assert len(a) >= 980_000

    edges = ray.data.from_arrow(pa.table({"a": a.tolist(), "b": b.tolist()}))
    got = {r["node"]: r["component"]
           for r in connected_components_ds(edges).take_all()}

    uf = UnionFind()
    for x, y in zip(a.tolist(), b.tolist()):
        uf.union(x, y)
    want = {m: min(ms) for _, ms in uf.components().items() for m in ms}
    assert got == want


def test_dedup_clusters_transitive_closure(sf_dir, ray_session):
    """Cluster resolution must equal the exact union-find transitive
    closure of the verified pair set: a~b, b~c puts all three in one
    cluster with the min doc_id as representative, and keep marks exactly
    the representatives."""
    from nativeextractor_ray.functions.unionfind import UnionFind
    from nativeextractor_ray.pipelines.dedup import (
        dedup_clusters, dedup_minhash_pairs,
    )

    pairs = [(r["doc_a"], r["doc_b"])
             for r in dedup_minhash_pairs(sf_dir).take_all()]
    assert pairs  # the corpus must exercise clustering
    uf = UnionFind()
    for a, b in pairs:
        uf.union(str(a), str(b))
    # representative per component = min member id
    comp_members: dict[str, list[int]] = {}
    for a, b in pairs:
        for n in (a, b):
            comp_members.setdefault(uf.find(str(n)), []).append(n)
    rep = {n: min(m) for root, m in comp_members.items() for n in m}

    got = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in dedup_clusters(sf_dir).take_all()}
    n_nontrivial = 0
    for doc_id, (cluster, keep) in got.items():
        want = rep.get(doc_id, doc_id)
        assert cluster == want, (doc_id, cluster, want)
        assert keep == (doc_id == cluster)
        n_nontrivial += doc_id != cluster
    assert n_nontrivial > 0


def test_asof_join_semantics_planted(ray_session):
    """Backward as-of contract on a planted fixture: exact-ts matches
    attach, ties on ts break to the largest right id, earlier-only rows
    attach the latest prior, no-prior rows stay null — and int columns
    stay int across partitions that do/don't have unmatched rows."""
    import pandas as pd
    import ray.data

    from nativeextractor_ray.pipelines.relational import asof_join

    left = pa.table({
        "k": ["u1", "u1", "u1", "u2", "u3"],
        "t": [10, 20, 5, 7, 9],
        "lid": [1, 2, 3, 4, 5],
    })
    right = pa.table({
        "k": ["u1", "u1", "u1", "u2", "u9"],
        "t": [10, 10, 15, 99, 1],
        "rid": [100, 101, 102, 103, 104],
    })
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="k", on="t", right_keep=["rid"],
    ).to_pandas().sort_values("lid")
    got = {int(r.lid): (None if pd.isna(r.rid_r) else int(r.rid_r))
           for r in out.itertuples()}
    assert got == {
        1: 101,   # exact ts tie: max rid among t=10
        2: 102,   # latest at-or-before 20 is t=15
        3: None,  # nothing at-or-before 5
        4: None,  # u2's only click is later
        5: None,  # u3 has no right rows at all
    }


def test_exact_quantiles_adversarial(ray_session):
    """Histogram refinement must stay exact under heavy ties, extreme
    outliers, and tiny-sliver convergence — checked against numpy on a
    planted distribution that exercises all three."""
    import ray.data

    from nativeextractor_ray.pipelines.quantiles import _exact_quantiles

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        np.full(5000, 7.25),                  # heavy tie at one point
        rng.normal(0, 1, 3000),               # continuum
        np.full(1000, 7.25 + 1e-12),          # tie a float-ulp away
        np.array([1e18, -1e18]),              # extreme outliers
        rng.integers(0, 5, 1000).astype(float),
    ])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})
                             ).repartition(8)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    got = _exact_quantiles(ds, "v", qs)
    s = np.sort(vals)
    for q in qs:
        k = max(1, int(np.ceil(q * len(s))))
        assert got[("", q)] == s[k - 1], (q, got[("", q)], s[k - 1])


def test_asof_join_randomized_vs_bruteforce(ray_session):
    """Seeded-random as-of joins vs an O(n^2) brute-force reference —
    aggressive tie density (times drawn from 0..12) exercises the
    exact-match and tie-break paths the planted fixture can't cover."""
    import random

    import pandas as pd
    import ray.data

    from nativeextractor_ray.pipelines.relational import asof_join

    rng = random.Random(11)
    for trial in range(6):
        keys = ["a", "b", "c"]
        nl, nr = rng.randint(1, 25), rng.randint(0, 25)
        left = pa.table({
            "k": [rng.choice(keys) for _ in range(nl)],
            "t": [rng.randint(0, 12) for _ in range(nl)],
            "lid": list(range(nl)),
        })
        right = pa.table({
            "k": [rng.choice(keys) for _ in range(nr)],
            "t": [rng.randint(0, 12) for _ in range(nr)],
            "rid": list(range(100, 100 + nr)),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            by="k", on="t", right_keep=["rid"],
        ).to_pandas()
        got = {int(r.lid): (None if pd.isna(r.rid_r) else int(r.rid_r))
               for r in out.itertuples()}
        rr = right.to_pylist()
        for l in left.to_pylist():
            cand = [r for r in rr if r["k"] == l["k"] and r["t"] <= l["t"]]
            want = max(cand, key=lambda r: (r["t"], r["rid"]))["rid"] if cand else None
            assert got[l["lid"]] == want, (trial, l, got[l["lid"]], want)


def test_range_join_randomized_vs_bruteforce(ray_session):
    """Seeded-random windowed prior-activity vs an O(n^2) reference —
    dense integer timestamps force window-boundary and same-instant
    collisions across users."""
    import random

    import pandas as pd
    import ray.data

    from nativeextractor_ray.pipelines.events import errors_prior_window
    from nativeextractor_ray.sources import tables as tables_mod

    rng = random.Random(23)
    n = 400
    base = pd.Timestamp("2024-03-01")
    rows = {
        "event_id": list(range(n)),
        "ts": [base + pd.Timedelta(hours=rng.randint(0, 200)) for _ in range(n)],
        "user_id": [rng.randint(1, 8) for _ in range(n)],
        "event_type": [rng.choice(["error", "click", "view"]) for _ in range(n)],
        "value": [round(rng.uniform(0, 50), 2) for _ in range(n)],
        "props": ["{}"] * n,
    }
    tbl = pa.Table.from_pydict(rows)

    real_read = tables_mod.read_table
    try:
        tables_mod.read_table = (
            lambda sf, name, cols: ray.data.from_arrow(tbl.select(cols))
        )
        got = {r["event_id"]: (r["n_prior"], r["prior_value_cents"])
               for r in errors_prior_window("ignored", window_hours=24).take_all()}
    finally:
        tables_mod.read_table = real_read

    df = tbl.to_pandas()
    err = df[df["event_type"] == "error"]
    assert len(err) and any(v[0] > 0 for v in got.values())
    for e in err.itertuples():
        w = df[(df["user_id"] == e.user_id)
               & (df["ts"] >= e.ts - pd.Timedelta(hours=24))
               & (df["ts"] < e.ts)]
        cents = int(np.round(w["value"].to_numpy() * 100).sum())
        assert got[e.event_id] == (len(w), cents), e.event_id


def test_grouped_quantiles_randomized(ray_session):
    """Grouped refinement vs numpy per-group sort on skewed group sizes
    with heavy ties."""
    import ray.data

    from nativeextractor_ray.pipelines.quantiles import _exact_quantiles

    rng = np.random.default_rng(5)
    groups = np.repeat(["g0", "g1", "g2"], [3000, 40, 1])
    vals = np.concatenate([
        rng.integers(0, 7, 3000).astype(float),   # heavy ties
        rng.normal(100, 5, 40),
        [42.0],
    ])
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(groups.tolist(), pa.string()),
        "v": pa.array(vals, pa.float64()),
    })).repartition(7)
    qs = (0.1, 0.5, 1.0)
    got = _exact_quantiles(ds, "v", qs, group_col="g")
    for gk in ("g0", "g1", "g2"):
        s = np.sort(vals[groups == gk])
        for q in qs:
            k = max(1, int(np.ceil(q * len(s))))
            assert got[(gk, q)] == s[k - 1], (gk, q)


def test_funnel_counts_planted_dropouts(ray_session):
    """Planted funnel with real dropouts: a user who clicks BEFORE
    signing up must not count as converted (order matters), a user who
    never purchases stops at stage 2."""
    import pandas as pd
    import ray.data

    from nativeextractor_ray.pipelines.events import funnel_counts
    from nativeextractor_ray.sources import tables as tables_mod

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # u1: full ordered funnel
    rows += [(1, "signup", 0), (1, "click", 5), (1, "purchase", 9)]
    # u2: clicked before signup only -> counts for signup, NOT click
    rows += [(2, "click", 1), (2, "signup", 3)]
    # u3: signup + click, never purchases
    rows += [(3, "signup", 0), (3, "click", 2), (3, "click", 8)]
    # u4: purchase only -> no stages (never signed up)
    rows += [(4, "purchase", 7)]
    # u5: click at the exact signup instant -> >= lets it convert
    rows += [(5, "signup", 4), (5, "click", 4), (5, "purchase", 4)]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([t0 + pd.Timedelta(hours=r[2]) for r in rows],
                       pa.timestamp("us")),
    })

    real_read = tables_mod.read_table
    try:
        tables_mod.read_table = (
            lambda sf, name, cols: ray.data.from_arrow(tbl.select(cols))
        )
        got = {r["stage"]: r["n_users"]
               for r in funnel_counts("ignored").take_all()}
    finally:
        tables_mod.read_table = real_read

    assert got == {"signup": 4, "click": 3, "purchase": 2}


def test_minhash_skew_cap_degenerate_corpus(ray_session):
    """SURVEY §4.3.2 skew rule: an everything-identical corpus must not go
    quadratic — buckets above MAX_BUCKET are dropped wholesale (their
    members are exact dups anyway, dedup_exact's job), while normal
    near-dup pairs in the same corpus still surface."""
    import time

    import ray.data

    from nativeextractor_ray.pipelines.dedup import MAX_BUCKET, minhash_pairs

    n = MAX_BUCKET * 2
    texts = ["the same degenerate document body repeated everywhere " * 4] * n
    # plus one normal near-dup pair with many distinct shingles (one word
    # of ~60 changed -> Jaccard ~0.95)
    base_words = [f"w{i}" for i in range(60)]
    near_words = base_words[:]
    near_words[30] = "CHANGED"
    texts += [" ".join(base_words), " ".join(near_words)]
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    t0 = time.perf_counter()
    pairs = minhash_pairs(ray.data.from_arrow(tbl), threshold=0.5).take_all()
    dt = time.perf_counter() - t0
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (n, n + 1) in got              # the real near-dup still surfaces
    assert all(a >= n for a, _ in got)    # degenerate bucket emitted nothing
    assert dt < 60, f"skew cap failed to bound work: {dt:.1f}s"


def test_minhash_partition_pairs_vectorized(ray_session):
    """The vectorized in-bucket pair enumeration is row-set identical to
    the straightforward per-bucket scalar loop (the pre-r3 implementation,
    kept here as the reference), including the MAX_BUCKET raw-size gate,
    within-bucket doc_id dedup, ascending doc_a < doc_b emission and the
    6-decimal estimator rounding."""
    import numpy as np
    import pandas as pd

    from nativeextractor_ray.pipelines import dedup as dd

    def scalar_ref(g, threshold):
        g = g[g.duplicated("bucket", keep=False)]
        a_out, b_out, j_out = [], [], []
        for _, grp in g.groupby("bucket", sort=False):
            n = len(grp)
            if n < 2 or n > dd.MAX_BUCKET:
                continue
            grp = grp.drop_duplicates(subset="doc_id")
            n = len(grp)
            if n < 2:
                continue
            ids = grp["doc_id"].to_numpy()
            sigs = np.stack(
                [np.frombuffer(s, dtype=np.uint64) for s in grp["sig"]])
            order = np.argsort(ids, kind="stable")
            ids, sigs = ids[order], sigs[order]
            for i in range(n - 1):
                eq = (sigs[i + 1:] == sigs[i]).mean(axis=1)
                for h in np.nonzero(eq >= threshold)[0]:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[i + 1 + h]))
                    j_out.append(round(float(eq[h]), 6))
        return pd.DataFrame({
            "doc_a": pd.array(a_out, dtype="int64"),
            "doc_b": pd.array(b_out, dtype="int64"),
            "est_jaccard": pd.array(j_out, dtype="float64")})

    def norm(df):
        return (df.sort_values(["doc_a", "doc_b", "est_jaccard"])
                .reset_index(drop=True))

    rng = np.random.default_rng(11)
    K = 8
    for trial in range(25):
        n = int(rng.integers(0, 300))
        n_buckets = max(1, int(rng.integers(1, 20)))
        n_docs = max(2, int(rng.integers(2, 40)))
        sig_pool = rng.integers(0, 4, size=(6, K)).astype(np.uint64)
        doc_sig = {d: sig_pool[rng.integers(0, len(sig_pool))]
                   for d in range(n_docs)}
        docs = rng.integers(0, n_docs, size=n)
        g = pd.DataFrame({
            "bucket": rng.integers(0, n_buckets, size=n).astype(np.int64),
            "part": np.zeros(n, dtype=np.int64),
            "doc_id": docs.astype(np.int64),
            "sig": [doc_sig[d].tobytes() for d in docs],
        })
        got = norm(dd._minhash_partition_pairs(g, 0.5))
        want = norm(scalar_ref(g, 0.5))
        pd.testing.assert_frame_equal(got, want), trial

    # degenerate clique: one bucket over MAX_BUCKET raw rows emits nothing
    big = pd.DataFrame({
        "bucket": np.zeros(dd.MAX_BUCKET + 1, dtype=np.int64),
        "part": np.zeros(dd.MAX_BUCKET + 1, dtype=np.int64),
        "doc_id": np.arange(dd.MAX_BUCKET + 1, dtype=np.int64),
        "sig": [np.zeros(K, np.uint64).tobytes()] * (dd.MAX_BUCKET + 1),
    })
    assert len(dd._minhash_partition_pairs(big, 0.5)) == 0
    assert len(scalar_ref(big, 0.5)) == 0


def test_dedup_semantic_oracle_margins(sf_dir):
    """Float-safety contract of dedup_semantic_sql: the k-means assignment
    margin and the in-cluster cosine-vs-threshold margin must both sit far
    above DuckDB-vs-numpy float64 error (~4e-16)."""
    import numpy as np
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.dedup import SEM_K, SEM_THRESHOLD
    from nativeextractor_ray.pipelines.similarity import (
        _train_centroids, _train_sample,
    )

    cent = _train_centroids(_train_sample(sf_dir), k=SEM_K)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
    srt = np.sort(bm @ cent.T, axis=1)
    assert (srt[:, -1] - srt[:, -2]).min() > 1e-8

    # threshold margin over every in-cluster pair
    assign = np.argmax(bm @ cent.T, axis=1)
    worst = np.inf
    for c in np.unique(assign):
        sub = bm[assign == c]
        if len(sub) < 2:
            continue
        sims = sub @ sub.T
        iu = np.triu_indices(len(sub), k=1)
        worst = min(worst, np.abs(sims[iu] - SEM_THRESHOLD).min())
    assert worst > 1e-8
