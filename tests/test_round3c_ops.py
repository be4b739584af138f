"""Planted-fixture tests for the round-3c operators
(knn_graph, bpe_encode, split_assign) — semantics beyond the DuckDB
oracle parity gate."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _df(res) -> pd.DataFrame:
    import ray

    if isinstance(res, pa.Table):
        return res.to_pandas()
    parts = [ray.get(r) for r in res.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows] or parts[:1]
    return pa.concat_tables(parts, promote_options="default").to_pandas()


def _write_docs(tmp_path, ids, texts):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
    }), tmp_path / "documents.parquet")
    return str(tmp_path)


def _write_emb(tmp_path, ids, mat):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    return str(tmp_path)


# ------------------------------------------------------------- knn_graph


def test_knn_graph_planted_neighbors(ray_session, tmp_path):
    """Orthogonal planted clusters: each vector's nearest neighbor is its
    own cluster-mate, never itself, never the orthogonal cluster."""
    from nativeextractor_ray.pipelines.similarity import knn_graph

    # two orthogonal directions, small deterministic jitter within cluster
    rng = np.random.default_rng(4)
    base = np.zeros((6, 8))
    base[:3, 0] = 1.0  # cluster A along e0: ids 0,1,2
    base[3:, 1] = 1.0  # cluster B along e1: ids 3,4,5
    mat = base + 0.01 * rng.standard_normal((6, 8))
    sf = _write_emb(tmp_path, list(range(6)), mat)

    got = _df(knn_graph(sf, k=2))
    assert len(got) == 12  # 6 vectors × k=2
    assert (got["vec_id"] != got["neighbor_id"]).all()
    top1 = got[got["rank"] == 1].set_index("vec_id")["neighbor_id"]
    for v in range(3):
        assert top1[v] in (0, 1, 2)
    for v in range(3, 6):
        assert top1[v] in (3, 4, 5)


def test_knn_graph_chunked_matches_single(ray_session, tmp_path, monkeypatch):
    """The multi-chunk block-nested sweep is bit-identical to the
    single-chunk result (KNN_CHUNK_BOUND forced to 1 byte)."""
    from nativeextractor_ray.pipelines import similarity

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((40, 16))
    sf = _write_emb(tmp_path, list(range(40)), mat)

    a = _df(similarity.knn_graph(sf, k=3)).sort_values(
        ["vec_id", "rank"]).reset_index(drop=True)
    monkeypatch.setattr(similarity, "KNN_CHUNK_BOUND", 1)
    b = _df(similarity.knn_graph(sf, k=3)).sort_values(
        ["vec_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)
    assert len(a) == 120


# ------------------------------------------------------------- bpe_encode


def test_bpe_encode_token_counts(ray_session, tmp_path):
    """After training on a corpus where 'low' dominates, 'low' encodes to
    one token; an out-of-vocabulary word stays fully split except for
    learned sub-pairs — counts hand-checked against the merge table."""
    from nativeextractor_ray.pipelines import bpe

    texts = ["low low low low low lower"] * 4
    sf = _write_docs(tmp_path, list(range(4)), texts)
    merges = bpe.bpe_train(sf, k=4).to_pandas()
    got = _df(bpe.bpe_encode(sf, k=4)).set_index("doc_id")

    assert got.loc[0, "n_words"] == 6
    # 'low' must be a single learned token after 4 merges on this corpus
    assert "low" in set(merges["merged"])
    # 5×'low' = 5 tokens; 'lower' = however the merges segment it (≤5)
    assert 6 <= got.loc[0, "n_bpe_tokens"] <= 10
    assert (got["n_bpe_tokens"] == got.loc[0, "n_bpe_tokens"]).all()


def test_bpe_encode_matches_reference(ray_session, tmp_path):
    """Distributed encode summary equals the independent scalar reference
    on a mixed-vocabulary corpus."""
    from nativeextractor_ray.pipelines import bpe

    rng = np.random.default_rng(6)
    vocab = ["alpha", "alphabet", "beta", "betamax", "gamma", "g"]
    texts = [" ".join(rng.choice(vocab, 10)) for _ in range(30)]
    sf = _write_docs(tmp_path, list(range(30)), texts)

    got = _df(bpe.bpe_encode(sf, k=8)).sort_values("doc_id").reset_index(drop=True)
    want = pd.DataFrame(
        bpe._bpe_encode_reference(sf, k=8, max_words=bpe.BPE_MAX_WORDS),
        columns=["doc_id", "n_words", "n_bpe_tokens", "tok_checksum"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------------------------------- split_assign


def test_split_assign_deterministic_and_stable(ray_session, tmp_path):
    """Same doc → same split on every run; fractions are roughly 80/10/10;
    appending new docs never reassigns existing ones."""
    from nativeextractor_ray.pipelines.curation import split_assign

    sf = _write_docs(tmp_path, list(range(500)), ["x"] * 500)
    a = _df(split_assign(sf)).sort_values("doc_id").reset_index(drop=True)
    b = _df(split_assign(sf)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert frac.get("val", 0) > 0.03 and frac.get("test", 0) > 0.03

    # append: the original 500 keep their assignment
    sf2 = _write_docs(tmp_path, list(range(700)), ["x"] * 700)
    c = _df(split_assign(sf2)).set_index("doc_id")
    merged = a.set_index("doc_id")
    assert (c.loc[merged.index, "split"] == merged["split"]).all()
