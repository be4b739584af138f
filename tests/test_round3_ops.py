"""Planted-fixture tests for the round-3 operators (dedup_semantic,
domain_mix, shuffle_shards, dup_spans, normalize_text) — semantics beyond
the DuckDB oracle parity gate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    import ray

    parts = [ray.get(r) for r in res.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows] or parts[:1]
    return pa.concat_tables(parts, promote_options="default").to_pandas()


def test_dup_spans_planted_run(ray_session, tmp_path, monkeypatch):
    """Two docs sharing a verbatim 6-token span at n=4 -> a run of exactly
    3 duplicated gram positions in each; a third unrelated doc -> 0."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines import decontam

    shared = "alpha beta gamma delta epsilon zeta"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"one two {shared} three four",
            f"five six seven {shared} eight",
            "nine ten eleven twelve thirteen fourteen fifteen sixteen",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _df(decontam.dup_spans(str(tmp_path), n=4)).set_index("doc_id")
    assert got.loc[1, "max_run"] == 3  # 6-token span -> 3 four-gram positions
    assert got.loc[2, "max_run"] == 3
    assert got.loc[3, "max_run"] == 0 and got.loc[3, "n_dup"] == 0
    assert got.loc[1, "n_pos"] == 10 - 4 + 1


def test_shuffle_shards_invariants(ray_session, sf_dir):
    """Every doc appears exactly once; pos is dense 0..m-1 within a shard;
    shard order is the deterministic hash order."""
    from nativeextractor_ray.pipelines.curation import (
        N_SHARDS, _SHARD_MOD, _SHARD_MULT, shuffle_shards,
    )

    got = _df(shuffle_shards(sf_dir))
    assert got["doc_id"].is_unique
    for sh, grp in got.groupby("shard"):
        assert 0 <= sh < N_SHARDS
        assert sorted(grp["pos"]) == list(range(len(grp)))
        key = (grp["doc_id"].to_numpy() * _SHARD_MULT) % _SHARD_MOD
        order = np.lexsort((grp["doc_id"].to_numpy(), key))
        assert (grp["pos"].to_numpy()[order] == np.arange(len(grp))).all()


def test_domain_mix_balances(ray_session, sf_dir):
    """Kept per-domain counts land within hash-rounding distance of the
    smallest domain's size (uniform-mixture target)."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.curation import domain_mix

    got = _df(domain_mix(sf_dir))
    full = pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])
    n_by = pd.Series(full.column("lang").to_pylist()).value_counts()
    nmin = int(n_by.min())
    kept = got["lang"].value_counts()
    # multiplicative-hash acceptance is uniform only in expectation; with
    # strata of tens of docs allow a wide but bounded tolerance
    for lang, n in n_by.items():
        k = int(kept.get(lang, 0))
        assert abs(k - nmin) <= max(6, int(0.45 * nmin)), (lang, k, nmin)


def test_dedup_semantic_drop_rule(ray_session, sf_dir):
    """Every dropped vector has a lower-id same-cluster neighbour above
    threshold; every kept one has none (exact replay of the drop rule)."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.dedup import (
        SEM_K, SEM_THRESHOLD, dedup_semantic,
    )
    from nativeextractor_ray.pipelines.similarity import (
        _train_centroids, _train_sample,
    )

    got = _df(dedup_semantic(sf_dir)).sort_values("vec_id").reset_index(drop=True)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    bm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
    cent = _train_centroids(_train_sample(sf_dir), k=SEM_K)
    assign = np.argmax(bm @ cent.T, axis=1)
    order = np.argsort(ids)
    ids, bm, assign = ids[order], bm[order], assign[order]
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster"].to_numpy() == assign).all()
    sims = bm @ bm.T
    same = assign[:, None] == assign[None, :]
    lower = ids[None, :] < ids[:, None]  # [i, j]: id_j < id_i
    has_nb = ((sims >= SEM_THRESHOLD) & same & lower).any(axis=1)
    assert (got["keep"].to_numpy() == ~has_nb).all()
    assert (~got["keep"]).sum() > 0  # non-trivial on the test corpus


def test_normalize_text_kernels(ray_session, tmp_path):
    """Planted messy text: control chars, runs of whitespace, case and
    digits all fold; clean text reports changed == False."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.curation import normalize_text

    # normalize_text reads transcripts derived from documents; plant the
    # messy strings inside document text so they survive derivation
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["MiXeD \t\t Case\x01 42 end", "already clean"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([22, 13], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _df(normalize_text(str(tmp_path)))
    joined = " | ".join(got["text_norm"])
    assert "mixed case 00 end" in joined
    assert "\x01" not in joined and "\t" not in joined
    assert got["changed"].any()
