"""Planted-fixture tests for BM25 keyword retrieval (pipelines/retrieval.py)
— semantics beyond the auto-discovered DuckDB oracle parity gate: hand-
computed BM25 on a tiny corpus, ranking behavior (tf saturation, length
normalization), and the local-top-k/global-merge equivalence across block
sizes."""

import math

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


def _write(tmp_path, table: pa.Table) -> str:
    import pyarrow.parquet as pq

    pq.write_table(table, tmp_path / "documents.parquet")
    return str(tmp_path)


def _bm25_ref(docs: dict[int, str], terms, k1=1.2, b=0.75):
    """Independent scalar BM25 (Lucene idf), scores rounded to 4 dp."""
    toks = {d: [w for w in t.split(" ") if w] for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for d, w in toks.items():
        s = 0.0
        for term in terms:
            tf = w.count(term)
            if not tf:
                continue
            df = sum(1 for ws in toks.values() if term in ws)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(w) / avgdl))
        if s > 0:
            out[d] = round(s, 4)
    return out


def test_bm25_planted_hand_computed(ray_session, tmp_path):
    """Ray result equals an independent scalar BM25 on a planted corpus,
    including rank order and the score>0 hit filter."""
    from nativeextractor_ray.pipelines.retrieval import bm25_topk

    docs = {
        1: "hash merge hash window spark",      # all terms, short
        2: "hash " + "filler " * 40 + "hash",   # high tf, long (normalized down)
        3: "merge",                              # single short hit
        4: "nothing relevant here at all",       # no hits -> excluded
        5: "spark window spark window spark",    # repeated hits
    }
    sf = _write(tmp_path, pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    got = _df(bm25_topk(sf)).sort_values("rnk").reset_index(drop=True)

    ref = _bm25_ref(docs, ("hash", "merge", "window", "spark"))
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["doc_id"]) == [d for d, _ in want]
    np.testing.assert_allclose(got["score"], [s for _, s in want], atol=5e-5)
    assert list(got["rnk"]) == list(range(1, len(want) + 1))
    assert 4 not in set(got["doc_id"])  # no-hit doc excluded


def test_bm25_block_size_invariance(ray_session, tmp_path):
    """The per-block local-top-k + global merge returns the same global
    top-k regardless of how the corpus is split into blocks (the
    correctness condition the scale shape rests on)."""
    import duckdb

    from nativeextractor_ray.pipelines.retrieval import bm25_topk, bm25_topk_sql
    from nativeextractor_ray.sources import tables

    rng = np.random.RandomState(7)
    vocab = ["hash", "merge", "window", "spark", "scan", "row", "agg", "x"]
    docs = {i: " ".join(rng.choice(vocab, rng.randint(3, 30)))
            for i in range(200)}
    sf = _write(tmp_path, pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(bm25_topk_sql()).df()

    for blocks in (1, 7):
        orig = tables.read_table

        def split_read(sf_dir, name, columns=None, blocks_=blocks, **kw):
            return orig(sf_dir, name, columns, blocks=blocks_)

        tables_read, tables.read_table = tables.read_table, split_read
        try:
            got = _df(bm25_topk(sf)).sort_values("rnk").reset_index(drop=True)
        finally:
            tables.read_table = tables_read
        pd.testing.assert_frame_equal(
            got[["doc_id", "score", "rnk"]].astype(
                {"doc_id": "int64", "rnk": "int64"}),
            want[["doc_id", "score", "rnk"]].astype(
                {"doc_id": "int64", "rnk": "int64"}))
