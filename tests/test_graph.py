"""Graph analytics (pipelines/graph.py): PageRank recurrence against a
dense NumPy reference on planted graphs; oracle parity at sf0.001 is
covered by test_oracle_parity.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from nativeextractor_ray.pipelines import graph


def _pagerank_dense(edges, iters=graph.PR_ITERS, d=graph.PR_DAMPING):
    """Straight-line dense reference: same recurrence, no distribution."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {e: i for i, e in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    adj = []
    for a, b in set(edges):
        out[idx[a]] += 1
    for a, b in set(edges):
        adj.append((idx[a], idx[b]))
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        acc = np.zeros(n)
        for s, o in adj:
            acc[o] += r[s] / out[s]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (acc + dang / n)
    return {e: round(float(r[idx[e]]), 6) for e in nodes}


def _run_pagerank_on_edges(edges, ray_session):
    """Drive entity_pagerank's iteration core on a synthetic edge set by
    monkeypatching _edges' product: reuse the public function via a tiny
    shim dataset."""
    import ray.data

    tbl = pa.table({
        "subj": pa.array([a for a, _ in edges], pa.string()),
        "obj": pa.array([b for _, b in edges], pa.string()),
    })
    ds = ray.data.from_arrow(tbl)

    # same dedup the real _edges applies
    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["subj", "obj"])[["subj", "obj"]]

    import unittest.mock as mock

    with mock.patch.object(graph, "_edges",
                           lambda sf: ds.map_batches(
                               dedup, batch_format="pandas")):
        res = graph.entity_pagerank("unused")
    import ray as _ray

    parts = [_ray.get(r) for r in res.to_arrow_refs()]
    out = pa.concat_tables([p for p in parts if p.num_rows]).to_pandas()
    return dict(zip(out["entity"], out["rank"]))


@pytest.mark.parametrize("case", [
    # chain with a dangling sink
    [("a", "b"), ("b", "c"), ("c", "d")],
    # cycle + spoke
    [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")],
    # parallel predicates collapse to one edge (duplicates in input)
    [("a", "b"), ("a", "b"), ("b", "a")],
    # star: hub with many sinks
    [("hub", f"leaf{i}") for i in range(10)],
    # self-loop
    [("a", "a"), ("a", "b")],
])
def test_pagerank_matches_dense_reference(case, ray_session):
    got = _run_pagerank_on_edges(case, ray_session)
    want = _pagerank_dense(case)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6, (k, got[k], want[k])


def test_pagerank_mass_conserved(ray_session):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(40)]
    got = _run_pagerank_on_edges(edges, ray_session)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_vocab_bound_raises(ray_session, monkeypatch):
    monkeypatch.setattr(graph, "VOCAB_BOUND", 0)
    with pytest.raises(ValueError, match="driver bound"):
        _run_pagerank_on_edges([("a", "b")], ray_session)
