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


# ---------------------------------------------------------------- triangles


def _triangles_dense(edges):
    """Brute-force per-entity triangle counts over the undirected,
    loop-free canonicalization of a directed edge list."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in und for x in e})
    from itertools import combinations

    cnt = {v: 0 for v in nodes}
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in und and (y, z) in und and (x, z) in und):
            cnt[x] += 1
            cnt[y] += 1
            cnt[z] += 1
    return {v: c for v, c in cnt.items() if c}


def _run_triangles_on_edges(edges, ray_session):
    import unittest.mock as mock

    import ray
    import ray.data

    tbl = pa.table({
        "subj": pa.array([a for a, _ in edges], pa.string()),
        "obj": pa.array([b for _, b in edges], pa.string()),
    })
    ds = ray.data.from_arrow(tbl)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["subj", "obj"])[["subj", "obj"]]

    with mock.patch.object(graph, "_edges",
                           lambda sf: ds.map_batches(
                               dedup, batch_format="pandas")):
        res = graph.triangle_counts("unused")
    parts = [ray.get(r) for r in res.to_arrow_refs()]
    out = pa.concat_tables([p for p in parts if p.num_rows]
                           or parts[:1]).to_pandas()
    return dict(zip(out["entity"], out["n_tri"]))


@pytest.mark.parametrize("case", [
    # one triangle, mixed directions + a reverse duplicate edge
    [("a", "b"), ("c", "b"), ("a", "c"), ("b", "a")],
    # two triangles sharing edge (a, b)
    [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "b")],
    # K4: every vertex in 3 triangles
    [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")],
    # square without diagonal: zero triangles
    [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
    # self-loops and a dangling spoke never close a triangle
    [("a", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("c", "c"), ("c", "e")],
    # star: zero triangles (empty result)
    [("hub", f"leaf{i}") for i in range(8)],
])
def test_triangles_match_dense_reference(case, ray_session):
    got = _run_triangles_on_edges(case, ray_session)
    want = _triangles_dense(case)
    assert got == want


def test_triangles_random_graph(ray_session):
    """Seeded Erdős–Rényi-ish digraph, brute-force cross-check — hits the
    size-batched wedge enumeration with heterogeneous out-degrees."""
    rng = np.random.default_rng(7)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = []
    for a in range(24):
        for b in range(24):
            if a != b and rng.random() < 0.18:
                edges.append((nodes[a], nodes[b]))
    got = _run_triangles_on_edges(edges, ray_session)
    want = _triangles_dense(edges)
    assert got == want


def _df(res) -> pd.DataFrame:
    import ray

    parts = [ray.get(r) for r in res.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows] or parts[:1]
    return pa.concat_tables(parts, promote_options="default").to_pandas()

def test_entity_neighbor_jaccard_planted(ray_session):
    """Planted co-citation graph: the fan-in cap drops a hot object from
    PAIR generation but keeps it in degrees; min_shared gates; the micro
    Jaccard is the exact half-up integer ratio."""
    import unittest.mock as mock

    import ray.data

    # A -> {o1, o2, o3, hot}; B -> {o1, o2, hot}; C -> {o3}
    edges = [("A", "o1"), ("A", "o2"), ("A", "o3"), ("A", "hot"),
             ("B", "o1"), ("B", "o2"), ("B", "hot"),
             ("C", "o3")]
    tbl = pa.table({
        "subj": pa.array([a for a, _ in edges], pa.string()),
        "obj": pa.array([b for _, b in edges], pa.string()),
    })

    with mock.patch.object(graph, "_edges",
                           lambda sf: ray.data.from_arrow(tbl)):
        got = _df(graph.entity_neighbor_jaccard(
            ".", min_shared=2, max_fanin=1))

    # with max_fanin=1 the shared objects o1, o2 (fan-in 2) and hot
    # (fan-in 2) are ALL capped out of pair generation -> no pairs
    assert len(got) == 0

    with mock.patch.object(graph, "_edges",
                           lambda sf: ray.data.from_arrow(tbl)):
        got = _df(graph.entity_neighbor_jaccard(
            ".", min_shared=2, max_fanin=2)).reset_index(drop=True)

    # o1, o2, hot all pair (A, B): n_shared 3; degrees stay FULL
    # (A: 4, B: 3) -> union 4 + 3 - 3 = 4, jaccard 3/4 = 750000.
    # (A, C) share only o3 -> below min_shared, absent.
    assert list(got["subj_a"]) == ["A"]
    assert list(got["subj_b"]) == ["B"]
    assert list(got["n_shared"]) == [3]
    assert list(got["jaccard_micro"]) == [750000]
