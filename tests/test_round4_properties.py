"""Property tests for the round-4 graph/string kernels — seeded
randomized comparisons against independent brute-force references (the
reference's patricia.c roundtrip style): levenshtein vs DuckDB's
implementation, bounded BFS vs a Python queue walk, k-core peeling vs a
direct fixpoint loop.

Ray-driving properties use few examples (each example spins Dataset
stages); the pure-Python levenshtein uses the normal budget."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from nativeextractor_ray.pipelines.graph import _levenshtein

SETTINGS = dict(max_examples=60, derandomize=True, deadline=None)
RAY_SETTINGS = dict(max_examples=8, derandomize=True, deadline=None)

short = st.text(alphabet=st.sampled_from("abcx"), min_size=0, max_size=7)


@settings(**SETTINGS)
@given(short, short)
def test_levenshtein_matches_duckdb(a, b):
    import duckdb

    want = duckdb.sql(
        "SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
    assert _levenshtein(a, b) == want


@settings(**SETTINGS)
@given(short, short)
def test_levenshtein_metric_axioms(a, b):
    d = _levenshtein(a, b)
    assert d == _levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d >= abs(len(a) - len(b))
    assert d <= max(len(a), len(b))


def _df(res) -> pd.DataFrame:
    from nativeextractor_ray.functions.blocks import arrow_blocks

    if isinstance(res, pa.Table):
        return res.to_pandas()
    parts = list(arrow_blocks(res, stream=False))
    if not parts:
        return pd.DataFrame()
    return pa.concat_tables(parts, promote_options="default").to_pandas()


def _edges_ds(edges):
    import ray.data

    tbl = pa.table({
        "subj": pa.array([a for a, _ in edges], pa.string()),
        "obj": pa.array([b for _, b in edges], pa.string()),
    })

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["subj", "obj"])[["subj", "obj"]]

    return ray.data.from_arrow(tbl).map_batches(
        dedup, batch_format="pandas")


edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=25)


def _bfs_reference(edges, seeds, max_hops):
    """Plain queue BFS over the directed edge set."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    return dist


@settings(**RAY_SETTINGS)
@given(edge_lists, st.integers(1, 3))
def test_seed_reachability_matches_bfs(raw, max_hops):
    import unittest.mock as mock

    from nativeextractor_ray.pipelines import graph

    # nodes 0-4 render as seeds ("person:n{i}"), 5-9 as non-seeds
    def name(i):
        return f"person:n{i}" if i < 5 else f"conv:c{i}"

    edges = [(name(a), name(b)) for a, b in raw]
    seeds = {name(i) for i in range(5)
             if any(name(i) in e for e in edges)}
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got = _df(graph.seed_reachability(
            "unused", seed_prefix="person:", max_hops=max_hops))
    want = _bfs_reference(edges, sorted(seeds), max_hops)
    got_map = (dict(zip(got["entity"], got["hop"]))
               if "entity" in got.columns else {})
    assert got_map == want


def _kcore_reference(edges, k, rounds):
    """Direct synchronous peel over the undirected distinct graph."""
    nbrs: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    alive = set(nbrs)
    deg = {}
    for _ in range(rounds):
        deg = {u: sum(1 for v in nbrs[u] if v in alive)
               for u in alive}
        alive = {u for u in alive if deg[u] >= k}
    return {u: deg[u] for u in alive}


@settings(**RAY_SETTINGS)
@given(edge_lists, st.integers(1, 3), st.integers(1, 3))
def test_kcore_matches_reference(raw, k, rounds):
    import unittest.mock as mock

    from nativeextractor_ray.pipelines import graph

    edges = [(f"e:n{a}", f"e:n{b}") for a, b in raw]
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got = _df(graph.kcore_entities("unused", k=k, rounds=rounds))
    want = _kcore_reference(edges, k, rounds)
    got_map = (dict(zip(got["entity"], got["deg"]))
               if "entity" in got.columns else {})
    assert got_map == want
