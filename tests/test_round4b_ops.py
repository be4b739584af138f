"""Planted fixtures for the round-4b operators: bounded BFS
(seed_reachability), windowed heavy hitters (trending_terms), cohort
retention (retention_cohorts), key-skew profiling (key_skew_profile),
surface-similarity ER candidates (surface_link_candidates), and
incremental MinHash near-dup flags (dedup_minhash_incremental)."""

import unittest.mock as mock

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nativeextractor_ray.pipelines import graph


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


def _edges_ds(edges):
    import ray.data

    tbl = pa.table({
        "subj": pa.array([a for a, _ in edges], pa.string()),
        "obj": pa.array([b for _, b in edges], pa.string()),
    })
    ds = ray.data.from_arrow(tbl)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["subj", "obj"])[["subj", "obj"]]

    return ds.map_batches(dedup, batch_format="pandas")


def test_seed_reachability_planted(ray_session):
    """Min-hop labels: seeds at 0, directed edges only, max_hops cap,
    unreached entities absent."""
    edges = [
        ("person:a", "conv:x"),     # hop 0 -> 1
        ("conv:x", "tool:t"),       # hop 2
        ("tool:t", "url:u"),        # hop 3
        ("url:u", "date:d"),        # hop 4 -> beyond cap, absent
        ("conv:y", "person:a"),     # wrong direction: conv:y unreached
        ("person:b", "conv:x"),     # second seed, same target
    ]
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got = _df(graph.seed_reachability(
            "unused", seed_prefix="person:", max_hops=3))
    hops = dict(zip(got["entity"], got["hop"]))
    assert hops == {"person:a": 0, "person:b": 0, "conv:x": 1,
                    "tool:t": 2, "url:u": 3}


def test_seed_reachability_seed_shortcut(ray_session):
    """A seed reachable from another seed keeps hop 0 (min rule)."""
    edges = [("person:a", "person:b"), ("person:b", "conv:c")]
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got = _df(graph.seed_reachability(
            "unused", seed_prefix="person:", max_hops=2))
    hops = dict(zip(got["entity"], got["hop"]))
    assert hops == {"person:a": 0, "person:b": 0, "conv:c": 1}


def test_surface_link_candidates_planted(ray_session):
    """Same-block pairs within edit distance; cross-type and
    over-distance pairs excluded; cap keeps the lexicographically
    smallest surfaces."""
    edges = [
        ("person:nina", "conv:x"),
        ("person:nora", "conv:x"),   # lev(nina, nora) = 2 -> pair
        ("person:zelda", "conv:x"),  # different block (z)
        ("tool:nina", "conv:x"),     # same letters, different type
        ("person:nanette", "conv:x"),  # lev > 2 from both
    ]
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got = _df(graph.surface_link_candidates("unused", max_dist=2))
    got = got.sort_values(["entity_a", "entity_b"]).reset_index(drop=True)
    assert list(got["entity_a"]) == ["person:nina"]
    assert list(got["entity_b"]) == ["person:nora"]
    assert list(got["lev"]) == [2]

    # cap=1 keeps only person:nanette (lexicographically smallest) in
    # the (person, n) block -> no pair survives
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        capped = _df(graph.surface_link_candidates(
            "unused", max_dist=2, cap=1))
    assert len(capped) == 0


def _write_events(tmp_path, rows):
    """rows: (event_id, user, ts, type, value)"""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[2], "us") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows]),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([float(r[4]) for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    }), tmp_path / "events.parquet")
    return str(tmp_path)


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Cohort = first active day; repeat events on one day dedup; the
    offset-0 row equals the cohort size."""
    sf = _write_events(tmp_path, [
        (1, "u1", "2024-01-01T10:00", "click", 1),
        (2, "u1", "2024-01-01T12:00", "click", 1),   # same day, dedup
        (3, "u1", "2024-01-03T09:00", "click", 1),   # offset 2
        (4, "u2", "2024-01-01T08:00", "view", 1),
        (5, "u2", "2024-01-02T08:00", "view", 1),    # offset 1
        (6, "u3", "2024-01-02T08:00", "view", 1),    # cohort day 2
    ])
    from nativeextractor_ray.pipelines.events import retention_cohorts

    got = _df(retention_cohorts(sf)).sort_values(
        ["cohort_day", "day_offset"]).reset_index(drop=True)
    rows = list(zip(got["cohort_day"], got["day_offset"], got["n_users"]))
    assert rows == [
        ("2024-01-01", 0, 2),   # u1, u2
        ("2024-01-01", 1, 1),   # u2
        ("2024-01-01", 2, 1),   # u1
        ("2024-01-02", 0, 1),   # u3
    ]


def test_key_skew_profile_planted(ray_session, tmp_path):
    """Counts, deterministic tie-break (count desc, user asc), exact
    half-up micro shares, top_n cap."""
    rows = []
    eid = 0
    for user, n in [("hot", 6), ("b", 2), ("a", 2)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, user, "2024-01-01T00:00", "click", 1))
    sf = _write_events(tmp_path, rows)
    from nativeextractor_ray.pipelines.audit import key_skew_profile

    got = key_skew_profile(sf, top_n=2).to_pandas()
    assert list(got["user_id"]) == ["hot", "a"]
    assert list(got["n"]) == [6, 2]
    # 6/10 = 600000, 2/10 = 200000
    assert list(got["share_micro"]) == [600000, 200000]


def test_dedup_minhash_incremental_planted(ray_session, tmp_path):
    """New docs (id % mod == 0) flag against EXISTING near-dups only:
    new-new pairs excluded, clean new docs report zero matches."""
    texts = {
        0: "the quick brown fox jumps over the lazy dog tonight",   # new
        1: "the quick brown fox jumps over the lazy dog tonight",   # dup of 0
        2: "completely different text about ray data pipelines ok",
        10: "the quick brown fox jumps over the lazy dog tonight",  # new dup of 0
        20: "nothing like anything else in this corpus at all no",  # new clean
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts.values()], pa.int64()),
    }), tmp_path / "documents.parquet")
    from nativeextractor_ray.pipelines.dedup import (
        dedup_minhash_incremental)

    got = _df(dedup_minhash_incremental(
        str(tmp_path), threshold=0.5, mod=10)).sort_values(
        "doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [0, 10, 20]
    # doc 0 matches existing doc 1 (identical); NOT new doc 10
    assert list(got["n_matches"]) == [1, 1, 0]
    assert list(got["max_jaccard"]) == [1.0, 1.0, 0.0]


def test_trending_terms_planted(ray_session, tmp_path):
    """Per-minute exact counts, top-k with n-desc/term-asc tie-break —
    driven through the real transcripts derivation at sf0.001 against
    a pandas reference."""
    from nativeextractor_ray.pipelines.kg import trending_terms
    from nativeextractor_ray.sources.transcripts import (
        transcripts_dataset)

    sf = "/root/testdata/sf0.001"
    got = _df(trending_terms(sf, k=3)).sort_values(
        ["minute", "rnk"]).reset_index(drop=True)

    tr = _df(transcripts_dataset(sf))
    ref_rows = []
    tr["minute"] = tr["ts"].dt.strftime("%Y-%m-%dT%H:%M")
    for minute, grp in tr.groupby("minute"):
        counts = {}
        for txt in grp["text"]:
            for w in txt.split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for r, (term, n) in enumerate(top, 1):
            ref_rows.append((minute, term, n, r))
    ref = pd.DataFrame(ref_rows, columns=["minute", "term", "n", "rnk"])
    ref = ref.sort_values(["minute", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["minute", "term", "n", "rnk"]], ref, check_dtype=False)


def test_forecast_revenue_change_planted(ray_session, tmp_path):
    """Basis-point discount band edges inclusive, quantity strict-less
    with half-up rounding, out-of-year rows excluded."""
    from test_round4_ops import _mini  # part/lineitem-only star

    # _mini writes no shipdate; write lineitem directly with the columns
    # forecast_revenue_change reads
    pq.write_table(pa.table({
        "l_shipdate": pa.array([np.datetime64(d, "us") for d in
                                ["1996-06-01", "1996-06-01", "1996-06-01",
                                 "1995-12-31", "1996-06-01", "1996-06-01"]],
                               pa.timestamp("us")),
        "l_discount": pa.array([0.02, 0.04, 0.05, 0.03, 0.03, 0.03]),
        "l_quantity": pa.array([10.0, 10.0, 10.0, 10.0, 24.0, 23.6]),
        "l_extendedprice": pa.array([100.0] * 6),
    }), tmp_path / "lineitem.parquet")
    from nativeextractor_ray.pipelines.relational import (
        forecast_revenue_change, forecast_revenue_change_sql)
    import duckdb

    got = forecast_revenue_change(str(tmp_path)).to_pandas()
    # rows: 1 (0.02 lo edge, 200c), 2 (0.04 hi edge, 400c),
    # 3 excluded (0.05), 4 excluded (1995), 5 excluded (qty 24 not < 24),
    # 6 excluded (qty 23.6 -> 24 half-up)
    assert list(got["revenue_c"]) == [600]
    con = duckdb.connect()
    con.register("lineitem", pq.read_table(tmp_path / "lineitem.parquet"))
    want = con.sql(forecast_revenue_change_sql()).df()
    assert list(want["revenue_c"]) == [600]


def test_kcore_entities_planted(ray_session):
    """A triangle survives k=2; a pendant chain peels off over rounds
    (synchronous rule: the chain end's neighbor survives round 1, dies
    round 2); direction and duplicate edges don't matter."""
    edges = [
        ("person:a", "person:b"), ("person:b", "person:c"),
        ("person:c", "person:a"),            # triangle: 2-core
        ("person:a", "person:b"),            # duplicate edge, no effect
        ("person:c", "conv:x"),              # chain: x - y pendant
        ("conv:x", "conv:y"),
    ]
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got = _df(graph.kcore_entities("unused", k=2, rounds=4))
    out = dict(zip(got["entity"], got["deg"]))
    assert out == {"person:a": 2, "person:b": 2, "person:c": 2}

    # k=1, 1 round: everything with >= 1 neighbor survives
    with mock.patch.object(graph, "_edges",
                           lambda sf: _edges_ds(edges)):
        got1 = _df(graph.kcore_entities("unused", k=1, rounds=1))
    assert len(got1) == 5
