"""Planted-fixture tests for the final round-3 operators
(cms_heavy_hitters, user_value_rank, event_transitions) — hand-planted
events where the expected windows/sketch values are known by
construction, beyond the DuckDB oracle parity gate."""

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


def _events(tmp_path, rows: list[tuple]) -> str:
    """rows = (event_id, user_id, ts_us, event_type, value)"""
    import pyarrow.parquet as pq

    eid, uid, ts, et, val = zip(*rows)
    pq.write_table(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(["{}"] * len(eid), pa.string()),
    }), tmp_path / "events.parquet")
    return str(tmp_path)


# ------------------------------------------------------ user_value_rank


def test_user_value_rank_ties(ray_session, tmp_path):
    """RANK skips tied slots, DENSE_RANK doesn't; per-user isolation."""
    from nativeextractor_ray.pipelines.windows import user_value_rank

    sf = _events(tmp_path, [
        # user 1: values 5.00, 5.00, 3.00, 1.00 -> rnk 1,1,3,4 / drnk 1,1,2,3
        (1, 1, 1000, "a", 5.0),
        (2, 1, 2000, "a", 5.0),
        (3, 1, 3000, "a", 3.0),
        (4, 1, 4000, "a", 1.0),
        # user 2: all tied -> rnk 1,1,1 / drnk 1,1,1
        (5, 2, 1000, "b", 2.0),
        (6, 2, 2000, "b", 2.0),
        (7, 2, 3000, "b", 2.0),
    ])
    got = _df(user_value_rank(sf)).set_index("event_id").sort_index()
    assert got["rnk"].tolist() == [1, 1, 3, 4, 1, 1, 1]
    assert got["drnk"].tolist() == [1, 1, 2, 3, 1, 1, 1]
    assert got["user_id"].tolist() == [1, 1, 1, 1, 2, 2, 2]


# ---------------------------------------------------- event_transitions


def test_event_transitions_planted(ray_session, tmp_path):
    """Consecutive same-user pairs only, ordered by (ts, event_id)."""
    from nativeextractor_ray.pipelines.windows import event_transitions

    sf = _events(tmp_path, [
        # user 1 path: a -> b -> a  (pairs: a->b, b->a)
        (1, 1, 1000, "a", 0.0),
        (2, 1, 2000, "b", 0.0),
        (3, 1, 3000, "a", 0.0),
        # user 2 path: a -> b  (pair: a->b)   [no cross-user pair with u1]
        (4, 2, 1500, "a", 0.0),
        (5, 2, 2500, "b", 0.0),
        # user 3: single event -> no pairs
        (6, 3, 9000, "c", 0.0),
        # user 1 ts tie broken by event_id: 7 then 8 (c->c)
        (7, 1, 4000, "c", 0.0),
        (8, 1, 4000, "c", 0.0),
    ])
    got = _df(event_transitions(sf))
    counts = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
    assert counts == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1,
                      ("c", "c"): 1}


# ---------------------------------------------------- cms_heavy_hitters


def test_cms_heavy_hitters_planted(ray_session, tmp_path):
    """One dominant user clears ceil(8/1000 * N); est >= exact always;
    the dominant user's exact count is reported exactly."""
    from nativeextractor_ray.pipelines.sketches import cms_heavy_hitters

    rows = []
    eid = 0
    # user 100: 900 events; users 200..299: 1 event each  -> N = 1000,
    # threshold = 8: only user 100 can clear it (singletons est < 8
    # unless >= 8 singletons collide in ALL 4 rows -- with 100 keys in
    # 512 columns the min-of-4 makes that astronomically unlikely, and
    # the assertion below would catch it loudly as extra rows)
    for _ in range(900):
        eid += 1
        rows.append((eid, 100, eid * 1000, "x", 0.0))
    for u in range(200, 300):
        eid += 1
        rows.append((eid, u, eid * 1000, "x", 0.0))
    sf = _events(tmp_path, rows)

    got = _df(cms_heavy_hitters(sf))
    assert got["user_id"].tolist() == [100]
    assert got["n_exact"].tolist() == [900]
    assert int(got["cms_est"].iloc[0]) >= 900  # CMS never underestimates


def test_cms_est_dominates_exact(ray_session, sf_dir):
    """On the real sf0.001 table: every row satisfies est >= exact, and
    every user whose exact count clears the threshold is present (the
    CMS no-false-negative guarantee)."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.sketches import (
        CMS_PHI_DEN, CMS_PHI_NUM, cms_heavy_hitters)

    got = _df(cms_heavy_hitters(sf_dir))
    assert (got["cms_est"] >= got["n_exact"]).all()

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    n = t.num_rows
    thresh = -(-n * CMS_PHI_NUM // CMS_PHI_DEN)
    uid, cnt = np.unique(t.column("user_id").to_numpy(), return_counts=True)
    true_heavy = set(uid[cnt >= thresh].tolist())
    assert true_heavy <= set(got["user_id"].tolist())


# ----------------------------------------------------- label_centroids


def test_label_centroids_planted(ray_session, tmp_path):
    """Two labels with hand-known means; exact micro-unit output."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.vectorstats import (
        EMB_DIM, label_centroids)

    v = np.zeros((4, EMB_DIM), dtype=np.float32)
    v[0, 0], v[1, 0] = 1.0, 3.0        # label 7, dim 1: mean 2.0
    v[2, 1], v[3, 1] = 0.5, 0.25       # label 9, dim 2: mean 0.375
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([row.tolist() for row in v],
                              pa.list_(pa.float32())),
        "label": pa.array([7, 7, 9, 9], pa.int32()),
    }), tmp_path / "embeddings.parquet")

    got = _df(label_centroids(str(tmp_path)))
    g = got.set_index(["label", "dim"]).sort_index()
    assert g.loc[(7, 1), "mean_micro"] == 2_000_000
    assert g.loc[(9, 2), "mean_micro"] == 375_000
    assert (g["n_vecs"] == 2).all()
    # off-dims are exactly zero for both labels
    assert g.loc[(7, 2), "mean_micro"] == 0
    assert g.loc[(9, 1), "mean_micro"] == 0
    assert len(g) == 2 * EMB_DIM


# ------------------------------------------------- percentiles_cont


def test_percentiles_cont_planted(ray_session, tmp_path):
    """n=4 values 10,20,30,40: every CONT_QS position interpolates to a
    hand-computed value (pos = (n-1)*q; v = lo + frac*(hi-lo))."""
    from nativeextractor_ray.pipelines.quantiles import (
        event_value_percentiles_cont)

    sf = _events(tmp_path, [
        (1, 1, 1000, "a", 10.0),
        (2, 1, 2000, "a", 30.0),
        (3, 2, 3000, "a", 20.0),
        (4, 2, 4000, "a", 40.0),
    ])
    got = _df(event_value_percentiles_cont(sf))
    by_q = {(r.q_num, r.q_den): r.pct_micro for r in got.itertuples()}
    assert by_q == {
        (1, 4): 17_500_000,    # pos 0.75 -> 10 + .75*(20-10)
        (1, 2): 25_000_000,    # pos 1.5  -> 20 + .5*(30-20)
        (3, 4): 32_500_000,    # pos 2.25 -> 30 + .25*(40-30)
        (9, 10): 37_000_000,   # pos 2.7  -> 30 + .7*(40-30)
        (99, 100): 39_700_000, # pos 2.97 -> 30 + .97*(40-30)
    }
