"""Planted-fixture tests for the window operators (event_gaps,
user_running_value) — SQL-window semantics beyond the sf0.001 oracle
parity gate: timestamp ties broken by event_id, single-event users
excluded from gaps, per-user cumulative isolation across the hash
shuffle, and exact integer-microsecond arithmetic."""

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


def _events_dir(tmp_path) -> str:
    import pyarrow.parquet as pq

    # user 1: three events, one ts tie (event_id breaks order);
    # user 2: single event (must NOT appear in event_gaps);
    # user 3: two events 1us apart (minimal gap resolution).
    ts = pa.array(
        [1_000_000, 1_000_000, 4_500_000, 9_000_000, 7_000_000, 7_000_001],
        pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array([11, 10, 12, 20, 30, 31], pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "event_type": pa.array(["a"] * 6),
        "value": pa.array([1.005, 2.0, 0.335, 4.0, 10.0, 0.5]),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_event_gaps_planted(ray_session, tmp_path):
    from nativeextractor_ray.pipelines.windows import event_gaps

    got = _df(event_gaps(_events_dir(tmp_path))).sort_values(
        "user_id").reset_index(drop=True)
    # user 1 window order: (ts=1e6,eid=10), (ts=1e6,eid=11), (ts=4.5e6,eid=12)
    # -> gaps 0 (the tie) and 3_500_000; user 2 has one event -> no row
    want = pd.DataFrame({
        "user_id": [1, 3],
        "n_gaps": [2, 1],
        "max_gap_us": [3_500_000, 1],
        "sum_gap_us": [3_500_000, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_running_value_planted(ray_session, tmp_path):
    from nativeextractor_ray.pipelines.windows import user_running_value

    got = _df(user_running_value(_events_dir(tmp_path))).sort_values(
        ["user_id", "cum_cents"]).reset_index(drop=True)
    # half-up integer-cent rounding: 1.005 -> 101? np.round is banker's on
    # .5 in binary, but 1.005*100 = 100.49999... in float64 -> 100;
    # the oracle replays the identical float64 round, so we assert the
    # engine's own arithmetic here: cum over window order per user.
    assert list(got["user_id"]) == [1, 1, 1, 2, 3, 3]
    u1 = got[got.user_id == 1]
    # order by (ts,event_id): eid 10 (2.00), eid 11 (1.005), eid 12 (0.335)
    by_eid = {int(r.event_id): int(r.cum_cents) for r in u1.itertuples()}
    assert by_eid[10] == 200
    assert by_eid[11] == 200 + round(np.float64(1.005) * 100)
    assert by_eid[12] == by_eid[11] + round(np.float64(0.335) * 100)
    u3 = got[got.user_id == 3].set_index("event_id")["cum_cents"]
    assert int(u3.loc[30]) == 1000 and int(u3.loc[31]) == 1050


def test_windows_user_cohesion_many_partitions(ray_session, tmp_path):
    """200 users x 5 events scattered across input blocks: each user's
    cumulative column must equal the pandas groupby replay exactly —
    proves the hash shuffle keeps every user whole."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.windows import user_running_value

    rng = np.random.default_rng(7)
    n = 1000
    uid = rng.integers(0, 200, n)
    ts_us = rng.integers(0, 10**9, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["a"] * n),
        "value": pa.array(rng.uniform(0, 100, n).round(2)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = _df(user_running_value(str(tmp_path))).sort_values(
        "event_id").reset_index(drop=True)

    df = t.to_pandas()
    df["cents"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["cum_cents"] = df.groupby("user_id")["cents"].cumsum()
    want = df[["event_id", "user_id", "cum_cents"]].sort_values(
        "event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_value_rank_ntile_edges(ray_session, tmp_path):
    """7 rows, 10 buckets (q=0: every row its own bucket) and 7 rows,
    3 buckets (sizes 3/2/2 per the SQL standard), with tied values
    broken by event_id."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.windows import event_value_rank

    n = 7
    pq.write_table(pa.table({
        "event_id": pa.array([5, 3, 1, 2, 4, 7, 6], pa.int64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["a"] * n),
        # two ties at 2.0 -> order among them by event_id
        "value": pa.array([2.0, 2.0, 1.0, 3.0, 0.5, 9.0, 4.0]),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")

    got10 = _df(event_value_rank(str(tmp_path), ntiles=10)).sort_values(
        "rn").reset_index(drop=True)
    # order: (50,4) (100,1) (200,3) (200,5) (300,2) (400,6) (900,7)
    assert list(got10["event_id"]) == [4, 1, 3, 5, 2, 6, 7]
    assert list(got10["bucket"]) == [1, 2, 3, 4, 5, 6, 7]

    got3 = _df(event_value_rank(str(tmp_path), ntiles=3)).sort_values(
        "rn").reset_index(drop=True)
    assert list(got3["bucket"]) == [1, 1, 1, 2, 2, 3, 3]


def test_user_rolling_sum_planted(ray_session, tmp_path):
    """Hand-computed k=2 windows: a 5-event user whose windows saturate
    at k+1 rows, a 1-event user (window = itself), ties by event_id."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.windows import user_rolling_sum

    ts = pa.array([1, 1, 2, 3, 4, 9], pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array([11, 10, 12, 13, 14, 20], pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a"] * 6),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 7.0]),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = _df(user_rolling_sum(str(tmp_path), k=2)).sort_values(
        ["user_id", "event_id"]).reset_index(drop=True)
    # user 1 window order by (ts, event_id): eid 10(200), 11(100),
    # 12(300), 13(400), 14(500); k=2 rolling sums:
    # 10: 200; 11: 200+100=300; 12: 200+100+300=600;
    # 13: 100+300+400=800; 14: 300+400+500=1200; user 2: 700
    want = pd.DataFrame({
        "event_id": [10, 11, 12, 13, 14, 20],
        "user_id": [1, 1, 1, 1, 1, 2],
        "roll_cents": [200, 300, 600, 800, 1200, 700],
    })
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "roll_cents"]], want,
        check_dtype=False)


def test_new_users_daily_planted(ray_session, tmp_path):
    """Three users first seen across two days (one user's LATER events on
    a later day must not re-count them); cumulative is a prefix sum."""
    import pyarrow.parquet as pq

    from nativeextractor_ray.pipelines.windows import new_users_daily

    day = 86_400_000_000
    ts = pa.array([10, day + 5, 20, 2 * day + 1, 2 * day + 2],
                  pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["a"] * 5),
        "value": pa.array([0.0] * 5),
        "props": pa.array(["{}"] * 5),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = _df(new_users_daily(str(tmp_path))).reset_index(drop=True)
    assert list(got["new_users"]) == [2, 1]
    assert list(got["cum_users"]) == [2, 3]
    import datetime

    assert list(got["day"]) == [datetime.date(1970, 1, 1),
                                datetime.date(1970, 1, 3)]
