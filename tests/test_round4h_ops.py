"""Planted fixtures for the round-4h temporal-KG operators: entity
timeline and user→assistant adoption.  The fixtures drive the real
extraction stack over hand-built transcripts via the in-memory
buffer-source path (``ray.data.from_arrow``)."""

import numpy as np
import pandas as pd
import pyarrow as pa


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


def _transcripts(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([""] * len(rows), pa.string()),
        "ts": pa.array([np.datetime64(r[4], "us") for r in rows],
                       pa.timestamp("us")),
    })


def _run_timeline(tbl):
    import ray.data

    from nativeextractor_ray.pipelines import kg

    class _Fake:
        pass

    # drive the op's internals directly over an in-memory Dataset by
    # monkey-free composition: replicate entity_timeline's stages on the
    # extraction class it uses
    from nativeextractor_ray.stages.kg_extract import KgExtract

    ds = ray.data.from_arrow(tbl)

    class EntityTurnsCtx(KgExtract):
        def _extract(self, batch):
            import pyarrow.compute as pc

            conv = batch.column("conv_id").to_pylist()
            turn = batch.column("turn_idx").to_pylist()
            role = batch.column("role").to_pylist()
            ts = pc.cast(batch.column("ts"), pa.int64()).to_pylist()
            text = batch.column("text").to_pylist()
            out = {k: [] for k in
                   ("conv_id", "turn_idx", "role", "ts_us", "ent")}
            for r, ents in enumerate(self.batch_entities(text)):
                for e in ents:
                    out["conv_id"].append(conv[r])
                    out["turn_idx"].append(turn[r])
                    out["role"].append(role[r])
                    out["ts_us"].append(ts[r])
                    out["ent"].append(e)
            return pa.table({
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "turn_idx": pa.array(out["turn_idx"], pa.int32()),
                "role": pa.array(out["role"], pa.string()),
                "ts_us": pa.array(out["ts_us"], pa.int64()),
                "ent": pa.array(out["ent"], pa.string())})

    return ds.map_batches(EntityTurnsCtx(), batch_format="pyarrow",
                          batch_size=None)


def test_entity_timeline_planted(ray_session, tmp_path):
    """An email entity mentioned on two days has n_days=2 and exact
    first/last instants; day bucketing is UTC epoch-day."""
    tbl = _transcripts([
        ("c1", 0, "user", "mail bob@x.com now", "2024-01-01T10:00:00"),
        ("c1", 1, "assistant", "ok bob@x.com", "2024-01-02T11:00:00"),
        ("c2", 0, "user", "nothing here", "2024-01-03T00:00:00"),
    ])
    ds = _run_timeline(tbl)
    df = _df(ds)
    sub = df[df["ent"] == "email:bob@x.com"]
    assert len(sub) == 2
    # per-entity rollup semantics the op applies:
    days = (sub["ts_us"] // 86_400_000_000).nunique()
    assert days == 2
    assert sub["ts_us"].min() == int(np.datetime64(
        "2024-01-01T10:00:00", "us").astype(np.int64))


def test_entity_adoption_planted(ray_session):
    """Adoption requires the user turn STRICTLY before the assistant
    turn for the same entity in the same conversation."""
    tbl = _transcripts([
        # c1: user introduces, assistant echoes → adopted
        ("c1", 0, "user", "ping bob@x.com", "2024-01-01T00:00:00"),
        ("c1", 1, "assistant", "done bob@x.com", "2024-01-01T00:01:00"),
        # c2: assistant first → NOT adopted (still counted as a conv)
        ("c2", 0, "assistant", "try bob@x.com", "2024-01-01T00:00:00"),
        ("c2", 1, "user", "ok bob@x.com", "2024-01-01T00:01:00"),
        # c3: user only → not adopted
        ("c3", 0, "user", "see bob@x.com", "2024-01-01T00:00:00"),
    ])
    ds = _run_timeline(tbl)
    df = _df(ds)
    SENT = np.iinfo(np.int64).max
    df["u"] = np.where(df["role"] == "user", df["turn_idx"], SENT)
    df["a"] = np.where(df["role"] == "assistant", df["turn_idx"], SENT)
    g = df[df["ent"] == "email:bob@x.com"].groupby("conv_id").agg(
        u=("u", "min"), a=("a", "min"))
    adopted = ((g["u"] != SENT) & (g["a"] != SENT)
               & (g["u"] < g["a"])).sum()
    assert len(g) == 3 and adopted == 1


def test_entity_timeline_matches_adoption_universe(ray_session):
    """entity_timeline and entity_adoption see the same entity universe
    at sf0.001 (both ride entity_turn_role_ts_dataset)."""
    from nativeextractor_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"
    tl = _df(kg.entity_timeline(sf))
    ad = _df(kg.entity_adoption(sf))
    assert set(tl["entity_id"]) == set(ad["entity_id"])
    assert (tl["n_days"] >= 1).all()
    assert (tl["last_us"] >= tl["first_us"]).all()
    assert (ad["n_adopted"] <= ad["n_convs"]).all()
