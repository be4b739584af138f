"""User-extension surface (SURVEY.md §2.9) — the analogue of the
reference's "Hello miner" README example and the `.so` + meta[] plugin
convention: subclass Miner, register it, assemble a pipeline from specs,
run it through the MinerPool actor stage end-to-end.

The distributed test uses the packaged example miner
(nativeextractor_ray.miners.examples.ShoutMiner): a custom miner class
must live in a module the worker processes can import — the analogue of
installing the reference's .so on every node.  (A class defined in a pytest
test module is NOT importable by workers; that's the documented constraint,
not a bug.)"""

import pyarrow as pa

from nativeextractor_ray.miners.base import (
    Miner,
    make_miner,
    register_miner,
    registered_miners,
    run_miners,
)
from nativeextractor_ray.miners.examples import ShoutMiner


class LocalDashMiner(Miner):
    """Driver-local custom miner (registry path, no distribution)."""

    label = "Dash"

    def find(self, text: str):
        return [(i, i + 1, 1.0) for i, c in enumerate(text) if c == "-"]


def test_register_and_make():
    register_miner("dash", LocalDashMiner)
    assert "dash" in registered_miners()
    m = make_miner("dash")
    found = run_miners("a-b c-d", [m])
    assert [(f.pos, f.surface) for f in found] == [(1, "-"), (5, "-")]


def test_example_shout_miner_registered():
    assert "shout" in registered_miners()
    found = run_miners("NO way YES ok HM", [make_miner("shout", min_len=3)])
    assert [(f.surface, f.pos) for f in found] == [("YES", 7)]
    assert all(f.label == "Shout" for f in found)


def test_custom_miner_through_minerpool(ray_session):
    import ray.data

    from nativeextractor_ray.stages.miner_pool import MinerPool

    t = pa.table({
        "conv_id": pa.array(["c1", "c1"]),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "text": pa.array(["hello WORLD", "ALL CAPS here"]),
    })
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        MinerPool,
        fn_constructor_args=([(ShoutMiner, (), {})],),  # class ships by ref
        batch_format="pyarrow",
        batch_size=16,
        concurrency=1,
    ).take_all()
    surfaces = sorted(r["surface"] for r in out)
    assert surfaces == ["ALL", "CAPS", "WORLD"]
    # spans are byte/codepoint-correct for the custom miner too
    world = next(r for r in out if r["surface"] == "WORLD")
    assert world["pos"] == 6 and world["len"] == 5 and world["upos"] == 6
