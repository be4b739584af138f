"""MinerPool — the actor-pool analogue of ``extractor_c`` + its miners.

The reference builds an extractor once (compiling tries / globs / regex
.so modules) and reuses it for unlimited inputs
(``/root/reference/src/extractor.c:517-564``, README "Native RegExps":
compile once, use unlimited times).  Here that economics maps to a callable
CLASS passed to ``ds.map_batches(MinerPool(...), concurrency=N,
batch_format="pyarrow")``: miners are compiled once per actor in
``__init__`` (from picklable specs — compiled automata hold closures that
must not cross process boundaries), and ``__call__`` processes one Arrow
batch per invocation, emitting one mention row per occurrence.

The reference runs miners on parallel threads *within* one scan window and
barriers on the slowest (extractor.c:236-239); at cluster scale the right
axis is parallelism across rows/blocks, so miners run sequentially per row
and Ray parallelizes across batches — no per-batch barrier, no straggler
coupling between miners.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from nativeextractor_ray.miners.base import Miner, make_miner, run_miners
from nativeextractor_ray.occurrence import MENTIONS_SCHEMA
from nativeextractor_ray.sources.transcripts import DICT_NAMES

# (miner_name_or_class, args, kwargs) — the config-driven pipeline assembly
# surface (the analogue of add_miner_so(path, symbol, params),
# extractor.c:307-401).  A registry NAME resolves against the registry *in
# the worker process* (built-ins register at import); a custom miner CLASS
# is shipped by value inside the spec — the distributed analogue of the
# reference's "load this .so on every node" plugin convention.
MinerSpec = tuple[str | type, tuple, dict]

#: the standard KG mention-detection set
STD_MINER_SPECS: list[MinerSpec] = [
    ("email", (), {}),
    ("url", (), {}),
    ("date", (), {}),
    ("phone", (), {}),
    ("ner", (DICT_NAMES,), {"label": "Dict"}),
]


def build_miners(specs: Sequence[MinerSpec]) -> list[Miner]:
    return [
        name(*args, **kwargs) if callable(name) else make_miner(name, *args, **kwargs)
        for name, args, kwargs in specs
    ]


class MinerPool:
    def __init__(
        self,
        specs: Sequence[MinerSpec] = tuple(STD_MINER_SPECS),
        *,
        no_enclosed: bool = False,
        sort: bool = True,
        carry: Sequence[str] = (),
    ):
        self.miners = build_miners(specs)
        self.no_enclosed = no_enclosed
        self.sort = sort
        self.carry = tuple(carry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        carried_in = {c: batch.column(c).to_pylist() for c in self.carry}

        cols: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
        carried_out: dict[str, list] = {c: [] for c in self.carry}
        for r, text in enumerate(texts):
            found = run_miners(
                text, self.miners, no_enclosed=self.no_enclosed, sort=self.sort
            )
            for m in found:
                cols["conv_id"].append(conv[r])
                cols["turn_idx"].append(turn[r])
                cols["label"].append(m.label)
                cols["pos"].append(m.pos)
                cols["upos"].append(m.upos)
                cols["len"].append(m.len)
                cols["ulen"].append(m.ulen)
                cols["surface"].append(m.surface)
                cols["prob"].append(m.prob)
                for c in self.carry:
                    carried_out[c].append(carried_in[c][r])

        arrays = [
            pa.array(cols[f.name], f.type) for f in MENTIONS_SCHEMA
        ]
        names = list(MENTIONS_SCHEMA.names)
        for c in self.carry:
            arrays.append(pa.array(carried_out[c], pa.string()))
            names.append(c)
        return pa.table(dict(zip(names, arrays)))
