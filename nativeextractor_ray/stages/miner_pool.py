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

from nativeextractor_ray.miners.base import (
    Miner,
    filter_enclosed,
    make_miner,
    run_miners,
    sort_occurrences,
)
from nativeextractor_ray.occurrence import MENTIONS_SCHEMA
from nativeextractor_ray.sources.transcripts import DICT_NAMES


def _fast_scan_safe(miners: Sequence[Miner]) -> bool:
    """True iff every miner is safe for the joined-batch global scan:
    regex-family and email-FSM miners can't match across "\\n"; a
    dictionary miner qualifies when no dict word starts with a delimiter
    (so the BOF-quirk skip guard in _find_batch is airtight).  Glob,
    reference-dialect regex (`*` and `.` can cross the separator or depend
    on BOF/EOF anchors) and custom miners fall back to the per-row
    engine."""
    from nativeextractor_ray.miners.builtin import EmailMiner, _ReMiner
    from nativeextractor_ray.miners.ner import DictionaryMiner
    from nativeextractor_ray.unicode import is_delimiter

    for m in miners:
        if isinstance(m, DictionaryMiner):
            for k, _ in m.trie.items():
                if k and is_delimiter(k.decode("utf-8", "replace")[0]):
                    return False
        elif not isinstance(m, (_ReMiner, EmailMiner)):
            return False
    return True

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
        self._fast_ok = _fast_scan_safe(self.miners)

    def _find_batch(self, texts: list[str]) -> list[list]:
        """Per-row mention lists via ONE global scan per miner over the
        newline-joined batch.

        Exact-span equivalent of the per-row engine for fast-safe miners
        (asserted by tests/test_miner_pool_fastpath.py): no fast-safe
        miner can match across "\\n" (regex classes exclude whitespace or
        are digit/dot-only; the email FSM's char sets exclude \\n; NER
        tokens are \\S+), matches in different rows never interact through
        per-miner ``end_last``, and within-row scan order equals the
        per-row scan.  The NER BOF-delimiter quirk applies per row, so
        rows starting with a non-space delimiter are patched after the
        global scan (dict words never start with a delimiter — checked in
        ``_fast_scan_safe``)."""
        import numpy as np

        from nativeextractor_ray.miners.ner import DictionaryMiner
        from nativeextractor_ray.occurrence import Mention
        from nativeextractor_ray.unicode import byte_offsets, is_delimiter, to_byte_span

        joined = "\n".join(texts)
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        for i, t in enumerate(texts):
            starts[i + 1] = starts[i] + len(t) + 1
        row_start = starts[:-1]
        ascii_row = [t.isascii() for t in texts]
        off_cache: dict[int, list] = {}

        per_row: list[list] = [[] for _ in texts]

        def emit(miner, u0: int, u1: int, prob: float, r: int):
            lu0 = u0 - int(row_start[r])
            lu1 = u1 - int(row_start[r])
            if ascii_row[r]:
                pos, blen = lu0, lu1 - lu0
            else:
                o = off_cache.get(r)
                if o is None:
                    o = off_cache[r] = byte_offsets(texts[r])
                pos, blen = to_byte_span(o, lu0, lu1)
            per_row[r].append(
                Mention(miner.label, pos, lu0, blen, lu1 - lu0,
                        texts[r][lu0:lu1], prob)
            )

        for miner in self.miners:
            spans = miner.find(joined)
            if not spans:
                continue
            rows = np.searchsorted(
                starts, np.fromiter((s[0] for s in spans), dtype=np.int64,
                                    count=len(spans)),
                side="right",
            ) - 1
            if isinstance(miner, DictionaryMiner):
                # rows starting with a NON-SPACE delimiter: the per-row
                # scan trims that char off the first token (ner.c:24); the
                # global scan saw it only at joined[0].  The trimmed
                # mention starts at local position 1, before any other
                # token of the row, so emitting it first keeps row order.
                # row 0 needs no patch: joined[0] IS texts[0][0], so the
                # global scan already applied the quirk there
                quirk = {
                    r for r, t in enumerate(texts)
                    if r > 0 and t and is_delimiter(t[0]) and not t[0].isspace()
                }
                import re as _re

                for r in sorted(quirk):
                    t = texts[r]
                    m0 = _re.match(r"\S+", t)
                    tok = m0.group()[1:] if m0 else ""
                    if tok and miner.accepts(tok):
                        emit(miner, int(row_start[r]) + 1,
                             int(row_start[r]) + m0.end(), 1.0, r)
                for (u0, u1, prob), r in zip(spans, rows):
                    if int(r) in quirk and u0 == row_start[r]:
                        # untrimmed first token accepted globally — cannot
                        # happen for letter-first dictionaries (guarded in
                        # _fast_scan_safe); skip to stay row-equivalent
                        continue
                    emit(miner, int(u0), int(u1), prob, int(r))
            else:
                for (u0, u1, prob), r in zip(spans, rows):
                    emit(miner, int(u0), int(u1), prob, int(r))
        return per_row

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        carried_in = {c: batch.column(c).to_pylist() for c in self.carry}

        cols: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
        carried_out: dict[str, list] = {c: [] for c in self.carry}
        fast_rows = self._find_batch(texts) if self._fast_ok else None
        for r, text in enumerate(texts):
            if fast_rows is not None:
                found = fast_rows[r]
                if self.no_enclosed:
                    found = filter_enclosed(found)
                if self.sort:
                    found = sort_occurrences(found)
            else:
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
