"""KgExtract — fused mention-detect + link + triple-emit actor stage.

One pass over transcript rows produces *pre-aggregated* triple partials:
while a turn is in hand we emit its role/tool-aware predicates and combine
duplicates within the batch (a per-batch combiner), so the global
``groupby((subj, pred, obj))`` dedup shuffles partial counts instead of raw
occurrences — the pre-aggregate-before-shuffle pattern that keeps the wide
step small at 10^12-turn scale.

Predicates (north-star role/tool-aware set):
- (conv:<conv_id>,            uses_tool,       tool:<tool>)   when tool != ''
- (speaker:<conv_id>/<role>,  mentions,        <entity>)      per distinct
  entity per turn
- (<entity_a>,                co_occurs_with,  <entity_b>)    per unordered
  distinct entity pair within one turn, a < b

``support`` counts turns; ``first_seen`` is the minimal
``conv_id#turn_idx`` provenance key (zero-padded so string order == turn
order); ``prob`` is 1.0 (all std miners emit 1.0, naive_email_miner.c:140).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from nativeextractor_ray.functions.linking import DictIndex, entity_id
from nativeextractor_ray.miners.base import run_miners
from nativeextractor_ray.sources.transcripts import DICT_NAMES
from nativeextractor_ray.stages.miner_pool import STD_MINER_SPECS, MinerSpec, build_miners

TRIPLE_PARTIAL_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("support", pa.int64()),
        ("first_seen", pa.string()),
        ("prob", pa.float32()),
    ]
)


class KgExtract:
    def __init__(
        self,
        specs: Sequence[MinerSpec] = tuple(STD_MINER_SPECS),
        dict_words: Sequence[str] = tuple(DICT_NAMES),
    ):
        self.miners = build_miners(specs)
        self.index = DictIndex(dict_words)

    def turn_entities(self, text: str) -> list[str]:
        """Distinct canonical entities mentioned in one turn, sorted."""
        ents = set()
        for m in run_miners(text, self.miners, sort=False):
            e = entity_id(m.label, m.surface, self.index)
            if e:
                ents.add(e)
        return sorted(ents)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        role = batch.column("role").to_pylist()
        text = batch.column("text").to_pylist()
        tool = batch.column("tool").to_pylist()

        # (subj, pred, obj) -> [support, first_seen]
        acc: dict[tuple[str, str, str], list] = {}

        def emit(s: str, p: str, o: str, seen: str):
            cur = acc.get((s, p, o))
            if cur is None:
                acc[(s, p, o)] = [1, seen]
            else:
                cur[0] += 1
                if seen < cur[1]:
                    cur[1] = seen
        for r in range(len(text)):
            seen = f"{conv[r]}#{turn[r]:09d}"
            if tool[r]:
                emit(f"conv:{conv[r]}", "uses_tool", f"tool:{tool[r]}", seen)
            ents = self.turn_entities(text[r])
            speaker = f"speaker:{conv[r]}/{role[r]}"
            for e in ents:
                emit(speaker, "mentions", e, seen)
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    emit(ents[i], "co_occurs_with", ents[j], seen)

        import zlib

        keys = list(acc.keys())
        # process-stable partition key for the downstream coarse combine
        # (builtin hash() is salted per process and would split keys)
        part = [
            zlib.crc32(f"{k[0]}\x00{k[1]}\x00{k[2]}".encode()) % 256 for k in keys
        ]
        return pa.table(
            {
                "subj": pa.array([k[0] for k in keys], pa.string()),
                "pred": pa.array([k[1] for k in keys], pa.string()),
                "obj": pa.array([k[2] for k in keys], pa.string()),
                "support": pa.array([acc[k][0] for k in keys], pa.int64()),
                "first_seen": pa.array([acc[k][1] for k in keys], pa.string()),
                "prob": pa.array([1.0] * len(keys), pa.float32()),
                "part": pa.array(part, pa.int64()),
            }
        )
