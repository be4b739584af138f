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
        self._dict_memo: dict[str, str | None] = {}
        # fast-path applicability: entity extraction needs only the SET of
        # (label, surface) per turn — no span bookkeeping — so the standard
        # miner set can scan a whole batch joined with "\n" in single
        # C-level regex passes (no miner of the std set can match across a
        # newline: regex classes exclude \s / digits only, the email FSM
        # chars exclude \n, NER tokens are \S+).  Custom specs fall back to
        # the per-row parity engine.
        self._fast = [name for name, a, k in specs] == [
            name for name, a, k in STD_MINER_SPECS
        ]
        if self._fast:
            import re

            from nativeextractor_ray.miners.builtin import EmailMiner

            self._email = EmailMiner()
            # dict-candidate tokens filtered by the regex engine itself: a
            # token can only link if its first char starts some dictionary
            # word.  Only valid when every dict word starts ASCII (for
            # multi-byte first chars a partial lead-byte match can still
            # reach the 0.75 ratio — see miners/ner.py); BOF-delimiter
            # quirk rows are disjoint (dict chars are letters) and handled
            # per-row.
            firsts = {
                w.decode("utf-8")[0]
                for lst in self.index.by_first.values()
                for w in lst
            }
            if firsts and all(ord(c) < 128 for c in firsts):
                chars = re.escape("".join(sorted(firsts)))
                self._cand_re = re.compile(rf"(?<!\S)[{chars}]\S*")
            else:
                self._cand_re = re.compile(r"\S+")

    def turn_entities(self, text: str) -> list[str]:
        """Distinct canonical entities mentioned in one turn, sorted."""
        ents = set()
        for m in run_miners(text, self.miners, sort=False):
            e = entity_id(m.label, m.surface, self.index)
            if e:
                ents.add(e)
        return sorted(ents)

    def batch_entities(self, texts: list[str]) -> list[list[str]]:
        """Per-row sorted distinct entities for a whole batch.

        Equivalent to ``[turn_entities(t) for t in texts]`` for the
        standard miner set (asserted by tests/test_kg_fastpath.py and the
        triples oracle); one pass per miner over the joined text instead
        of len(texts) Python-level scans."""
        if not self._fast:
            return [self.turn_entities(t) for t in texts]
        import re

        import numpy as np

        from nativeextractor_ray.functions.linking import best_dict_match
        from nativeextractor_ray.miners.builtin import (
            DateMiner, EmailMiner, PhoneMiner, UrlMiner,
        )
        from nativeextractor_ray.unicode import is_delimiter

        joined = "\n".join(texts)
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        for i, t in enumerate(texts):
            offsets[i + 1] = offsets[i] + len(t) + 1
        row_starts = offsets[:-1]

        ents: list[set] = [set() for _ in texts]

        def rows_for(starts: list[int]) -> np.ndarray:
            # ONE vectorized searchsorted per miner — a scalar call per
            # match costs more than the regex scan itself
            return np.searchsorted(offsets, np.asarray(starts, dtype=np.int64),
                                   side="right") - 1

        matches = [(mt.start(), mt.group()) for mt in re.finditer(UrlMiner.pattern, joined)]
        if matches:
            for r, (_, s) in zip(rows_for([m[0] for m in matches]), matches):
                rest = s.split("://", 1)
                host = rest[1].split("/", 1)[0] if len(rest) == 2 else s
                ents[r].add(f"url:{host}")
        matches = [(mt.start(), mt.group()) for mt in re.finditer(
            DateMiner.scan_pattern or DateMiner.pattern, joined)]
        if matches:
            for r, (_, s) in zip(rows_for([m[0] for m in matches]), matches):
                ents[r].add(f"date:{s}")
        matches = [(mt.start(), mt.group()) for mt in re.finditer(PhoneMiner.pattern, joined)]
        if matches:
            for r, (_, s) in zip(rows_for([m[0] for m in matches]), matches):
                ents[r].add(f"phone:{s}")
        # email keeps the reference FSM semantics (not a regex rendering)
        spans = self._email.find(joined)
        if spans:
            for r, (s, e, _) in zip(rows_for([sp[0] for sp in spans]), spans):
                ents[r].add(f"email:{joined[s:e].casefold()}")

        memo = self._dict_memo
        index = self.index

        def link(tok: str, r: int) -> None:
            if tok in memo:
                w = memo[tok]
            else:
                w = best_dict_match(tok, index)
                if len(memo) < 1_000_000:
                    memo[tok] = w
            if w is not None:
                ents[r].add(f"person:{w}")

        toks = [(mt.start(), mt.group()) for mt in self._cand_re.finditer(joined)]
        if toks:
            for (s, tok), r in zip(toks, rows_for([t[0] for t in toks])):
                link(tok, r)
        # per-row BOF quirk: the NER anchor consumes a leading NON-SPACE
        # delimiter (ner.c:24); such first tokens start with punctuation,
        # so the candidate regex skipped them — handle those rows directly
        for r, txt in enumerate(texts):
            if txt and is_delimiter(txt[0]) and not txt[0].isspace():
                tok = txt[1:].split(None, 1)[0] if txt[1:].strip() else ""
                if tok and len(txt) > 1 and not txt[1].isspace():
                    link(tok, r)

        return [sorted(s) for s in ents]

    #: max rows processed per internal slice.  ``__call__`` must accept
    #: arbitrarily large blocks (a fused upstream explode stage can hand it
    #: a whole multi-100k-row block: batch_size on a fused stage applies to
    #: PRE-explosion row counts), but the transient working set — the
    #: per-batch combine dict, its millions of key strings, the joined scan
    #: buffers — must stay bounded: at ~400k-row calls the fresh-page
    #: allocation cost dominated compute 15× with 16 concurrent workers
    #: (first-touch page faults; same pathology as the minhash pair gather),
    #: 6.4M turns measured 27k turns/s un-sliced vs ~250k sliced.
    SLICE_ROWS = 65536

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows > self.SLICE_ROWS:
            # duplicate (subj, pred, obj) partials across slices are fine:
            # every consumer combines via groupby(part) downstream
            return pa.concat_tables([
                self._extract(batch.slice(lo, self.SLICE_ROWS))
                for lo in range(0, batch.num_rows, self.SLICE_ROWS)
            ])
        return self._extract(batch)

    def _extract(self, batch: pa.Table) -> pa.Table:
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
        all_ents = self.batch_entities(text)
        for r in range(len(text)):
            seen = f"{conv[r]}#{turn[r]:09d}"
            if tool[r]:
                emit(f"conv:{conv[r]}", "uses_tool", f"tool:{tool[r]}", seen)
            ents = all_ents[r]
            speaker = f"speaker:{conv[r]}/{role[r]}"
            for e in ents:
                emit(speaker, "mentions", e, seen)
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    emit(ents[i], "co_occurs_with", ents[j], seen)

        from nativeextractor_ray.functions.hashing import stable_part

        keys = list(acc.keys())
        out = pa.table(
            {
                "subj": pa.array([k[0] for k in keys], pa.string()),
                "pred": pa.array([k[1] for k in keys], pa.string()),
                "obj": pa.array([k[2] for k in keys], pa.string()),
                "support": pa.array([acc[k][0] for k in keys], pa.int64()),
                "first_seen": pa.array([acc[k][1] for k in keys], pa.string()),
                "prob": pa.array([1.0] * len(keys), pa.float32()),
            }
        )
        # process-stable partition key for the downstream coarse combine
        # (builtin hash() is salted per process and would split keys)
        return out.append_column("part", stable_part(out, ["subj", "pred", "obj"], 256))
