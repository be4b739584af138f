"""Dictionary NER miner — reference semantics from
``/root/reference/src/ner.c:20-37``:

    anchor at a delimiter (consuming it) or at stream begin; consume the
    whole non-space token; search the dictionary trie with the token BYTES;
    accept iff matched-prefix-bytes / token-bytes >= 0.75, prob = 1.0.

Acceptance is a *prefix ratio*, not exact membership (ner.c:31): a token
that is a prefix of a dictionary word scores 1.0; ``alicexx`` vs ``alice``
scores 5/7 < 0.75 and is rejected.

Scan-order consequence (verified against extractor.c:55-93): after each
attempt the cursor sits at the end of the consumed non-space run and
``pos_last`` suppresses attempts inside it, so exactly the whitespace-
separated tokens are tested — except that a token at stream begin whose
first char is a (non-space) delimiter loses that first char to the anchor's
``match_delimiter(Right)`` move.  Both behaviors are reproduced.
"""

from __future__ import annotations

import re
from typing import Iterable

from nativeextractor_ray.miners.base import Miner, register_miner
from nativeextractor_ray.state.patricia import PatriciaTrie
from nativeextractor_ray.unicode import is_delimiter

_TOKEN_RE = re.compile(r"\S+")

NER_THRESHOLD = 0.75  # ner.c:31


class DictionaryMiner(Miner):
    """patricia_miner_c / ner_c analogue (src/patricia_miner.c:20-32,
    src/ner.c:43-53): a miner owning a dictionary trie."""

    def __init__(
        self,
        words: Iterable[str] | PatriciaTrie,
        label: str = "NER",
        threshold: float = NER_THRESHOLD,
    ):
        self.trie = words if isinstance(words, PatriciaTrie) else PatriciaTrie(words)
        self.label = label
        self.threshold = threshold
        self._memo: dict[str, bool] = {}
        # An ASCII-first-char token can only reach prefix-ratio > 0 if some
        # dictionary word starts with that exact char (byte == char for
        # ASCII), so it can be rejected O(1) before the trie/memo — most
        # tokens on natural text.  Non-ASCII first chars bypass the filter:
        # partial lead-byte matches inside one multi-byte char can still
        # reach the ratio (e.g. 3 of 4 bytes = 0.75).
        self._first = frozenset(
            k.decode("utf-8", "replace")[0] for k, _ in self.trie.items() if k
        ) if threshold > 0 else None

    def accepts(self, token: str) -> bool:
        v = self._memo.get(token)
        if v is None:
            bs = token.encode("utf-8")
            v = bool(bs) and self.trie.search(bs) / len(bs) >= self.threshold
            if len(self._memo) < 1_000_000:  # bounded memo per actor
                self._memo[token] = v
        return v

    def find(self, text: str):
        out = []
        accepts = self.accepts
        first = self._first
        for m in _TOKEN_RE.finditer(text):
            s, e = m.span()
            tok = m.group()
            if s == 0 and is_delimiter(text[0]):
                # BOF anchor consumes the leading delimiter (ner.c:24 via
                # MATCH_DELIMITER(e, Left, Right))
                s += 1
                tok = tok[1:]
                if not tok:
                    continue
            c0 = tok[0]
            if first is not None and c0 not in first and c0 <= "\x7f":
                continue
            if accepts(tok):
                out.append((s, e, 1.0))
        return out


register_miner("ner", DictionaryMiner)
register_miner("match_named_entity", DictionaryMiner)
