"""Entity linking + canonicalization helpers.

Linking generalizes the reference's dictionary probe (trie search with the
≥0.75 prefix-ratio acceptance, ``/root/reference/src/ner.c:29-31``) into a
surface→canonical-entity assignment:

- Dict mentions link to the dictionary word with the longest common prefix
  (ties → lexicographically smallest word); acceptance uses the same ratio
  rule in bytes, so linking accepts exactly what the NER miner emitted.
- Email/Url/Date/Phone mentions canonicalize structurally (casefold, host
  extraction).

These are pure functions; actors hold the (broadcast) dictionary and a memo.
"""

from __future__ import annotations

import math
from typing import Iterable

from nativeextractor_ray.miners.ner import NER_THRESHOLD
from nativeextractor_ray.unicode import is_delimiter


def _lcp_bytes(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


class DictIndex:
    """Dictionary words indexed by first byte for fast best-match lookup."""

    def __init__(self, words: Iterable[str], threshold: float = NER_THRESHOLD):
        self.threshold = threshold
        self.by_first: dict[int, list[bytes]] = {}
        for w in sorted(set(words)):
            bs = w.encode("utf-8")
            if bs:
                self.by_first.setdefault(bs[0], []).append(bs)


def best_dict_match(token: str, index: DictIndex) -> str | None:
    """The word achieving max lcp with ``token`` if ratio ≥ threshold;
    ties broken toward the lexicographically smallest word (candidate lists
    are sorted).  Equivalent to: accept iff ∃w with the first
    ceil(threshold·len) bytes equal."""
    bs = token.encode("utf-8")
    if not bs:
        return None
    k = math.ceil(index.threshold * len(bs))
    best, best_lcp = None, -1
    for w in index.by_first.get(bs[0], ()):
        l = _lcp_bytes(bs, w)
        if l >= k and l > best_lcp:
            best, best_lcp = w, l
    return best.decode("utf-8") if best is not None else None


def normalize_surface(s: str) -> str:
    """Casefold and strip delimiter chars at both edges — the groupby key of
    the canonicalization shuffle."""
    s = s.casefold()
    i, j = 0, len(s)
    while i < j and is_delimiter(s[i]):
        i += 1
    while j > i and is_delimiter(s[j - 1]):
        j -= 1
    return s[i:j]


def entity_id(label: str, surface: str, index: DictIndex | None = None) -> str | None:
    """Canonical entity id for a mention, or None when unlikable."""
    if label == "Dict":
        if index is None:
            return None
        w = best_dict_match(surface, index)
        return f"person:{w}" if w else None
    if label == "Email":
        return f"email:{surface.casefold()}"
    if label == "Url":
        rest = surface.split("://", 1)
        host = rest[1].split("/", 1)[0] if len(rest) == 2 else surface
        return f"url:{host}"
    if label == "Date":
        return f"date:{surface}"
    if label == "Phone":
        return f"phone:{surface}"
    return None
