"""Miner framework: the reference's scan/extract semantics over one text.

Reference model (``/root/reference/src/extractor.c:36-100,205-261``): an
extractor owns N miners and one stream; ``next(batch)`` runs every miner at
every codepoint position of the window, subject to the per-miner skip rule
``pos >= max(pos_last, end_last)``; a matcher invocation may move the cursor
arbitrarily, and the scan resumes at the cursor when it advanced (else at
pos+1).  Per-miner non-overlap comes from ``end_last``
(``src/miner.c:35-51,271``).  Post-processing: optional enclosed-span filter
and (pos asc, len asc) sort (``src/extractor.c:102-203``).

Here the unit of text is one transcript turn (a table row) — a turn is never
split across batches, so the reference's cross-batch ``last_max`` suppression
(extractor.c:69-76) has no analogue and is intentionally absent.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from nativeextractor_ray.occurrence import Mention
from nativeextractor_ray.unicode import byte_offsets, to_byte_span

# A matcher invocation at codepoint position i returns:
#   (span | None, cursor, end_mark | None)
# where span = (u0, u1, prob), cursor = codepoint position of the stream
# cursor after the invocation, end_mark = codepoint position passed to
# mark_end during the invocation (may be set even on failure).
MatchResult = tuple[tuple[int, int, float] | None, int, int | None]
MatcherAt = Callable[[str, int], MatchResult]


def scan(text: str, matcher_at: MatcherAt) -> list[tuple[int, int, float]]:
    """Run one miner over a whole text — the per-(miner, batch) scan loop of
    ``thread_fn`` (extractor.c:55-93) with batch = the whole turn.

    Returns codepoint spans ``(u0, u1, prob)`` in scan order.
    """
    n = len(text)
    out: list[tuple[int, int, float]] = []
    i = 0
    pos_last = 0  # NULL pointers compare as offset 0 (extractor.c:59)
    end_last = 0
    while i < n:
        if i >= pos_last and i >= end_last:
            span, cursor, end_mark = matcher_at(text, i)
            # miner_c_run: pos_last = max(end, stream->pos) (miner.c:27)
            pos_last = max(end_mark or 0, cursor)
            if span is not None:
                # make_occurrence refuses spans starting before end_last
                # (miner.c:36-38,271); scan order already guarantees
                # span[0] >= end_last here, but keep the guard explicit.
                if span[0] >= end_last:
                    out.append(span)
                    end_last = span[1]
            # thread_fn: resume at the cursor when it advanced, else pos+1
            # (extractor.c:85-92)
            i = cursor if cursor > i else i + 1
        else:
            i += 1
    return out


class Miner:
    """Base class: a named matcher producing codepoint spans over one text.

    The reference's extension surface is ``.so`` modules exposing
    ``meta[] = {"fn", "Label", ..., NULL}`` and ``add_miner_so``
    (``src/miners/glob_entities.c:319-322``, ``src/extractor.c:307-401``);
    ours is this class + the registry below.
    """

    #: occurrence label (the reference stamps the miner name, miner.c:280)
    label: str = "Miner"

    def find(self, text: str) -> list[tuple[int, int, float]]:
        """Return codepoint spans (u0, u1, prob), honoring this miner's own
        non-overlap (end_last) semantics."""
        raise NotImplementedError

    def mentions(self, text: str, off=None) -> list[Mention]:
        """find() + byte/codepoint span math (miner.c:273-281)."""
        if off is None:
            off = byte_offsets(text)
        out = []
        for u0, u1, prob in self.find(text):
            pos, blen = to_byte_span(off, u0, u1)
            out.append(
                Mention(self.label, pos, u0, blen, u1 - u0, text[u0:u1], prob)
            )
        return out


def filter_enclosed(mentions: Sequence[Mention]) -> list[Mention]:
    """Drop spans properly enclosed in another span's byte interval; keep
    identical intervals with different labels (E_NO_ENCLOSED_OCCURRENCES,
    extractor.c:145-203, identical-span retention at :166-169).

    The reference's O(n²) pairwise marking is order-independent in effect:
    a span is dropped iff some *other* interval value properly contains it
    (every properly-enclosed span is properly enclosed by a maximal interval,
    and maximal intervals are never dropped).  We implement that in
    O(n log n) with a sweep.
    """
    if len(mentions) <= 1:
        return list(mentions)
    order = sorted(range(len(mentions)), key=lambda k: (mentions[k].pos, -mentions[k].len))
    keep: list[int] = []
    best_end = -1       # max end among spans earlier in sweep order
    best_end_pos = -1   # min pos achieving best_end
    for k in order:
        m = mentions[k]
        end = m.pos + m.len
        contained = best_end > end or (best_end == end and best_end_pos < m.pos)
        if not contained:
            keep.append(k)
        if end > best_end:
            best_end, best_end_pos = end, m.pos
    keep.sort()  # restore insertion order (filter precedes sort in reference)
    return [mentions[k] for k in keep]


def sort_occurrences(mentions: Iterable[Mention]) -> list[Mention]:
    """E_SORT_RESULTS: by pos asc then len asc (extractor.c:102-112 — the
    code wins over the README's 'descending').  The reference's qsort is
    unstable on full ties; we add label as a deterministic tiebreak."""
    return sorted(mentions, key=lambda m: (m.pos, m.len, m.label))


def run_miners(
    text: str,
    miners: Sequence[Miner],
    *,
    no_enclosed: bool = False,
    sort: bool = True,
) -> list[Mention]:
    """Run all miners over one text and post-process — the per-turn analogue
    of ``extractor->next(batch)`` (extractor.c:205-261)."""
    off = byte_offsets(text)
    found: list[Mention] = []
    for m in miners:
        found.extend(m.mentions(text, off))
    if no_enclosed:
        found = filter_enclosed(found)
    if sort:
        found = sort_occurrences(found)
    return found


# -- miner registry (the analogue of meta[] + add_miner_so, §2.9) ----------

_REGISTRY: dict[str, Callable[..., Miner]] = {}


def register_miner(name: str, factory: Callable[..., Miner]) -> None:
    _REGISTRY[name] = factory


def make_miner(name: str, *args, **kwargs) -> Miner:
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown miner {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
    return factory(*args, **kwargs)


def registered_miners() -> list[str]:
    return sorted(_REGISTRY)
