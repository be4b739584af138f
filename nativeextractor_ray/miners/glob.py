"""Glob miner with reference-parity semantics.

Faithful re-expression of ``match_glob_impl``
(``/root/reference/src/miners/glob_entities.c:124-260``) as a compiled
interpreter over Python strings (codepoint cursor), including the
reference's observable quirks:

- **case-insensitive per character**: a stream char matches a glob char c
  iff it equals ``tolower(c)`` or ``toupper(c)`` (glob_entities.c:40-55);
  character ranges are expanded per codepoint and matched case-insensitively
  too (:70-78);
- **token alignment**: unless the glob "starts with a delimiter" the scan
  first skips delimiters to the next token start (:130-133); the match must
  end at a delimiter or EOF (:257); note ``starts_with_delimiter`` returns
  true for *any* glob beginning with ``[`` because the set scan starts on the
  ``[`` itself, which is punctuation (:80-121) — reproduced as-is;
- **failure skips the rest of the token**: ``retnul`` moves past the next
  delimiter (:29-37);
- ``?`` matches exactly one non-delimiter (:57-63); ``*`` at the end of the
  glob consumes to the end of the token (:153-159); ``*`` elsewhere is a
  lazy recursive tail-match that never crosses a delimiter itself but whose
  tail re-enters the full matcher (token skip included), so ``a*b`` can span
  ``"a b"`` (:161-191);
- inside ``[...]`` a bare ``\\`` *also* matches a literal backslash before
  escaping the next char (the set loop probes the backslash char itself,
  :198-225) — reproduced;
- a range with no left operand (``[-a]``) crashes the reference
  (``match_range(NULL, ..)``); we raise ``ValueError`` at compile time
  instead (documented divergence).

Glob syntax validation mirrors ``is_glob`` (:263-308).
"""

from __future__ import annotations

from typing import NamedTuple

from nativeextractor_ray.miners.base import Miner, register_miner
from nativeextractor_ray.unicode import is_delimiter

_RANGE_CAP = 0x20000  # sanity cap on expanded [a-b] ranges


def _single_lower(c: str) -> str:
    lo = c.lower()
    return lo if len(lo) == 1 else c


def _single_upper(c: str) -> str:
    up = c.upper()
    return up if len(up) == 1 else c


def _ci(c: str) -> frozenset[str]:
    """Chars accepted for glob char c (glob_entities.c:40-55)."""
    return frozenset((_single_lower(c), _single_upper(c)))


def is_glob(glob: str) -> bool:
    """Syntactic validation (glob_entities.c:263-308)."""
    brackets = 0
    escape = False
    prelast: str | None = None
    last: str | None = None
    for p in glob:
        if escape:
            escape = False
            prelast, last = last, p
            continue
        if p == "-":
            if brackets > 0 and (last == "-" or prelast == "-"):
                return False
        elif p == "\\":
            escape = True
        elif p == "[":
            brackets += 1
        elif p == "]":
            brackets -= 1
            if brackets < 0:
                return False
        prelast, last = last, p
    return brackets == 0


def _starts_with_delimiter(glob: str) -> bool:
    """glob_entities.c:80-121, quirks included (see module docstring)."""
    if not glob:
        return True  # C reads the NUL terminator, which is_delimiter(cntrl)
    c = glob[0]
    if c == "[":
        return True  # the C scan tests the '[' itself first — always punct
    if c in "*?":
        return False
    if c == "\\":
        return is_delimiter(glob[1]) if len(glob) > 1 else True
    return is_delimiter(c)


class _Seq(NamedTuple):
    ops: tuple          # ('lit', accept) | ('any',) | ('set', accept) |
    #                     ('star_last',) | ('star', _Seq)  (always terminal)
    swd: bool           # starts_with_delimiter of this raw suffix


def _parse_set(glob: str, r: int) -> tuple[frozenset[str], int]:
    """Parse a [...] set starting just after '[' at index r; returns the
    accept-char set and the index just past ']'.  Mirrors the do/while at
    glob_entities.c:198-225 including the backslash-probe quirk."""
    accept: set[str] = set()
    last_ch: str | None = None
    while True:
        if r >= len(glob):
            raise ValueError("unterminated [ set")
        ch = glob[r]
        if last_ch == "\\":
            accept |= _ci(ch)
        elif ch == "-":
            if last_ch is None:
                raise ValueError(
                    "range with no left operand (the reference crashes here)"
                )
            if r + 1 >= len(glob):
                raise ValueError("unterminated range")
            lo, hi = ord(last_ch), ord(glob[r + 1])
            if hi - lo > _RANGE_CAP:
                raise ValueError("range too large")
            for cp in range(lo, hi + 1):
                accept |= _ci(chr(cp))
            r += 1  # throw away dash; now on the 'to' char
            ch = glob[r]
            accept |= set()  # ('to' char alone is never probed — C parity)
        else:
            accept |= _ci(ch)
        last_ch = ch
        r += 1
        if r < len(glob) and glob[r] == "]" and last_ch != "\\":
            return frozenset(accept), r + 1
        if r >= len(glob):
            raise ValueError("unterminated [ set")


def _compile(glob: str) -> _Seq:
    ops: list = []
    swd = _starts_with_delimiter(glob)
    r = 0
    n = len(glob)
    while r < n:
        c = glob[r]
        if c == "*":
            if r + 1 == n:
                ops.append(("star_last",))
                r += 1
            else:
                ops.append(("star", _compile(glob[r + 1:])))
                r = n  # tail lives in the child seq
        elif c == "[":
            accept, r2 = _parse_set(glob, r + 1)
            ops.append(("set", accept))
            r = r2
        elif c == "\\":
            if r + 1 >= n:
                raise ValueError("dangling escape")
            ops.append(("lit", _ci(glob[r + 1])))
            r += 2
        elif c == "?":
            ops.append(("any",))
            r += 1
        else:
            ops.append(("lit", _ci(c)))
            r += 1
    return _Seq(tuple(ops), swd)


def _skip_fail(text: str, i: int) -> int:
    """retnul (glob_entities.c:29-37): skip non-delimiters, then consume one
    delimiter; returns the resulting cursor."""
    n = len(text)
    while i < n and not is_delimiter(text[i]):
        i += 1
    return i + 1 if i < n else i


# result: (matched, start, end_mark, cursor)
_FAIL = (False, None, None)


def _run_seq(text: str, i: int, seq: _Seq):
    n = len(text)
    if not seq.swd:
        # skip to next token (glob_entities.c:130-133)
        while i < n and is_delimiter(text[i]):
            i += 1
    if i >= n:
        return (False, None, None, i)  # retnul(!can_move) — no-op skip at EOF
    start = i
    for op in seq.ops:
        kind = op[0]
        if kind == "lit" or kind == "set":
            if i < n and text[i] in op[1]:
                i += 1
            else:
                return (False, None, None, _skip_fail(text, i))
        elif kind == "any":
            if i < n and not is_delimiter(text[i]):
                i += 1
            else:
                return (False, None, None, _skip_fail(text, i))
        elif kind == "star_last":
            while i < n and not is_delimiter(text[i]):
                i += 1
        else:  # ('star', child) — lazy recursive tail match (:161-191)
            child = op[1]
            while True:
                ok, _, c_end, c_cur = _run_seq(text, i, child)
                if ok:
                    # outer keeps its own start; end comes from the tail's
                    # mark_end (marks persist on the miner, :173-181)
                    return (True, start, c_end, c_cur)
                # reset_pos(&pos): cursor restored to i
                if i >= n:
                    return (False, None, None, i)
                i += 1
                if i < n and is_delimiter(text[i]):
                    return (False, None, None, _skip_fail(text, i))
    # glob consumed: mark_end, then the token must end here (:254-257)
    end_mark = i
    if i < n:
        if is_delimiter(text[i]):
            return (True, start, end_mark, i + 1)  # match_delimiter moves
        return (False, None, end_mark, _skip_fail(text, i))
    return (True, start, end_mark, i)


def _seq_joined_scan_safe(seq: _Seq) -> bool:
    """True iff a batch-joined global scan is row-equivalent to per-row
    scans for this glob (the regex-family analogue is
    ``CompiledRegex.joined_scan_safe``).

    A match can cross the "\\n" row separator only through (a) an accept
    set containing "\\n" itself, or (b) a mid-pattern ``*`` — its tail
    re-enters the matcher *including the token skip*, so ``a*b`` on the
    joined text can start in one row and finish in the next (the per-row
    engine would instead match only inside the second row).  ``?`` /
    trailing ``*`` never consume a delimiter, and the initial token skip /
    ``retnul`` crossing a row boundary lands exactly where the per-row
    scan of the next row would start."""
    for op in seq.ops:
        kind = op[0]
        if kind == "star":
            return False
        if kind in ("lit", "set") and "\n" in op[1]:
            return False
    return True


class GlobMiner(Miner):
    """``match_glob(pattern)`` → miner labeled "Glob"
    (glob_entities.c:311-317).

    Execution prefers the native kernel (``miners/globcc.py`` — the
    compiled ``_Seq`` tree flattened to tables for one generic C scan),
    falling back to the pure-Python interpreter below; both engines are
    parity-tested against each other and the reference's glob.c cases."""

    def __init__(self, glob: str, label: str = "Glob"):
        if not is_glob(glob):
            raise ValueError(f"{glob!r} is not a syntactically correct glob")
        self.glob = glob
        self.label = label
        self._seq = _compile(glob)
        #: row-equivalence of the joined-batch scan (see _seq_joined_scan_safe)
        self.joined_scan_safe = _seq_joined_scan_safe(self._seq)
        self._prog = None  # lazy native tables (picklable numpy arrays)

    def _matcher_at(self, text: str, i: int):
        ok, start, end_mark, cursor = _run_seq(text, i, self._seq)
        if ok and start != end_mark:  # allow_empty=false (miner.c:261-263)
            return ((start, end_mark, 1.0), cursor, end_mark)
        return (None, cursor, end_mark)

    def find_python(self, text: str):
        """Pure-Python engine (kept as the no-compiler fallback and the
        parity oracle for the native kernel)."""
        from nativeextractor_ray.miners.base import scan

        return scan(text, self._matcher_at)

    def find_arrays(self, text: str):
        """(u0, u1, prob) numpy arrays — the protocol the joined-batch
        scan prefers.  Uses the native glob kernel when the host can
        compile it, else the Python interpreter."""
        import numpy as np

        from nativeextractor_ray.miners import globcc

        if globcc.available():
            if self._prog is None:
                self._prog = globcc.compile_program(self._seq)
            u0, u1 = globcc.scan(text, self._prog)
            return u0, u1, np.ones(len(u0), dtype=np.float32)
        spans = self.find_python(text)
        n = len(spans)
        u0 = np.fromiter((s[0] for s in spans), dtype=np.int64, count=n)
        u1 = np.fromiter((s[1] for s in spans), dtype=np.int64, count=n)
        return u0, u1, np.ones(n, dtype=np.float32)

    def find(self, text: str):
        from nativeextractor_ray.miners import globcc

        if not globcc.available():
            return self.find_python(text)
        u0, u1, pr = self.find_arrays(text)
        return list(zip(u0.tolist(), u1.tolist(), pr.tolist()))


register_miner("glob", GlobMiner)
register_miner("match_glob", GlobMiner)
