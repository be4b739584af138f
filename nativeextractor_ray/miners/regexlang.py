"""Regex miners with the reference dialect and DFA-run match semantics.

The reference compiles user regexes through lex tree → op tree → Thompson
NFA → powerset DFA → generated C → ``gcc -shared`` and dlopens the result
(``/root/reference/src/regex_generator.c:1212-1258``); the compile cost is
paid once per process and amortized over unlimited inputs.  Our analogue:
compile once per actor ``__init__`` to an in-memory NFA and simulate with
state sets (a lazily-determinized DFA run).

**Match semantics** (from the generated code,
``regex_generator.c:1043-1210``): at a scan position the automaton consumes
the *maximal run* of characters that keeps any automaton state alive, and
the attempt succeeds iff the state where it gets stuck (or EOF) is
accepting — there is NO backtracking to an earlier accepting state.  So
``(ab)+a`` does NOT match ``"abab"`` (the run consumes all four chars and
dies non-final) even though ``"aba"`` is in the language.  ``find`` attempts
every position subject to the per-miner non-overlap rule
(``extractor.c:55-93``).

**Dialect** (lexer at ``regex_generator.c:846-1041``): literals; ``( )``
groups; ``|``; ``+ * ?``; ``{n}``, ``{n,}``, ``{n,m}``; ``[...]`` sets with
negation, escapes, classes and alnum ranges; ``\\s \\S \\w \\W \\d \\D``
(``\\w`` = alnum or ``_``, :1060-1066 of unicode.c); ``.`` = anything except
``\\n`` (unicode.c:52-54); ``^``/``$`` = begin/end of STREAM only
(:1108-1113); ``\\b`` unsupported (TODO at :977-979); ``\\n \\t \\r \\v``
escapes.

Documented divergences from un-exercised reference bugs:
- the reference generates ``unicode_isalpha`` for ``\\d``/``\\D``
  (regex_generator.c:937-948) — we implement ``\\d`` as digits (the
  reference's own tests avoid ``\\d`` and use ``[0-9]``);
- where the reference's "DFA" still has order-dependent overlapping edges
  (literal vs class from the same state), we keep all threads alive
  (standard NFA-set semantics) instead of committing to the first edge.
"""

from __future__ import annotations

from typing import Callable

from nativeextractor_ray.miners.base import Miner, register_miner
from nativeextractor_ray.unicode import is_alnum, is_space

MAX_REPEAT = 512


# ---------------------------------------------------------------- predicates

def _isw(c: str) -> bool:
    return is_alnum(c) or c == "_"


def _isdigit(c: str) -> bool:
    return c.isdigit()


_CLASSES: dict[str, Callable[[str], bool]] = {
    "s": is_space,
    "S": lambda c: not is_space(c),
    "w": _isw,
    "W": lambda c: not _isw(c),
    "d": _isdigit,
    "D": lambda c: not _isdigit(c),
}

_ESCAPE_CHARS = {"n": "\n", "t": "\t", "r": "\r", "v": "\v", "f": "\f", "0": "\0"}


class RegexSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------- parser

# AST nodes: ('lit', ch) ('pred', fn) ('set', negated, items) ('any',)
#            ('bof',) ('eof',) ('cat', [..]) ('alt', [..])
#            ('rep', node, lo, hi)  hi=None → unbounded


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def error(self, msg: str):
        raise RegexSyntaxError(f"{msg} at {self.i} in {self.p!r}")

    def peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            self.error("unexpected token")
        return node

    def _alt(self):
        branches = [self._cat()]
        while self.peek() == "|":
            self.i += 1
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        items = []
        while self.peek() not in (None, "|", ")"):
            items.append(self._rep())
        if len(items) == 1:
            return items[0]
        return ("cat", items)

    def _rep(self):
        node = self._atom()
        while True:
            c = self.peek()
            if c == "*":
                node = ("rep", node, 0, None)
                self.i += 1
            elif c == "+":
                node = ("rep", node, 1, None)
                self.i += 1
            elif c == "?":
                node = ("rep", node, 0, 1)
                self.i += 1
            elif c == "{":
                node = ("rep", node, *self._braces())
                self.i += 1  # closing }
            else:
                return node

    def _braces(self):
        # {n} | {n,} | {n,m}  (regex_generator.c:334-401)
        j = self.p.find("}", self.i)
        if j < 0:
            self.error("unterminated {")
        body = self.p[self.i + 1 : j]
        self.i = j
        parts = body.split(",")
        try:
            if len(parts) == 1:
                lo = hi = int(parts[0])
            elif len(parts) == 2:
                lo = int(parts[0])
                hi = int(parts[1]) if parts[1] else None
            else:
                self.error("bad {} contents")
        except ValueError:
            self.error("bad {} contents")
        if hi is not None and lo > hi:
            self.error("invalid {l,h} range")
        if lo > MAX_REPEAT or (hi or 0) > MAX_REPEAT:
            self.error("repeat too large")
        return lo, hi

    def _atom(self):
        c = self.peek()
        if c is None:
            self.error("expected atom")
        if c == "(":
            self.i += 1
            node = self._alt()
            if self.peek() != ")":
                self.error("unterminated (")
            self.i += 1
            return node
        if c == "[":
            return self._set()
        if c == ".":
            self.i += 1
            return ("pred", lambda ch: ch != "\n")  # unicode.c:52-54
        if c == "^":
            self.i += 1
            return ("bof",)
        if c == "$":
            self.i += 1
            return ("eof",)
        if c == "\\":
            return self._escape(in_set=False)
        if c in ")*+?{}":
            self.error(f"unexpected {c!r}")
        self.i += 1
        return ("lit", c)

    def _escape(self, in_set: bool):
        self.i += 1
        c = self.peek()
        if c is None:
            self.error("dangling escape")
        if c in _CLASSES:
            self.i += 1
            return ("pred", _CLASSES[c])
        if c == "b":
            self.error("\\b is unsupported (reference TODO, regex_generator.c:977-979)")
        self.i += 1
        return ("lit", _ESCAPE_CHARS.get(c, c))

    def _set(self):
        # [...] — regex_generator.c:1043-1100; negation via leading ^
        self.i += 1  # consume [
        negated = False
        if self.peek() == "^":
            negated = True
            self.i += 1
        items = []  # ('lit', ch) | ('pred', fn) | ('range', lo, hi)
        while True:
            c = self.peek()
            if c is None:
                self.error("unterminated [")
            if c == "]":
                self.i += 1
                break
            if c == "\\":
                items.append(self._escape(in_set=True))
                continue
            # possible range a-b (alnum operands in the reference,
            # :993-1029; we accept any ordered pair)
            if (
                self.i + 2 < len(self.p)
                and self.p[self.i + 1] == "-"
                and self.p[self.i + 2] != "]"
            ):
                lo, hi = c, self.p[self.i + 2]
                if ord(lo) > ord(hi):
                    self.error(f"invalid range {lo}-{hi}")
                items.append(("range", ord(lo), ord(hi)))
                self.i += 3
                continue
            items.append(("lit", c))
            self.i += 1
        if not items:
            self.error("empty [] set")
        return ("set", negated, tuple(items))


# ---------------------------------------------------------------- NFA

class _NFA:
    """Thompson NFA.  Edge kinds: 'eps', 'bof', 'eof' (non-consuming),
    'lit' (char), 'test' (predicate over one char)."""

    def __init__(self):
        self.edges: list[list[tuple]] = []

    def state(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def add(self, frm: int, kind: str, data, to: int):
        self.edges[frm].append((kind, data, to))


def _set_to_pred(negated: bool, items) -> Callable[[str], bool]:
    lits = frozenset(it[1] for it in items if it[0] == "lit")
    ranges = tuple((it[1], it[2]) for it in items if it[0] == "range")
    preds = tuple(it[1] for it in items if it[0] == "pred")

    def test(ch: str) -> bool:
        hit = (
            ch in lits
            or any(lo <= ord(ch) <= hi for lo, hi in ranges)
            or any(p(ch) for p in preds)
        )
        return hit != negated

    return test


def _build(nfa: _NFA, node, frm: int, to: int) -> None:
    kind = node[0]
    if kind == "lit":
        nfa.add(frm, "lit", node[1], to)
    elif kind == "pred":
        nfa.add(frm, "test", node[1], to)
    elif kind == "set":
        nfa.add(frm, "test", _set_to_pred(node[1], node[2]), to)
    elif kind == "bof" or kind == "eof":
        nfa.add(frm, kind, None, to)
    elif kind == "cat":
        cur = frm
        for child in node[1][:-1] if node[1] else []:
            nxt = nfa.state()
            _build(nfa, child, cur, nxt)
            cur = nxt
        if node[1]:
            _build(nfa, node[1][-1], cur, to)
        else:
            nfa.add(frm, "eps", None, to)
    elif kind == "alt":
        for child in node[1]:
            _build(nfa, child, frm, to)
    elif kind == "rep":
        _, child, lo, hi = node
        cur = frm
        for _ in range(lo):
            nxt = nfa.state()
            _build(nfa, child, cur, nxt)
            cur = nxt
        if hi is None:
            # star over child: cur -ε-> to, loop cur -> child -> cur
            loop = nfa.state()
            nfa.add(cur, "eps", None, loop)
            _build(nfa, child, loop, loop)
            nfa.add(loop, "eps", None, to)
        else:
            nfa.add(cur, "eps", None, to)
            for _ in range(hi - lo):
                nxt = nfa.state()
                _build(nfa, child, cur, nxt)
                nfa.add(nxt, "eps", None, to)
                cur = nxt
    else:  # pragma: no cover
        raise RegexSyntaxError(f"unknown node {kind}")


class CompiledRegex:
    """Compile-once automaton (the analogue of a built+dlopened .so module).

    Compilation mirrors the reference's full chain
    (regex_generator.c:1212-1258): Thompson NFA -> powerset DFA.  The DFA
    runs over an ALPHABET PARTITION — a character's class is determined by
    (which literal it equals, which predicates accept it) — discovered
    lazily per distinct codepoint, so the transition table stays tiny.
    The NFA-set simulation is kept as ``_run_nfa`` (fallback when the
    powerset construction exceeds ``max_dfa_states``, and the parity
    oracle for tests/test_regex_dfa.py).
    """

    MAX_DFA_STATES = 4096

    def __init__(self, pattern: str):
        self.pattern = pattern
        ast = _Parser(pattern).parse()
        self.nfa = _NFA()
        self.start = self.nfa.state()
        self.final = self.nfa.state()
        _build(self.nfa, ast, self.start, self.final)
        # chars that can begin a run from the start closure (fast scan skip);
        # None = can't prefilter (predicate edges present)
        self._start_lits: frozenset[str] | None = None
        self._start_tests: list[Callable[[str], bool]] = []
        self._scan_start_edges()
        self._compile_dfa()

    # -- NFA machinery (kept as the semantics oracle / fallback) -----------

    def _closure(self, states: set[int], at_bof: bool, at_eof: bool) -> frozenset[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for kind, _, to in self.nfa.edges[s]:
                if kind == "eps" or (kind == "bof" and at_bof) or (kind == "eof" and at_eof):
                    if to not in seen:
                        seen.add(to)
                        stack.append(to)
        return frozenset(seen)

    def _scan_start_edges(self):
        lits: set[str] = set()
        # consider both BOF and non-BOF start closures for the prefilter
        for bof in (True, False):
            cl = self._closure({self.start}, bof, False)
            for s in cl:
                for kind, data, _ in self.nfa.edges[s]:
                    if kind == "lit":
                        lits.add(data)
                    elif kind == "test":
                        self._start_tests.append(data)
        self._start_lits = frozenset(lits)

    def can_start(self, ch: str) -> bool:
        return ch in self._start_lits or any(t(ch) for t in self._start_tests)

    def _run_nfa(self, text: str, i: int) -> int | None:
        """Maximal-run attempt at codepoint position i — NFA-set rendering
        (regex_generator.c:1134-1154 semantics: accept iff the state set
        where the run gets stuck is final)."""
        n = len(text)
        cur = self._closure({self.start}, i == 0, i == n)
        while i < n:
            ch = text[i]
            nxt = {
                to
                for s in cur
                for kind, data, to in self.nfa.edges[s]
                if (kind == "lit" and data == ch) or (kind == "test" and data(ch))
            }
            if not nxt:
                break
            i += 1
            cur = self._closure(nxt, False, i == n)
        return i if self.final in cur else None

    # kept under the old name for any external callers/tests
    run = _run_nfa

    # -- powerset DFA over the lazy alphabet partition ---------------------

    def _compile_dfa(self) -> None:
        edges = self.nfa.edges
        lits: set[str] = set()
        preds: list = []
        pred_ids: dict[int, int] = {}
        for es in edges:
            for kind, data, _to in es:
                if kind == "lit":
                    lits.add(data)
                elif kind == "test":
                    if id(data) not in pred_ids:
                        pred_ids[id(data)] = len(preds)
                        preds.append(data)
        self._lits = lits
        self._preds = preds
        self._pred_pos = {id(q): i for i, q in enumerate(preds)}
        self._cls_repr: list[tuple] = []
        self.uses_anchors = any(
            kind in ("bof", "eof") for es in edges for kind, _d, _t in es
        )
        # a run can never cross "\n" iff no consuming edge accepts it
        self.consumes_newline = ("\n" in lits) or any(p("\n") for p in preds)
        # the joined-batch scan is exact iff runs can't cross rows and
        # BOF/EOF anchors are absent (per-row ^/$ would bind to the join)
        self.joined_scan_safe = not self.uses_anchors and not self.consumes_newline

        # class bookkeeping (lazy: one entry per distinct codepoint seen)
        self._cls_of_cp: dict[int, int] = {}
        self._sig_to_cls: dict[tuple, int] = {}
        self._n_classes = 0

        # DFA states: frozensets of NFA states (eps/eof-free closures)
        self._dstates: list[frozenset[int]] = []
        self._dindex: dict[frozenset[int], int] = {}
        self._trans: list[list[int]] = []   # [state][class] -> state | -1
        self._acc_mid: list[bool] = []
        self._acc_eof: list[bool] = []
        self.dfa_ok = True

        self._start_mid = self._dstate(self._closure({self.start}, False, False))
        self._start_bof = self._dstate(self._closure({self.start}, True, False))

    def _dstate(self, s: frozenset[int]) -> int:
        i = self._dindex.get(s)
        if i is not None:
            return i
        if len(self._dstates) >= self.MAX_DFA_STATES:
            self.dfa_ok = False
            return -1
        i = len(self._dstates)
        self._dindex[s] = i
        self._dstates.append(s)
        # placeholder FIRST: _compute_trans below can recursively create
        # states, and their rows must land at their own indices
        self._trans.append([])
        self._acc_mid.append(self.final in s)
        self._acc_eof.append(self.final in self._closure(set(s), False, True))
        row = self._trans[i]
        while len(row) < self._n_classes:
            row.append(self._compute_trans(s, len(row)))
        return i

    def _compute_trans(self, s: frozenset[int], cls: int) -> int:
        lit_ch, bits = self._cls_repr[cls]
        nxt = set()
        for st in s:
            for kind, data, to in self.nfa.edges[st]:
                if kind == "lit":
                    if lit_ch is not None and data == lit_ch:
                        nxt.add(to)
                elif kind == "test":
                    if bits & (1 << self._pred_index(data)):
                        nxt.add(to)
        if not nxt:
            return -1
        return self._dstate(self._closure(nxt, False, False))

    def _pred_index(self, p) -> int:
        return self._pred_pos[id(p)]

    def _class_of_char(self, ch: str) -> int:
        cp = ord(ch)
        c = self._cls_of_cp.get(cp)
        if c is not None:
            return c
        lit_ch = ch if ch in self._lits else None
        bits = 0
        for i, p in enumerate(self._preds):
            if p(ch):
                bits |= 1 << i
        sig = (lit_ch, bits)
        c = self._sig_to_cls.get(sig)
        if c is None:
            c = self._n_classes
            self._sig_to_cls[sig] = c
            self._cls_repr.append(sig)
            self._n_classes += 1
            # extend every state's row with the new class; extension can
            # create MORE states (appended while we iterate), whose rows
            # are built full-width — the len guard skips those
            si = 0
            while si < len(self._trans):
                row = self._trans[si]
                while len(row) < self._n_classes:
                    row.append(self._compute_trans(self._dstates[si], len(row)))
                si += 1
        self._cls_of_cp[cp] = c
        return c

    def _classes_of_text(self, text: str):
        """Vectorized char→class mapping.  Codepoints < 256 (≈ all text)
        resolve through a persistent 256-entry lookup table — one numpy
        gather; rarer high codepoints go per-UNIQUE-codepoint with a
        searchsorted gather.  Class ids are append-only, so the table
        never invalidates."""
        import numpy as np

        if not text:
            return np.empty(0, dtype=np.int32)
        cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        lut = getattr(self, "_cls_lut", None)
        if lut is None:
            lut = np.full(256, -1, dtype=np.int32)
            self._cls_lut = lut
        if cp.max(initial=0) < 256:
            out = lut[cp]
            if (out < 0).any():
                # presence-scatter, NOT unique: a linear pass over the
                # unseen chars (unique's sort over the full text was the
                # first-call wall; bincount is erratically slow on large
                # inputs in this numpy)
                present = np.zeros(256, dtype=bool)
                present[cp[out < 0].astype(np.int64)] = True
                for u in np.nonzero(present)[0]:
                    lut[u] = self._class_of_char(chr(int(u)))
                out = lut[cp]
            return out
        out = np.empty(len(cp), dtype=np.int32)
        small = cp < 256
        sm = cp[small]
        osm = lut[sm]
        if (osm < 0).any():
            present = np.zeros(256, dtype=bool)
            present[sm[osm < 0].astype(np.int64)] = True
            for u in np.nonzero(present)[0]:
                lut[u] = self._class_of_char(chr(int(u)))
            osm = lut[sm]
        out[small] = osm
        hi = cp[~small]
        uniq = np.unique(hi)
        u_cls = np.array([self._class_of_char(chr(int(u))) for u in uniq],
                         dtype=np.int32)
        out[~small] = u_cls[np.searchsorted(uniq, hi)]
        return out

    def run_table(self, cls_arr, i: int, n: int, at_bof: bool) -> int | None:
        """Maximal-run attempt via the DFA table (same semantics as
        ``_run_nfa`` — asserted by the property tests)."""
        trans = self._trans
        cur = self._start_bof if at_bof else self._start_mid
        j = i
        while j < n:
            nx = trans[cur][cls_arr[j]]
            if nx < 0:
                break
            cur = nx
            j += 1
        ok = self._acc_eof[cur] if j == n else self._acc_mid[cur]
        return j if ok else None

    def full_lut(self):
        """Byte→class LUT with ALL 256 single-byte chars classified
        eagerly (≈5 ms once per pattern per process).  Makes the table
        shape stable for the ASCII kernel: later lazy discovery can only
        add classes for codepoints ≥ 256."""
        import numpy as np

        if not getattr(self, "_lut_full", False):
            lut = getattr(self, "_cls_lut", None)
            if lut is None:
                lut = np.full(256, -1, dtype=np.int32)
                self._cls_lut = lut
            for u in range(256):
                if lut[u] < 0:
                    lut[u] = self._class_of_char(chr(u))
            self._lut_full = True
        return self._cls_lut

    def ctables(self):
        """Dense C-ready copies of the DFA tables for the native scan
        kernel (miners/dfacc.py) — rebuilt whenever the lazy class/state
        discovery has grown them (cache keyed on the table shape)."""
        import numpy as np

        shape = (len(self._dstates), self._n_classes)
        cached = getattr(self, "_ctab", None)
        if cached is not None and cached[0] == shape:
            return cached[1]
        trans = np.full(shape, -1, dtype=np.int16)  # MAX_DFA_STATES < 2**15
        for i, row in enumerate(self._trans):
            if row:
                trans[i, : len(row)] = row
        tabs = (
            np.ascontiguousarray(trans),
            np.asarray(self._acc_mid, dtype=np.uint8),
            np.asarray(self._acc_eof, dtype=np.uint8),
        )
        self._ctab = (shape, tabs)
        return tabs


class RegexMiner(Miner):
    """``regex_compile(expr, naming, label)`` analogue
    (regex_generator.c:1212-1258): one compiled automaton, one label."""

    def __init__(self, pattern: str, label: str | None = None):
        self.pattern = pattern
        self.label = label if label is not None else pattern
        self._re = CompiledRegex(pattern)

    def find(self, text: str):
        # scan loop with per-miner non-overlap (extractor.c:55-93): a failed
        # attempt leaves the cursor in place (generated code resets to mark),
        # so the driver advances one position; successes resume at the end.
        re_ = self._re
        if re_.dfa_ok:
            return self._find_dfa(text)
        return self._find_nfa(text)

    def find_arrays(self, text: str):
        """Span arrays ``(u0, u1, prob)`` — the no-tuple protocol the
        joined-batch scan prefers.  Uses the native DFA kernel when the
        machine has one; otherwise wraps the Python engines."""
        import numpy as np

        re_ = self._re
        n = len(text)
        if n and re_.dfa_ok:
            from nativeextractor_ray.miners import dfacc

            if dfacc.available():
                if text.isascii():
                    # bytes == codepoints; the kernel does byte→class
                    # lookup inline, so nothing text-sized is allocated
                    lut = re_.full_lut()
                    if re_.dfa_ok:
                        trans, am, ae = re_.ctables()
                        u0, u1 = dfacc.scan_ascii(
                            text.encode(), lut, trans, am, ae,
                            re_._start_bof, re_._start_mid,
                        )
                        return u0, u1, np.ones(len(u0), dtype=np.float32)
                else:
                    cls = re_._classes_of_text(text)
                    if re_.dfa_ok:  # discovery may have tripped the cap
                        trans, am, ae = re_.ctables()
                        u0, u1 = dfacc.scan(
                            cls.astype(np.int32, copy=False), trans, am, ae,
                            re_._start_bof, re_._start_mid,
                        )
                        return u0, u1, np.ones(len(u0), dtype=np.float32)
        spans = self.find(text)
        m = len(spans)
        return (
            np.fromiter((s[0] for s in spans), dtype=np.int64, count=m),
            np.fromiter((s[1] for s in spans), dtype=np.int64, count=m),
            np.fromiter((s[2] for s in spans), dtype=np.float32, count=m),
        )

    def _find_dfa(self, text: str):
        import numpy as np

        re_ = self._re
        n = len(text)
        if n == 0:
            return []
        from nativeextractor_ray.miners import dfacc

        if dfacc.available():
            u0, u1, _pr = self.find_arrays(text)
            return [(int(a), int(b), 1.0) for a, b in zip(u0, u1)]
        cls = re_._classes_of_text(text)
        if not re_.dfa_ok:  # class discovery may have tripped the cap
            return self._find_nfa(text)
        # candidate starts: classes with a live transition out of the scan
        # start state (position 0 checked separately with the BOF state)
        start_row = np.asarray(re_._trans[re_._start_mid], dtype=np.int64)
        cand = np.nonzero(start_row[cls] >= 0)[0] if len(start_row) else np.empty(0, np.int64)
        out = []
        i = 0
        k = 0
        run = re_.run_table
        # position 0 first (BOF closure may differ)
        end = run(cls, 0, n, True)
        if end is not None and end > 0:
            out.append((0, end, 1.0))
            i = end
        else:
            i = 1 if (len(cand) == 0 or cand[0] != 0) else 0
        while True:
            while k < len(cand) and cand[k] < max(i, 1):
                k += 1
            if k >= len(cand):
                break
            i = int(cand[k])
            end = run(cls, i, n, False)
            if end is not None and end > i:
                out.append((i, end, 1.0))
                i = end
            else:
                k += 1
        return out

    def _find_nfa(self, text: str):
        out = []
        n = len(text)
        i = 0
        re_ = self._re
        can_start = re_.can_start
        while i < n:
            if can_start(text[i]) or i == 0 or i == n:
                end = re_._run_nfa(text, i)
                if end is not None and end > i:  # allow_empty=false
                    out.append((i, end, 1.0))
                    i = end
                    continue
            i += 1
        return out


register_miner("regex", RegexMiner)
