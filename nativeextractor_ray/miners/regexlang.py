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
    """Compile-once automaton (the analogue of a built+dlopened .so module)."""

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

    def run(self, text: str, i: int) -> int | None:
        """Maximal-run attempt at codepoint position i.  Returns the end of
        the matched span, or None (regex_generator.c:1134-1154 semantics:
        accept iff the state set where the run gets stuck is final)."""
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
        out = []
        n = len(text)
        i = 0
        re_ = self._re
        can_start = re_.can_start
        while i < n:
            if can_start(text[i]) or i == 0 or i == n:
                end = re_.run(text, i)
                if end is not None and end > i:  # allow_empty=false
                    out.append((i, end, 1.0))
                    i = end
                    continue
            i += 1
        return out


register_miner("regex", RegexMiner)
