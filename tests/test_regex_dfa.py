"""Powerset-DFA execution vs the NFA-set oracle — same automaton, so any
output difference is a table-construction bug (the reference's own chain is
NFA -> DFA -> C, regex_generator.c:1043-1258; the NFA simulation is the
semantics oracle here)."""

from hypothesis import given, settings, strategies as st

from nativeextractor_ray.miners.regexlang import CompiledRegex, RegexMiner

SETTINGS = dict(max_examples=120, derandomize=True, deadline=None)

PATTERNS = [
    "abc",
    "a+b?",
    "(ab)+a",
    "[0-9]{4}-[0-9]{2}",
    "[0-9]{1,3}\\.[0-9]{1,3}",
    "a|bc|bcd",
    "x[abc]*y",
    "[^ab ]+",
    "\\w+@\\w+",
    "\\s[a-z]{2,}",
    "a{2,}b*",
    "(a|b)(c|d)+",
    "^ab",
    "ab$",
    "^a*$",
    ".+",
    # mixed anchored / unanchored alternatives: the maximal BOF run at
    # position 0 can overshoot the unanchored branch's accept and fail —
    # all three engines must agree there is then NO match at 0 (no
    # mid-state retry of the same position)
    "^abc|a",
    "^ab|b",
    "a$|ab",
    "^a|ab*c",
]

texts = st.text(alphabet=st.sampled_from("ab cd0129.x@y\nz-"), max_size=40)


def _find_both(pattern: str, text: str):
    m = RegexMiner(pattern)
    assert m._re.dfa_ok
    return m._find_dfa(text), m._find_nfa(text)


@settings(**SETTINGS)
@given(st.sampled_from(PATTERNS), texts)
def test_dfa_equals_nfa(pattern, text):
    fast, slow = _find_both(pattern, text)
    assert fast == slow, (pattern, repr(text))


@settings(**SETTINGS)
@given(texts)
def test_run_table_equals_run_nfa_positions(text):
    """Per-position run parity (not just the scan loop): attempt at every
    index with both engines."""
    r = CompiledRegex("[0-9]{2,4}|ab+")
    cls = r._classes_of_text(text)
    for i in range(len(text) + 1):
        got = r.run_table(cls, i, len(text), i == 0) if i <= len(text) else None
        want = r._run_nfa(text, i)
        assert got == want, (i, repr(text))


def test_joined_scan_safety_flags():
    assert CompiledRegex("[0-9]+").joined_scan_safe
    assert not CompiledRegex("^abc").joined_scan_safe       # BOF anchor
    assert not CompiledRegex("a\\sb").joined_scan_safe      # \s eats \n
    assert not CompiledRegex("a[^b]c").joined_scan_safe     # negated set eats \n
    assert CompiledRegex("a.c").joined_scan_safe            # '.' excludes \n


def test_native_kernel_parity():
    """The C table-walk (miners/dfacc.py) against the pure-Python DFA walk
    on every PATTERN — exercised explicitly so a kernel bug can't hide
    behind an unavailable compiler (skips when gcc is absent)."""
    import pytest

    from nativeextractor_ray.miners import dfacc

    if not dfacc.available():
        pytest.skip("no C compiler on this machine")
    corpus = [
        "", "a", "ab", "abcabc x 0129.34 a@b.cd\nab 12-34",
        "aaaabbbb", "2024-01-02T00:00", "x" * 100,
        "čaj ü@ß.de — ab", "ab " * 50,
    ]
    for pattern in PATTERNS:
        m = RegexMiner(pattern)
        for text in corpus:
            native = m.find(text)
            # force the pure-Python walk on a fresh automaton
            m2 = RegexMiner(pattern)
            cre = m2._re
            spans, i, n = [], 0, len(text)
            cls = cre._classes_of_text(text)
            while i < n:
                end = cre.run_table(cls, i, n, i == 0)
                if end is not None and end > i:
                    spans.append((i, end, 1.0))
                    i = end
                else:
                    # a failed attempt advances — even at position 0 there
                    # is no mid-state retry (matches the NFA oracle)
                    i += 1
            assert native == spans, (pattern, repr(text))


def test_find_arrays_matches_find():
    import numpy as np

    m = RegexMiner("[0-9]{2,4}|ab+")
    text = "ab 0129 abb 12 x 34567"
    u0, u1, pr = m.find_arrays(text)
    assert [(int(a), int(b), float(p)) for a, b, p in zip(u0, u1, pr)] == m.find(text)
    e0, e1, ep = m.find_arrays("")
    assert len(e0) == 0 and len(e1) == 0 and len(ep) == 0
