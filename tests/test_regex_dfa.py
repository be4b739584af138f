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
