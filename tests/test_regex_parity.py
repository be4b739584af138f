"""Regex miner parity — /root/reference/tests/regex_miner.c:32-91 plus
dialect/semantics unit tests for the DFA-run match model."""

import pytest

from nativeextractor_ray.miners.regexlang import (
    CompiledRegex,
    RegexMiner,
    RegexSyntaxError,
)

# exact bytes of /root/reference/tests/fixtures/regex_generator/fixture_0.txt
FIXTURE_0 = "asds ad +919367788755 asdad\nadsadas test@gmail.com asds sdščččč"

EMAIL_RE = "[^@ \t\r\n]+@[^@ \t\r\n]+\\.[^@ \t\r\n]+"
TEL_RE = "[+]?[(]?[0-9]{3}[)]?[-\\s.]?[0-9]{3}[-\\s.]?[0-9]{4,6}"


def test_fixture_0_two_occurrences():
    # the reference's own assertion: exactly 2 occurrences total
    # (tests/regex_miner.c:90)
    email = RegexMiner(EMAIL_RE, label="EMAIL")
    tel = RegexMiner(TEL_RE, label="TEL_NO")
    got = email.mentions(FIXTURE_0) + tel.mentions(FIXTURE_0)
    assert len(got) == 2
    surfaces = sorted(m.surface for m in got)
    assert surfaces == ["+919367788755", "test@gmail.com"]


def test_maximal_run_no_backtracking():
    # generated-DFA semantics: accept iff the state where the run gets stuck
    # is final — no backtracking to an earlier accepting state
    # (regex_generator.c:1134-1154)
    r = CompiledRegex("(ab)+a")
    assert r.run("aba", 0) == 3
    assert r.run("abab", 0) is None  # run consumes all 4, dies non-final
    assert r.run("ababa", 0) == 5


@pytest.mark.parametrize(
    "pattern,text,spans",
    [
        ("abc", "abc xabcy", [(0, 3), (5, 8)]),
        ("a+", "aaa b aa", [(0, 3), (6, 8)]),
        ("a{2,3}", "aaaa", [(0, 3)]),  # maximal run eats 4 → dies? no: {2,3} caps
        ("colou?r", "color colour", [(0, 5), (6, 12)]),
        ("(cat|dog)s?", "cats dog", [(0, 4), (5, 8)]),
        ("[0-9]+", "ab 123 c45", [(3, 6), (8, 10)]),
        ("[^a-z]+", "ab 12 cd", [(2, 6)]),  # run " 12 " then stuck at c
        (r"\w+", "héllo wörld!", [(0, 5), (6, 11)]),
        (r"\s+", "a  b", [(1, 3)]),
        ("a.c", "abc a\nc", [(0, 3)]),  # . excludes \n (unicode.c:52-54)
        ("^abc", "abc abc", [(0, 3)]),  # ^ = stream begin only
        ("abc$", "abc abc", [(4, 7)]),
        ("řč+", "xřččy", [(1, 4)]),
    ],
)
def test_dialect(pattern, text, spans):
    got = [(u0, u1) for u0, u1, _ in RegexMiner(pattern).find(text)]
    assert got == spans, (pattern, text)


def test_repeat_edge_cases():
    assert CompiledRegex("a{3}").run("aaa", 0) == 3
    assert CompiledRegex("a{3}").run("aa", 0) is None
    # {3,} unbounded
    assert CompiledRegex("a{3,}").run("aaaaa", 0) == 5
    # maximal-run over-consumption kills a{2,3} on "aaaa"? No — the automaton
    # simply has no 4th 'a' edge, so the run stops at 3 and accepts.
    assert CompiledRegex("a{2,3}").run("aaaa", 0) == 3


def test_syntax_errors():
    for bad in ["(ab", "[ab", "a{2,1}", "*a", r"\b x", "a|*"]:
        with pytest.raises(RegexSyntaxError):
            CompiledRegex(bad)


def test_nonoverlap_within_miner():
    # per-miner end_last: successive matches never overlap (miner.c:35-51)
    got = RegexMiner("aa").find("aaaa")
    assert [(a, b) for a, b, _ in got] == [(0, 2), (2, 4)]
