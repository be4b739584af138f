"""Glob miner parity — transcribed from /root/reference/tests/glob.c:233-309.

Each case asserts the exact occurrence count the reference's own cmocka
suite asserts (same corpus, same glob), via test_glob/test_glob2 semantics
(one extractor, one glob miner, whole text as one batch).
"""

import pytest

from nativeextractor_ray.miners.base import run_miners
from nativeextractor_ray.miners.glob import GlobMiner, is_glob

VERSE = (
    "Twinkle twinkle little star "
    "I want to hit you with a car "
    "Throw you off a cliff so high "
    "Hope you break your neck and die"
)

CASES = [
    # exact_match (glob.c:235-241)
    ("abc abcdef abc", "abc", 2),
    ("abc abcdef abc", "abcdef", 1),
    ("abc abcdef abc", "def", 0),
    ("abc abcdef abc", "abc abcdef abc", 1),
    # character_range (glob.c:249-250)
    ("bat cat mat lat", "[bclm]at", 4),
    # any_character_wildcard (glob.c:258-263)
    ("bat mat mad pat lat lot lit", "l?t", 3),
    ("bat mat mad pat lat lot lit", "?a?", 5),
    ("http://2432.spongedata.cz", "????", 2),   # test_glob2 buffer case
    # any_string_wildcard (glob.c:271-281)
    (VERSE, "*", 26),
    (VERSE, "*kle", 2),
    (VERSE, "T*kle", 2),
    (VERSE, "*i*k*", 2),
    # escape (glob.c:289-293)
    ("[abc]de ade bde cde", r"\a\d\e", 1),
    ("[abc]de ade bde cde", r"\[abc\]de", 1),
    ("[", r"[\[\]\*\?]", 1),
    # mixed (glob.c:301-309)
    ("russel", "[pqrstabc]?*l", 1),
    (
        "awliefduzs78bxc dfueilq234zdhiu 2w45ry7uu7748ju8778",
        "*[abc]*[a-f]*[1-9]*",
        1,
    ),
]


@pytest.mark.parametrize("text,glob,expected", CASES)
def test_glob_counts(text, glob, expected):
    assert len(GlobMiner(glob).find(text)) == expected, (text, glob)


def test_glob_label_and_first_match():
    """tests/extractor.c:104-127 — glob '*' on the fixture token file yields
    label 'Glob' with first match 'abc'."""
    text = "abc\ndef\nabcdef\ndomain\n[abcdef][abc-f][a-f]\n???\n"
    got = run_miners(text, [GlobMiner("*")])
    assert got, "expected occurrences"
    assert got[0].label == "Glob"
    assert got[0].surface == "abc"


def test_glob_case_insensitive_chars():
    # match_character tries tolower then toupper (glob_entities.c:40-55)
    assert len(GlobMiner("abc").find("ABC aBc abc")) == 3
    assert len(GlobMiner("ABC").find("abc")) == 1


def test_glob_star_crosses_delimiter_via_tail_token_skip():
    # the tail of a non-final '*' re-enters the matcher with a token skip,
    # so 'a*b' spans "a b" (glob_entities.c:161-191 + 130-133)
    spans = GlobMiner("a*b").find("a b")
    assert [(s[0], s[1]) for s in spans] == [(0, 3)]


def test_glob_spans_and_byte_math():
    m = GlobMiner("abc")
    got = m.mentions("abc abcdef abc")
    assert [(x.pos, x.len, x.surface) for x in got] == [(0, 3, "abc"), (11, 3, "abc")]
    # multi-byte text: byte offsets differ from codepoint offsets
    got = m.mentions("řřř abc")
    assert [(x.pos, x.upos, x.len, x.ulen) for x in got] == [(7, 4, 3, 3)]


def test_is_glob_validation():
    assert is_glob("[abc]?*")
    assert not is_glob("[abc")
    assert not is_glob("abc]")
    assert not is_glob("[a--b]")


def test_invalid_glob_raises():
    with pytest.raises(ValueError):
        GlobMiner("[abc")


# -- native kernel parity (miners/globcc.py) --------------------------------

DUAL_PATTERNS = [
    "abc", "[bclm]at", "l?t", "?a?", "????", "*", "*kle", "T*kle", "*i*k*",
    r"\a\d\e", r"[\[\]\*\?]", "[pqrstabc]?*l", "*[abc]*[a-f]*[1-9]*",
    "a*b", "*kontakt*", "[0-9]*", "x*", "*x", "[a-c][d-f]*", "a?c*d",
]


def test_native_kernel_matches_python_engine():
    """The C scan (globcc.nxr_glob_scan) is span-identical to the Python
    interpreter over seeded random texts covering delimiters, escapes,
    newlines and non-ASCII codepoints — the same dual-engine gate the
    regex DFA kernel has (tests/test_regex_dfa.py)."""
    import random

    from nativeextractor_ray.miners import globcc

    if not globcc.available():
        pytest.skip("no C compiler on host")
    alpha = "ab cdx. [*?-]\\ \n\t7 é中"
    rng = random.Random(42)
    progs = [(p, GlobMiner(p)) for p in DUAL_PATTERNS]
    for _ in range(120):
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        for pat, m in progs:
            py = [(a, b) for a, b, _ in m.find_python(text)]
            u0, u1 = globcc.scan(text, globcc.compile_program(m._seq))
            assert py == list(zip(u0.tolist(), u1.tolist())), (pat, text)


def test_joined_scan_safety_classification():
    # no mid-'*' and no '\n' in any accept set -> joined-safe
    for p in ("abc", "[bclm]at", "l?t", "?a?", "*", "kont*", "[0-9][0-9]*"):
        assert GlobMiner(p).joined_scan_safe, p
    # mid-'*' tail can token-skip across the row separator
    for p in ("a*b", "*kontakt*", "*i*k*"):
        assert not GlobMiner(p).joined_scan_safe, p
    # an accept set containing '\n' is never joined-safe
    assert not GlobMiner("a\nb").joined_scan_safe


def test_glob_pool_fast_path_equals_per_row():
    """A pool of joined-scan-safe globs takes the batch fast path and is
    mention-identical to the per-row engine (the glob analogue of
    tests/test_miner_pool_fastpath.py)."""
    import random

    import pyarrow as pa

    from nativeextractor_ray.stages.miner_pool import MinerPool

    pats = ["abc", "[bclm]at", "l?t", "?a?", "kont*", "[0-9][0-9]*"]
    specs = [("glob", (p,), {"label": f"G{i}"}) for i, p in enumerate(pats)]
    fast = MinerPool(specs)
    assert fast._fast_ok, "joined-safe glob pool must take the fast path"
    slow = MinerPool(specs)
    slow._fast_ok = False
    assert not MinerPool([("glob", ("*i*k*",), {})])._fast_ok

    rng = random.Random(7)
    alpha = "ab cdx.\n kon takt 01 9é"
    for trial in range(20):
        n = rng.randint(1, 16)
        texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
                 for _ in range(n)]
        batch = pa.table({"conv_id": ["c"] * n, "turn_idx": list(range(n)),
                          "speaker": ["s"] * n, "text": texts})
        assert fast(batch).to_pydict() == slow(batch).to_pydict(), trial
