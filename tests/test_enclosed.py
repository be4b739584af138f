"""Enclosed-occurrence filter + sort parity —
/root/reference/tests/enclosed.c:175-289 and extractor.c:102-203.

The reference's multi-batch/small-batch cases exercise cross-batch
``last_max`` state; in this engine a turn is never split across batches, so
all cases reduce to whole-text runs (same expected counts)."""

from nativeextractor_ray.miners.base import filter_enclosed, run_miners, sort_occurrences
from nativeextractor_ray.miners.glob import GlobMiner
from nativeextractor_ray.miners.regexlang import RegexMiner
from nativeextractor_ray.occurrence import Mention


def globs(*patterns):
    return [GlobMiner(p) for p in patterns]


def test_single_batch():
    text = "abc def"
    ms = globs("abc def", "abc", "def")
    assert len(run_miners(text, ms)) == 3
    got = run_miners(text, ms, no_enclosed=True)
    assert len(got) == 1
    assert got[0].surface == "abc def"


def test_multi_batch_counts():
    text = "abc def ghi jkl"
    ms = globs("abc def", "abc", "def", "def ghi", "ghi", "jkl")
    assert len(run_miners(text, ms)) == 6
    got = run_miners(text, ms, no_enclosed=True)
    # partial overlaps both kept: "abc def", "def ghi", "jkl"
    assert sorted(m.surface for m in got) == ["abc def", "def ghi", "jkl"]


def test_identical_ranges_different_labels_kept():
    # enclosed.c:253-268 — glob 'abc' + regex 'abc' (label = the regex
    # string) on "abc": identical spans, both kept (extractor.c:166-169)
    text = "abc"
    got = run_miners(
        text, [GlobMiner("abc"), RegexMiner("abc")], no_enclosed=True
    )
    assert len(got) == 2
    assert sorted(m.label for m in got) == ["Glob", "abc"]


def test_stream_reset_counts_stable():
    # enclosed.c:270-289 — same miner re-run on a new text gives same counts
    m = GlobMiner("abc")
    for _ in range(2):
        assert len(run_miners("abc abc", [m], no_enclosed=True)) == 2


def test_sort_contract():
    # E_SORT_RESULTS: pos asc, then len ASC (extractor.c:102-112; the code
    # wins over the README's "descending")
    ms = [
        Mention("b", 5, 5, 4, 4, "xxxx", 1.0),
        Mention("a", 0, 0, 7, 7, "yyyyyyy", 1.0),
        Mention("c", 0, 0, 3, 3, "zzz", 1.0),
    ]
    got = sort_occurrences(ms)
    assert [(m.pos, m.len) for m in got] == [(0, 3), (0, 7), (5, 4)]


def test_filter_enclosed_chain_and_equal_spans():
    def mk(pos, ln, label):
        return Mention(label, pos, pos, ln, ln, "x" * ln, 1.0)

    # A:[0,10) keeps; B:[0,10) identical kept; C:[2,8) dropped; D:[0,10)
    # another identical kept; E:[3,12) partial overlap kept; F:[4,10) dropped
    ms = [
        mk(0, 10, "A"),
        mk(0, 10, "B"),
        mk(2, 6, "C"),
        mk(3, 9, "E"),
        mk(4, 6, "F"),
    ]
    got = filter_enclosed(ms)
    assert [m.label for m in got] == ["A", "B", "E"]

    # same-pos proper containment: [0,5) ⊂ [0,9)
    got = filter_enclosed([mk(0, 9, "L"), mk(0, 5, "S")])
    assert [m.label for m in got] == ["L"]


def test_empty_text_no_mentions():
    # tests/extractor.c:62-69 — empty input: zero occurrences, no error
    assert run_miners("", globs("abc")[0:1]) == []
