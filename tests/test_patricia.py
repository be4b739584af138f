"""Dictionary-trie property tests mirroring /root/reference/tests/patricia.c
(seeded randomized roundtrips, prefix search, unicode keys, user data,
save/reload, multi-char-edge regression)."""

import random
import string

import pytest

from nativeextractor_ray.state.patricia import PatriciaTrie


def _rand_ascii(rng, lo=1, hi=16):
    n = rng.randint(lo, hi)
    return "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(n))


def test_insert_search_roundtrip_ascii():
    # tests/patricia.c:26-62 — 10k random ASCII strings, seeded
    rng = random.Random(0)
    words = {_rand_ascii(rng) for _ in range(10_000)}
    t = PatriciaTrie(words)
    for w in words:
        assert t.search(w) == len(w.encode()), w
        assert w in t


def test_prefix_search_returns_prefix_length():
    # tests/patricia.c:77-97 — half-length prefixes are found in full
    rng = random.Random(0)
    words = [_rand_ascii(rng, 4, 16) for _ in range(2_000)]
    t = PatriciaTrie(words)
    for w in words:
        p = w[: len(w) // 2]
        assert t.search(p) == len(p.encode())


def test_search_partial_and_miss():
    t = PatriciaTrie(["alice", "alicorn", "bob"])
    assert t.search("alice") == 5
    assert t.search("alic") == 4          # prefix of a word → full query len
    assert t.search("alicexx") == 5       # longest common prefix in bytes
    assert t.search("alicorn") == 7
    assert t.search("zzz") == 0
    assert t.search("b") == 1
    assert "alic" not in t
    assert "alice" in t


def test_unicode_keys_roundtrip():
    # tests/patricia.c:148-164 — multi-byte UTF-8 strings; search is in BYTES
    rng = random.Random(0)
    alphabet = "řčšžýáíéůú日本語汉字한글"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        for _ in range(5_000)
    }
    t = PatriciaTrie(words)
    for w in words:
        assert t.search(w) == len(w.encode()), w


def test_empty_string():
    # tests/patricia.c:279-282 — empty string insert/search
    t = PatriciaTrie()
    assert t.search("") == 0
    t.insert("")
    assert t.search("") == 1  # root->is_terminal (patricia.c:293-296)
    assert "" in t


def test_user_data_roundtrip_and_save_reload(tmp_path):
    # tests/patricia.c:166-196 (data), :284-297 (save → reopen → re-check)
    rng = random.Random(0)
    words = [_rand_ascii(rng) for _ in range(500)]
    t = PatriciaTrie()
    for i, w in enumerate(words):
        t.insert(w, data={"i": i})
    path = str(tmp_path / "dict.patty")
    t.save(path)
    t2 = PatriciaTrie.from_file(path)
    for i, w in enumerate(words):
        assert t2.search(w) == len(w.encode())
        if t.get_data(w) is not None:  # duplicates keep the last data
            assert t2.get_data(w) == t.get_data(w)


def test_multichar_edge_regression():
    # tests/patricia.c:198-277 — lookup must compare whole edges: with the
    # 17-word corpus, 'aaafah' → 6 matched (terminal), 'aaafb' → 4 matched
    corpus = [
        "aaa", "aaafah", "aaafahbde", "aaafahbcd", "aaafahbcede",
        "aaczc", "aacede", "aaswer", "aabcd", "aabcdefgh",
        "bcd", "bcdefg", "bcdefgh", "cde", "cdefgh", "a", "aa",
    ]
    t = PatriciaTrie(corpus)
    n, term = t.search_ext("aaafah")
    assert n == 6 and term
    n, term = t.search_ext("aaafb")
    assert n == 4 and not term


def test_items_ordered():
    # edge-ordering invariant under traversal (tests/patricia.c:99-118)
    t = PatriciaTrie(["b", "a", "ab", "aa", "z"])
    assert [w for w, _ in t.items()] == [b"a", b"aa", b"ab", b"b", b"z"]


def test_from_csv_cells():
    t = PatriciaTrie.from_csv_cells(["x", "y", "xyz"])
    assert len(t) == 3 and "xyz" in t
