"""Byte-level dictionary trie with the reference's Patty-trie search contract.

Reference: ``/root/reference/src/patricia.c`` — a UTF-8 radix ("Patricia")
tree with ``insert`` (:105-155), ``search`` returning the *matched-prefix
byte length* (:250-300, incl. partial-edge matches via ``_find_matching_part``),
per-node user data (:536-552), and serialization to an mmappable ``PATTY``
binary (:458-521, load :583-612).

The load-bearing contract (used by the dictionary NER miner,
``/root/reference/src/ner.c:29-31``) is:

    search(key) = length in BYTES of the longest prefix of ``key`` that is
    also a prefix of some inserted string
    (equivalently: max over inserted words w of lcp_bytes(key, w)).

A query that is itself a prefix of an inserted word therefore returns
``len(key)`` — acceptance in the NER miner is a ≥0.75 *prefix ratio*, not
exact membership.  Empty query returns ``1 if "" inserted else 0``
(patricia.c:293-296 returns ``root->is_terminal``).

We use a plain byte-trie (nested dicts): edge compression is a physical
optimization in the reference, not an observable semantic.  Serialization is
a pickled word list (the moral equivalent of the ``PATTY`` file: built once,
loaded once per actor in ``__init__`` — the Ray analogue of mmap sharing).
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable

_TERM = 0  # terminal marker key inside a node dict (int key ≠ any byte-int+1)
_DATA = 1

MAGIC = b"NXRPATTY1\n"


class PatriciaTrie:
    __slots__ = ("_root", "_count")

    def __init__(self, words: Iterable[str | bytes] | None = None):
        # node := {byte+2: child_node, _TERM: bool, _DATA: obj}
        self._root: dict = {}
        self._count = 0
        if words:
            for w in words:
                self.insert(w)

    # -- construction ------------------------------------------------------

    @staticmethod
    def _key(key: str | bytes) -> bytes:
        return key.encode("utf-8") if isinstance(key, str) else key

    def insert(self, key: str | bytes, data: Any = None) -> None:
        node = self._root
        for b in self._key(key):
            node = node.setdefault(b + 2, {})
        if not node.get(_TERM):
            self._count += 1
        node[_TERM] = True
        if data is not None:
            node[_DATA] = data

    @classmethod
    def from_csv_cells(cls, cells: Iterable[str]) -> "PatriciaTrie":
        """Dictionary-build path: every CSV cell inserted into a fresh trie
        (patricia.c:366-381 ``patricia_c_create_from_stream``)."""
        return cls(cells)

    # -- queries -----------------------------------------------------------

    def search(self, key: str | bytes) -> int:
        """Matched-prefix byte length (patricia.c:250-300)."""
        bs = self._key(key)
        if not bs:
            return 1 if self._root.get(_TERM) else 0
        node = self._root
        depth = 0
        for b in bs:
            nxt = node.get(b + 2)
            if nxt is None:
                return depth
            node = nxt
            depth += 1
        return depth

    def search_ext(self, key: str | bytes) -> tuple[int, bool]:
        """(matched byte length, is_terminal of the reached node) —
        patricia.c:283-291."""
        bs = self._key(key)
        node = self._root
        depth = 0
        for b in bs:
            nxt = node.get(b + 2)
            if nxt is None:
                break
            node = nxt
            depth += 1
        return depth, bool(node.get(_TERM))

    def __contains__(self, key: str | bytes) -> bool:
        n, term = self.search_ext(key)
        return term and n == len(self._key(key))

    def __len__(self) -> int:
        return self._count

    # -- per-node user data (patricia.c:536-552) ---------------------------

    def set_data(self, key: str | bytes, data: Any) -> bool:
        node = self._root
        for b in self._key(key):
            node = node.get(b + 2)
            if node is None:
                return False
        node[_DATA] = data
        return True

    def get_data(self, key: str | bytes) -> Any:
        node = self._root
        for b in self._key(key):
            node = node.get(b + 2)
            if node is None:
                return None
        return node.get(_DATA)

    # -- traversal / serialization (patricia.c:458-521, 583-612) -----------

    def items(self) -> list[tuple[bytes, Any]]:
        """All (word, data) pairs in byte-lexicographic order — the analogue
        of the reference's ordered edge traversal (tests/patricia.c:99-118)."""
        out: list[tuple[bytes, Any]] = []

        def walk(node: dict, prefix: bytearray):
            if node.get(_TERM):
                out.append((bytes(prefix), node.get(_DATA)))
            for k in sorted(k for k in node if isinstance(k, int) and k >= 2):
                prefix.append(k - 2)
                walk(node[k], prefix)
                prefix.pop()

        walk(self._root, bytearray())
        return out

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(MAGIC)
            pickle.dump(self.items(), f, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_file(cls, path: str) -> "PatriciaTrie":
        with open(path, "rb") as f:
            magic = f.read(len(MAGIC))
            if magic != MAGIC:
                raise ValueError(f"{path}: not a {MAGIC!r} trie file")
            items = pickle.load(f)
        t = cls()
        for word, data in items:
            t.insert(word, data)
        return t
