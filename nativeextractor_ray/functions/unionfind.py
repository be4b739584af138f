"""Union-find for surface-form canonicalization.

The canonicalization stage collects alias edges with a groupby over
normalized surfaces (the shuffle), then resolves connected components with
this union-find on the driver — components are bounded by the distinct
surface vocabulary, not the corpus size (SURVEY.md §2.6)."""

from __future__ import annotations

from typing import Hashable, Iterable


class UnionFind:
    def __init__(self):
        self.parent: dict[Hashable, Hashable] = {}
        self.rank: dict[Hashable, int] = {}

    def find(self, x: Hashable) -> Hashable:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.rank[x] = 0
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: Hashable, b: Hashable) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def components(self) -> dict[Hashable, list]:
        out: dict[Hashable, list] = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return out


def canonicalize(
    edges: Iterable[tuple[Hashable, Hashable]],
    is_canonical=None,
) -> dict[Hashable, Hashable]:
    """Resolve alias edges to a member→canonical map.  The canonical member
    of a component is the smallest member satisfying ``is_canonical`` (e.g.
    "is a dictionary word"), falling back to the smallest member."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    out: dict[Hashable, Hashable] = {}
    for _, members in uf.components().items():
        cands = [m for m in members if is_canonical(m)] if is_canonical else []
        canon = min(cands) if cands else min(members)
        for m in members:
            out[m] = canon
    return out
