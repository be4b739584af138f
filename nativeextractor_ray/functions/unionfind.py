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


def connected_components_ds(edges, max_iters: int = 25):
    """Distributed connected components over an edge Dataset
    ``(a: string, b: string)`` — the union-find scale path for
    canonicalization when the alias vocabulary no longer fits the driver.

    Iterative min-label propagation: every node starts labeled with
    itself; each round every edge proposes its endpoints' labels to the
    other side and ``groupby(node).min(label)`` adopts the smallest.
    Converges in O(component diameter) rounds (checked each round via a
    changed-count aggregate; stops early at fixpoint).  Each round is one
    map over a *cached* edge list + one small shuffle over (node, label)
    — edges are materialized once and never reshuffled.

    Returns a Dataset ``(node: string, component: string)`` where
    ``component`` is the lexicographically smallest member.
    """
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Min

    edges = edges.materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        return pa.table({"node": nodes, "label": nodes})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    for _ in range(max_iters):
        # broadcast the current labels (node→label map); at vocabulary
        # sizes beyond a broadcast this becomes edges.join(labels) twice —
        # same propagation, heavier shuffle
        lab_tables = [ray.get(r) for r in labels.to_arrow_refs()]
        lab_map = {}
        for t in lab_tables:
            lab_map.update(zip(t.column("node").to_pylist(),
                               t.column("label").to_pylist()))
        ref = ray.put(lab_map)

        def propose(t: pa.Table, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            a = t.column("a").to_pylist()
            b = t.column("b").to_pylist()
            n_out, l_out = [], []
            for x, y in zip(a, b):
                lx, ly = m.get(x, x), m.get(y, y)
                if lx < ly:
                    n_out.append(y); l_out.append(lx)
                elif ly < lx:
                    n_out.append(x); l_out.append(ly)
            return pa.table({"node": pa.array(n_out, pa.string()),
                             "label": pa.array(l_out, pa.string())})

        proposals = edges.map_batches(propose, batch_format="pyarrow")
        new_labels = (
            labels.union(proposals)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # fixpoint when no node's label shrank
        changed = 0
        new_tables = [ray.get(r) for r in new_labels.to_arrow_refs()]
        for t in new_tables:
            for n, l in zip(t.column("node").to_pylist(), t.column("label").to_pylist()):
                if lab_map.get(n, n) != l:
                    changed += 1
        labels = new_labels
        if changed == 0:
            break

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "component": t.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


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
