"""Pure-Python oracles for the north-rule graph algorithms.

Exact-match targets for the Spark implementations:
  * connected components  -> union-find (component id = min member)
  * label propagation     -> synchronous rounds, tie-break = smallest label
  * triangle counting     -> brute-force over deduplicated undirected edges
"""

from __future__ import annotations

from collections import Counter, defaultdict


def connected_components_np(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find; returns vertex -> component id (min vertex in component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # normalize: component id = min member
    members = defaultdict(list)
    for x in parent:
        members[find(x)].append(x)
    out = {}
    for root, vs in members.items():
        cid = min(vs + [root])
        for x in vs:
            out[x] = cid
    return out


def label_propagation_np(
    edges: list[tuple[str, str]], max_iter: int = 10
) -> dict[str, str]:
    """Synchronous LPA (Raghavan 2007), undirected, deterministic.

    Per round every vertex simultaneously takes the most frequent label among
    its DISTINCT neighbors (self-loops ignored); ties broken by smallest
    label; a vertex with no neighbors keeps its label. Stops when stable.
    """
    nbrs: dict[str, set] = defaultdict(set)
    verts = set()
    for u, v in edges:
        verts.update((u, v))
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs[v])
            best = max(counts.items(), key=lambda kv: (kv[1], _neg(kv[0])))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


class _neg:
    """Reverse-order wrapper so max() picks the smallest label on count ties."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return self.v > other.v


def triangle_count_np(edges: list[tuple[str, str]]):
    """Return (total_triangles, per_vertex: dict).

    Undirected simple graph: dedupe edges, drop self-loops.
    """
    adj: dict[str, set] = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    per = Counter()
    total = 0
    seen = set()
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    tri = (u, v, w)
                    if tri not in seen:
                        seen.add(tri)
                        total += 1
                        per[u] += 1
                        per[v] += 1
                        per[w] += 1
    return total, dict(per)
