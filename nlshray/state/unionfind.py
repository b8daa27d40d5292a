"""Union-find (disjoint sets) with canonical min-label extraction.

Used driver-side over the (small) confirmed-pairs table — SURVEY.md §3.4.
When pairs exceed ``DedupConfig.max_driver_pairs`` the pipeline switches
to distributed min-label propagation (``nlshray.stages.cluster``) instead;
both produce identical labels (min doc_id per component) by construction.
"""

from __future__ import annotations


class UnionFind:
    """Path-halving + union-by-size. Keys are arbitrary ints."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}
        self.size: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def labels(self, keys) -> list[int]:
        """Canonical component label (min member id) for each key.

        Keys never seen by ``union`` are singletons labelled by
        themselves — cluster ids are therefore stable under input
        shuffling and parallelism (SURVEY.md §7.4 determinism).
        """
        root_min: dict[int, int] = {}
        for k in self.parent:
            r = self.find(k)
            m = root_min.get(r)
            if m is None or k < m:
                root_min[r] = k
        out = []
        for k in keys:
            k = int(k)
            if k in self.parent:
                out.append(root_min[self.find(k)])
            else:
                out.append(k)
        return out
