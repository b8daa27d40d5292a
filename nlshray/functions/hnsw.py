"""Pure-numpy HNSW graph index (Malkov & Yashunin, arXiv:1603.09320).

The reference benchmarks its learned hasher against an hnswlib HNSW
competitor (``/root/reference/nlsh/trainers/hnsw.py:28-48``: cosine
space, M=10 max connections, ef_construction=500, ef=40, k=10). hnswlib
is not available in this environment, and the engine should carry its
own recall baseline anyway, so the competitor is re-implemented here
library-free; the defaults mirror the reference's settings (with
ef_construction scaled down — shards here are far smaller than the
reference's 1.18M-vector corpus).

Determinism — the property hnswlib does NOT give us: hnswlib assigns
node levels from an internal RNG, so two builds differ. Here the level
of a node is ``floor(-ln(u) * 1/ln(M))`` with ``u`` derived from
``splitmix64(vec_id ^ seed)``, and inserts happen in sorted-vec_id
order, so for a fixed member set the graph — and every query answer — is
bit-identical at any parallelism. Shard membership itself is fixed by
``vec_id % n_shards`` in the stage wrapper (``stages/ann.knn_hnsw``),
never by block boundaries.

Scale posture: one graph per shard (bounded memory, parallel build),
per-shard top-k merged by an exact per-query re-rank — the standard
distributed-HNSW layout. The insert loop is sequential per shard (the
algorithm is inherently incremental) but every distance evaluation is a
vectorized numpy matmul over the candidate's neighbor list.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from nlshray.hashing import splitmix64

__all__ = ["HNSWIndex", "assign_levels"]


def assign_levels(ids: np.ndarray, m: int, seed: int) -> np.ndarray:
    """Deterministic HNSW level per node: the paper's geometric draw
    ``floor(-ln(u) * mL)`` with ``u`` uniform from splitmix64(id ^ seed)
    instead of an RNG stream (insert-order independence)."""
    mix = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 1315423911 + 7))
    # top 53 bits -> uniform (0, 1]; +1 ulp-ish offset avoids log(0)
    u = ((mix >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
    ml = 1.0 / math.log(m)
    return np.floor(-np.log(u) * ml).astype(np.int64)


class HNSWIndex:
    """In-memory HNSW over unit-normalized vectors, cosine distance
    (``1 - dot``). Built once per shard inside a ``map_groups`` task."""

    def __init__(self, mat: np.ndarray, ids: np.ndarray, levels: np.ndarray,
                 m: int, ef_construction: int):
        self._mat = mat                    # (n, dim) unit-normalized
        self._ids = ids                    # global vec_ids, sorted
        self._levels = levels
        self._m = m
        self._m0 = 2 * m
        self._ef_c = ef_construction
        top = int(levels.max()) if len(levels) else 0
        # adjacency: per layer, per node, python list of node indices
        self._links: list[list[list[int] | None]] = [
            [None] * len(ids) for _ in range(top + 1)
        ]
        self._entry = -1
        self._top = -1

    # -- construction ------------------------------------------------------

    @classmethod
    def build(cls, mat: np.ndarray, ids: np.ndarray, *, m: int = 10,
              ef_construction: int = 100, seed: int = 0) -> "HNSWIndex":
        """Insert all rows in sorted-id order (caller pre-sorts)."""
        levels = assign_levels(ids, m, seed)
        idx = cls(mat, ids, levels, m, ef_construction)
        for i in range(len(ids)):
            idx._insert(i)
        return idx

    def _dist(self, q: np.ndarray, nodes: list[int] | np.ndarray) -> np.ndarray:
        return 1.0 - self._mat[nodes] @ q

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        """Beam search within one layer; returns up to ef (dist, node)
        pairs, unsorted. Standard algorithm 2 of the paper."""
        dists = self._dist(q, eps)
        visited = set(eps)
        cand = sorted(zip(dists.tolist(), eps))          # min-heap by dist
        best = [(-d, n) for d, n in cand[:ef]]           # max-heap (neg dist)
        heapq.heapify(best)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nbrs = [n for n in self._links[layer][c] if n not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            nd = self._dist(q, nbrs)
            bound = -best[0][0]
            for dn, n in zip(nd.tolist(), nbrs):
                if dn < bound or len(best) < ef:
                    heapq.heappush(cand, (dn, n))
                    heapq.heappush(best, (-dn, n))
                    if len(best) > ef:
                        heapq.heappop(best)
                    bound = -best[0][0]
        return [(-nd, n) for nd, n in best]

    def _shrink(self, node: int, layer: int, mmax: int) -> None:
        links = self._links[layer][node]
        if len(links) <= mmax:
            return
        d = self._dist(self._mat[node], links)
        keep = np.argsort(d, kind="stable")[:mmax]
        self._links[layer][node] = [links[j] for j in keep]

    def _insert(self, i: int) -> None:
        l = int(self._levels[i])
        if self._entry < 0:
            for layer in range(l + 1):
                self._links[layer][i] = []
            self._entry, self._top = i, l
            return
        q = self._mat[i]
        ep = [self._entry]
        # greedy descent above the node's level
        for layer in range(self._top, l, -1):
            ep = [min(self._search_layer(q, ep, 1, layer))[1]]
        # connect on layers min(top, l) .. 0
        for layer in range(min(self._top, l), -1, -1):
            w = sorted(self._search_layer(q, ep, self._ef_c, layer))
            mmax = self._m0 if layer == 0 else self._m
            nbrs = [n for _, n in w[: self._m]]
            self._links[layer][i] = list(nbrs)
            for n in nbrs:
                self._links[layer][n].append(i)
                self._shrink(n, layer, mmax)
            ep = [n for _, n in w]
        if l > self._top:
            for layer in range(self._top + 1, l + 1):
                self._links[layer][i] = []
            self._entry, self._top = i, l

    # -- serialization (S5/S6 parity: build once, reload per query run) ----

    def to_arrays(self) -> dict[str, np.ndarray]:
        """Flatten the graph to dense arrays for an npz artifact.

        Per layer L: ``pL`` present-mask (distinguishes unreached nodes
        from empty neighbor lists), ``fL`` concatenated neighbor ids,
        ``oL`` per-node lengths. Plus vectors, ids, levels and scalars.
        """
        out: dict[str, np.ndarray] = {
            "mat": self._mat,
            "ids": self._ids,
            "levels": self._levels,
            "meta": np.array(
                [self._m, self._ef_c, self._entry, self._top, len(self._links)],
                dtype=np.int64,
            ),
        }
        for L, layer in enumerate(self._links):
            present = np.array([x is not None for x in layer], dtype=bool)
            lens = np.array(
                [len(x) if x is not None else 0 for x in layer], dtype=np.int64
            )
            flat = (
                np.concatenate([np.asarray(x, dtype=np.int64) for x in layer
                                if x is not None and len(x)])
                if lens.sum()
                else np.empty(0, np.int64)
            )
            out[f"p{L}"] = present
            out[f"o{L}"] = lens
            out[f"f{L}"] = flat
        return out

    @classmethod
    def from_arrays(cls, arrays: dict[str, np.ndarray]) -> "HNSWIndex":
        m, ef_c, entry, top, n_layers = (int(x) for x in arrays["meta"])
        idx = cls(arrays["mat"], arrays["ids"], arrays["levels"], m, ef_c)
        links: list[list[list[int] | None]] = []
        for L in range(n_layers):
            present = arrays[f"p{L}"]
            lens = arrays[f"o{L}"]
            flat = arrays[f"f{L}"].tolist()
            ends = np.cumsum(lens)
            starts = ends - lens
            layer: list[list[int] | None] = [
                flat[starts[i] : ends[i]] if present[i] else None
                for i in range(len(present))
            ]
            links.append(layer)
        idx._links = links
        idx._entry, idx._top = entry, top
        return idx

    # -- query -------------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int = 40
               ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (global vec_ids, cosine sims), best first; deterministic
        tie-break (-sim, id) matching ``ann._finalize_topk``."""
        if self._entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = [self._entry]
        for layer in range(self._top, 0, -1):
            ep = [min(self._search_layer(q, ep, 1, layer))[1]]
        w = self._search_layer(q, ep, max(ef, k), 0)
        d = np.array([x[0] for x in w])
        n = np.array([x[1] for x in w], dtype=np.int64)
        sims = 1.0 - d
        order = np.lexsort((self._ids[n], -sims))[:k]
        return self._ids[n][order], sims[order]
