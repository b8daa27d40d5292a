"""Union-find and recall goldens (FIXTURES.md §4: 'union-find golden',
'recall golden' — the reference left recall untested, nlsh/metrics.py:15)."""

import pyarrow as pa

from nlshray.metrics import dup_pair_precision, dup_pair_recall, recall_at_k
from nlshray.state.unionfind import UnionFind

import numpy as np


def test_unionfind_golden():
    uf = UnionFind()
    for a, b in [(1, 2), (2, 3), (5, 6)]:
        uf.union(a, b)
    labels = uf.labels([1, 2, 3, 4, 5, 6, 7])
    assert labels == [1, 1, 1, 4, 5, 5, 7]


def test_unionfind_order_invariant():
    edges = [(10, 20), (20, 30), (40, 50), (30, 40)]
    uf1, uf2 = UnionFind(), UnionFind()
    for a, b in edges:
        uf1.union(a, b)
    for a, b in reversed(edges):
        uf2.union(b, a)
    keys = [10, 20, 30, 40, 50]
    assert uf1.labels(keys) == uf2.labels(keys) == [10] * 5


def test_recall_at_k_golden():
    assert recall_at_k(np.array([1, 2, 3]), np.array([2, 3, 9])) == 2 / 3
    assert recall_at_k(np.array([1]), np.array([])) == 0.0
    assert recall_at_k(np.array([]), np.array([1])) == 1.0


def _clusters(pairs):
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], pa.int64()),
            "cluster_id": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )


def _truth(rows):
    return pa.table(
        {
            "left_id": pa.array([r[0] for r in rows], pa.int64()),
            "right_id": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
            "is_dup": pa.array([r[3] for r in rows]),
        }
    )


def test_dup_pair_recall_golden():
    clusters = _clusters([(1, 1), (2, 1), (3, 3), (4, 4)])
    truth = _truth([(1, 2, 0.9, True), (3, 4, 0.85, True), (1, 3, 0.2, False)])
    assert dup_pair_recall(clusters, truth) == 0.5  # (1,2) found, (3,4) missed


def test_dup_pair_precision_golden():
    # predicted pairs: (1,2),(1,3),(2,3); truth dups: (1,2) only
    clusters = _clusters([(1, 1), (2, 1), (3, 1)])
    truth = _truth([(1, 2, 0.9, True)])
    assert dup_pair_precision(clusters, truth) == 1 / 3
