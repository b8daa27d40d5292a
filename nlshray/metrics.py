"""Evaluation metrics — dup-pair recall/precision vs the exact oracle.

Port of the reference's recall semantics (``/root/reference/nlsh/metrics.py:4-25``:
``len(set(y_true) & set(y_pred)) / len(y_true)`` per query, then mean),
restated over pairs: an oracle dup pair counts as recalled iff both docs
land in the same predicted cluster. The reference left its metric
untested (``# TODO: unittest`` at ``metrics.py:15``); ours has goldens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _label_lookup(clusters: pa.Table) -> dict[int, int]:
    return dict(
        zip(
            clusters["doc_id"].to_pylist(),
            clusters["cluster_id"].to_pylist(),
        )
    )


def dup_pair_recall(clusters: pa.Table, true_pairs: pa.Table) -> float:
    """Fraction of oracle is_dup pairs whose docs share a predicted cluster."""
    labels = _label_lookup(clusters)
    mask = true_pairs["is_dup"].to_numpy(zero_copy_only=False)
    lefts = true_pairs["left_id"].to_numpy()[mask]
    rights = true_pairs["right_id"].to_numpy()[mask]
    if lefts.shape[0] == 0:
        return 1.0
    hit = sum(
        1
        for a, b in zip(lefts.tolist(), rights.tolist())
        if labels.get(a) == labels.get(b) and labels.get(a) is not None
    )
    return hit / lefts.shape[0]


def dup_pair_precision(clusters: pa.Table, true_pairs: pa.Table) -> float:
    """Fraction of predicted same-cluster pairs that are oracle dups.

    Predicted pairs are enumerated per cluster (clusters are small);
    oracle pairs indexed by canonical (left, right).
    """
    truth = set(
        zip(
            true_pairs["left_id"].to_numpy()[
                true_pairs["is_dup"].to_numpy(zero_copy_only=False)
            ].tolist(),
            true_pairs["right_id"].to_numpy()[
                true_pairs["is_dup"].to_numpy(zero_copy_only=False)
            ].tolist(),
        )
    )
    by_cluster: dict[int, list[int]] = {}
    for d, c in zip(
        clusters["doc_id"].to_pylist(), clusters["cluster_id"].to_pylist()
    ):
        by_cluster.setdefault(c, []).append(d)
    n_pred = 0
    n_hit = 0
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                n_pred += 1
                if (members[i], members[j]) in truth:
                    n_hit += 1
    return n_hit / n_pred if n_pred else 1.0


def recall_at_k(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Set-overlap recall of two id lists (the reference's per-query
    metric, ``nlsh/metrics.py:4-7``), used by the ANN stage tests."""
    ts, ps = set(y_true.tolist()), set(y_pred.tolist())
    return len(ts & ps) / len(ts) if ts else 1.0
