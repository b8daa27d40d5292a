"""Distance zoo over probability vectors — numpy ports of the
reference's code-distance kernels (``/root/reference/nlsh/learning/distances.py:46-242``),
golden-tested against the reference's own fixtures
(``nlsh/learning/tests/test_distances.py:11-38``).

Three batch shapes, as in the reference's ``_Distance`` duck type:
``rowwise (n,k)x(n,k)->(n)``, ``pairwise (n,k)x(m,k)->(n,m)``,
``row_pairwise (n,m,k)x(n,p,k)->(n,m,p)`` (einsum broadcast).

Faithful quirks, kept on purpose so the goldens pin the same function:
* Bernoulli KL **rowwise** takes the MEAN over k while the pairwise
  forms take the SUM (distances.py:84-103 — the reference does this);
* epsilon defaults differ: KL 1e-16, entropy/cross-entropy 1e-20;
* ``hellinger_categorical`` in the reference calls a misspelled
  ``F.pariwise_distance`` (distances.py:71) and would crash — ours is
  the corrected L2-on-sqrt form;
* L2 here is plain Euclidean (torch's ``pairwise_distance`` adds an
  eps=1e-6 inside the norm; we do not).
"""

from __future__ import annotations

import numpy as np

_KL_EPS = 1e-16
_CE_EPS = 1e-20
_Q_EPS = 1e-20


def _xlogy(p: np.ndarray, x: np.ndarray) -> np.ndarray:
    """p * log(x) with the 0 * log(.) := 0 convention (torch Categorical)."""
    out = np.zeros(np.broadcast_shapes(p.shape, x.shape))
    mask = p > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        vals = p * np.log(x)
    return np.where(mask, vals, 0.0)


def jsd_categorical(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Jensen-Shannon divergence between categorical rows (distances.py:46-61)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    m = (p + q) / 2
    kl_pm = _xlogy(p, np.where(m > 0, p / np.where(m > 0, m, 1.0), 1.0)).sum(-1)
    kl_qm = _xlogy(q, np.where(m > 0, q / np.where(m > 0, m, 1.0), 1.0)).sum(-1)
    return (kl_pm + kl_qm) / 2


def hellinger_categorical(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Hellinger distance between categorical rows (distances.py:64-72,
    with the reference's typo corrected)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    return np.linalg.norm(np.sqrt(p) - np.sqrt(q), axis=-1) / np.sqrt(2)


def entropy_bernoulli(p: np.ndarray, epsilon: float = _CE_EPS) -> np.ndarray:
    """Mean elementwise Bernoulli entropy (distances.py:120-123)."""
    p = np.asarray(p, dtype=np.float64)
    pos = -p * np.log(p + epsilon)
    neg = -(1 - p) * np.log(1 - p + epsilon)
    return (pos + neg).mean(-1)


def kl_bernoulli(
    p: np.ndarray, q: np.ndarray, epsilon: float = _KL_EPS
) -> np.ndarray:
    """Rowwise multivariate-Bernoulli KL, MEAN over bits (distances.py:75-84)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    pos = p * np.log(epsilon + p / (q + _Q_EPS))
    neg = (1 - p) * np.log(epsilon + (1 - p) / (1 - q + _Q_EPS))
    return (pos + neg).mean(-1)


def kl_bernoulli_pairwise(
    p: np.ndarray, q: np.ndarray, epsilon: float = _KL_EPS
) -> np.ndarray:
    """(n,k) x (m,k) -> (n,m), SUM over bits (distances.py:87-103)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    log_p_q = np.log(epsilon + np.einsum("nk,mk->nmk", p, 1 / (q + _Q_EPS)))
    positive = (p[:, None, :] * log_p_q).sum(-1)
    log_np_nq = np.log(
        epsilon + np.einsum("nk,mk->nmk", 1 - p, 1 / (1 - q + _Q_EPS))
    )
    negative = ((1 - p[:, None, :]) * log_np_nq).sum(-1)
    return positive + negative


def kl_bernoulli_row_pairwise(
    p: np.ndarray, q: np.ndarray, epsilon: float = _KL_EPS
) -> np.ndarray:
    """(n,m,k) x (n,p,k) -> (n,m,p) (distances.py:106-117)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    log_p_q = np.log(epsilon + np.einsum("nmk,npk->nmpk", p, 1 / (q + _Q_EPS)))
    positive = (p[:, :, None, :] * log_p_q).sum(-1)
    log_np_nq = np.log(
        epsilon + np.einsum("nmk,npk->nmpk", 1 - p, 1 / (1 - q + _Q_EPS))
    )
    negative = ((1 - p[:, :, None, :]) * log_np_nq).sum(-1)
    return positive + negative


def mean_kl_bernoulli(
    p: np.ndarray, q: np.ndarray, epsilon: float = _KL_EPS
) -> np.ndarray:
    """Symmetrized rowwise KL (distances.py:165-177)."""
    return (kl_bernoulli(p, q, epsilon) + kl_bernoulli(q, p, epsilon)) / 2


def mean_kl_bernoulli_pairwise(
    p: np.ndarray, q: np.ndarray, epsilon: float = _KL_EPS
) -> np.ndarray:
    """Symmetrized pairwise KL (distances.py:179-190)."""
    return (
        kl_bernoulli_pairwise(p, q, epsilon)
        + kl_bernoulli_pairwise(q, p, epsilon).T
    ) / 2


def cross_entropy_bernoulli(
    p: np.ndarray, q: np.ndarray, epsilon: float = _CE_EPS
) -> np.ndarray:
    """KL + entropy (distances.py:126-129)."""
    return kl_bernoulli(p, q, epsilon) + entropy_bernoulli(p, epsilon)


def cross_entropy_bernoulli_pairwise(
    p: np.ndarray, q: np.ndarray, epsilon: float = _CE_EPS
) -> np.ndarray:
    """Pairwise KL + row entropy broadcast (distances.py:222-231)."""
    return kl_bernoulli_pairwise(p, q, epsilon) + entropy_bernoulli(
        p, epsilon
    )[:, None]


def l2_rowwise(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    return np.linalg.norm(
        np.asarray(p, np.float64) - np.asarray(q, np.float64), axis=-1
    )


def l2_pairwise(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n,k) x (m,k) -> (n,m) Euclidean distances (MVBernoulliL2 /
    indexer re-rank role, distances.py:242-)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    sq = (
        (p * p).sum(-1)[:, None]
        + (q * q).sum(-1)[None, :]
        - 2.0 * (p @ q.T)
    )
    return np.sqrt(np.maximum(sq, 0.0))


def levenshtein_batch(left: list[str], right: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for a BATCH of string pairs at once.

    The DP recurrence's left-to-right dependency (``cur[j-1] + 1``) is a
    prefix minimum: ``cur[j] = min_k<=j (tent[k] + (j - k))``, so each DP
    row is one ``np.minimum.accumulate`` over (pairs, len_b) instead of a
    per-cell Python loop — O(max_len) vectorized row steps for the whole
    batch. Rows finish at their own length: when the row index hits a
    pair's actual left length, its distance is captured at its actual
    right length, so padding never leaks into results.
    """
    n = len(left)
    if n == 0:
        return np.zeros(0, np.int64)
    enc = [np.frombuffer(s.encode("utf-32-le"), np.uint32) for s in left]
    encb = [np.frombuffer(s.encode("utf-32-le"), np.uint32) for s in right]
    la = np.array([len(a) for a in enc], np.int64)
    lb = np.array([len(b) for b in encb], np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    A = np.zeros((n, max(La, 1)), np.uint32)
    B = np.full((n, max(Lb, 1)), np.uint32(0xFFFFFFFF), np.uint32)
    for r, (a, b) in enumerate(zip(enc, encb)):
        A[r, : len(a)] = a
        B[r, : len(b)] = b

    cols = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(cols, (n, Lb + 1)).copy()
    res = np.empty(n, np.int64)
    done0 = la == 0
    res[done0] = lb[done0]
    for i in range(1, La + 1):
        cost = (A[:, i - 1][:, None] != B).astype(np.int64)
        tent = np.empty((n, Lb + 1), np.int64)
        tent[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=tent[:, 1:])
        cur = np.minimum.accumulate(tent - cols, axis=1) + cols
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res
