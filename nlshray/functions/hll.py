"""HyperLogLog: mergeable approximate-distinct-count sketch.

The A7 sketch family's cardinality member (alongside MinHash, SimHash
and Bloom): per-block register partials merge by elementwise max, so
the 100-TB plan is one vectorized map pass emitting a fixed
``2^P``-byte register array per block and a driver-side max-merge of
O(blocks) tiny arrays — no shuffle, no driver data loop, and the
result is EXACTLY deterministic at any parallelism (max is
order-independent).

Standard HLL (Flajolet et al. 2007): register j holds the max rank
(leading-zero run + 1) of hashes routed to it by their top P bits;
bias-corrected harmonic-mean estimate with the linear-counting
small-range correction. 64-bit hashes need no large-range correction.
P=14 -> 16 KiB registers, ~0.81% standard error.

Reference parity: the reference has no sketches at all (exact HDF5
ground truth only, ``/root/reference/nlsh/data.py``); this extends the
engine's own sketch surface.
"""

from __future__ import annotations

import numpy as np

P = 14
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 -> 0)."""
    x = x.copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = x >> np.uint64(s)
        hi = t > 0
        bl[hi] += s
        x = np.where(hi, t, x)
    bl += x > 0
    return bl


def hll_partial(hashes: np.ndarray, regs: np.ndarray | None = None) -> np.ndarray:
    """Fold uint64 hashes into an HLL register array (uint8, len M).
    Pass an existing ``regs`` to accumulate in place."""
    if regs is None:
        regs = np.zeros(M, np.uint8)
    h = np.ascontiguousarray(hashes, np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h << np.uint64(P)
    # rank = leading zeros of the remaining 64-P bits + 1; rest's low P
    # bits are zero fill, so clz(rest) counts exactly those bits (capped
    # below for rest == 0).
    rank = np.minimum(64 - _bit_length_u64(rest) + 1, 64 - P + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches = elementwise max (associative/commutative)."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with small-range correction."""
    r = regs.astype(np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-r))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * M and zeros > 0:
        return float(M * np.log(M / zeros))
    return float(e)
