"""SimHash: 64-bit similarity-preserving document hash.

The engine's second signature family (SURVEY.md §2.10: pluggable Signer
behind one interface — the descendant of the reference's hashing duck
type, ``/root/reference/nlsh/hashings.py:11-139``). Where MinHash
estimates Jaccard, SimHash estimates cosine over the token-frequency
space: each token hash votes its bits weighted by frequency; the sign of
each accumulated bit becomes one signature bit. Near-dups differ in few
bits (small Hamming distance).

Batch kernel: one (n_tokens, 64) unpack per doc batch, fully numpy.
"""

from __future__ import annotations

import numpy as np

from nlshray.functions.shingles import tokenize
from nlshray.hashing import hash_str_array, splitmix64

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def simhash_tokens(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of one doc's token-hash multiset."""
    if token_hashes.shape[0] == 0:
        return 0
    bits = (token_hashes[:, None] & _BITS[None, :]) != 0  # (n, 64) bool
    w = (
        weights[:, None]
        if weights is not None
        else np.ones((token_hashes.shape[0], 1))
    )
    votes = (np.where(bits, 1.0, -1.0) * w).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= _BITS[b]
    return int(out)


def simhash_text(text: str, seed: int = 0) -> int:
    toks = tokenize(text)
    if not toks:
        return 0
    # weight by frequency via unique counts (vote per distinct token x count)
    th = hash_str_array(toks, seed=seed)
    uniq, counts = np.unique(th, return_counts=True)
    return simhash_tokens(splitmix64(uniq), counts.astype(np.float64))


def simhash_batch(texts, seed: int = 0) -> np.ndarray:
    return np.array([simhash_text(t, seed=seed) for t in texts], dtype=np.uint64)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise popcount of XOR over uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(
        np.uint8
    ).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1)
