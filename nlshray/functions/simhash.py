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

from nlshray.functions.nputil import lexsort2, segment_ids
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
    """Vectorized ``simhash_text`` for a batch (identical values).

    One Arrow tokenize+hash pass, per-doc unique+count via a global
    lexsort run-detect, then 64 bit-vote columns summed with one
    segmented reduceat — no per-document python."""
    from nlshray.functions.shingles import batch_token_hashes

    th, counts = batch_token_hashes(texts, seed=seed)
    n_docs = counts.shape[0]
    out = np.zeros(n_docs, dtype=np.uint64)
    if th.shape[0] == 0:
        return out
    doc_of = segment_ids(counts)
    order = lexsort2(th, doc_of)
    th_s, doc_s = th[order], doc_of[order]
    new_run = np.concatenate(
        [[True], (th_s[1:] != th_s[:-1]) | (doc_s[1:] != doc_s[:-1])]
    )
    run_starts = np.flatnonzero(new_run)
    run_counts = np.diff(np.concatenate([run_starts, [th_s.shape[0]]]))
    uniq = th_s[run_starts]
    run_doc = doc_s[run_starts]
    mixed = splitmix64(uniq)
    bits = (mixed[:, None] & _BITS[None, :]) != 0          # (n_runs, 64)
    contrib = np.where(bits, run_counts[:, None], -run_counts[:, None])
    # segment-sum votes per doc (every doc with tokens has >= 1 run)
    doc_run_starts = np.flatnonzero(
        np.concatenate([[True], run_doc[1:] != run_doc[:-1]])
    )
    votes = np.add.reduceat(contrib, doc_run_starts, axis=0)
    docs_with_tokens = run_doc[doc_run_starts]
    packed = ((votes > 0).astype(np.uint64) @ _BITS.astype(np.uint64))
    out[docs_with_tokens] = packed
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise popcount of XOR over uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(
        np.uint8
    ).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1)
