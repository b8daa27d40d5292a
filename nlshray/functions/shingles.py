"""Text -> token -> k-shingle hash kernels.

The engine's analog of the reference's input featurization (there: dense
GloVe/SIFT vectors loaded from HDF5, ``/root/reference/nlsh/data.py:23-49``;
here: web text reduced to a set of k-token shingle hashes). Batch layout
mirrors the reference's batch-first shape (``nlsh/hashings.py:66-85``):
one flat concatenated hash array + per-doc lengths, ready for
``np.minimum.reduceat`` in the MinHash stage.
"""

from __future__ import annotations

import re

import numpy as np

from nlshray.hashing import hash_str_array, poly_fold, shingle_hashes

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# sentinel shingle for documents with zero tokens: all empty docs share
# one shingle set -> they hash identically (and are exact dups anyway)
_EMPTY_SENTINEL = np.uint64(0xE117E117E117E117)


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens. Pure function of the text bytes."""
    return _TOKEN_RE.findall(text.lower())


def doc_shingle_hashes(
    text: str, k: int, seed: int = 0, unique: bool = False
) -> np.ndarray:
    """uint64 shingle hashes of one document (always >= 1 element).

    Documents shorter than k tokens contribute their whole token sequence
    as a single shingle; empty documents contribute the sentinel shingle.
    ``unique=True`` dedupes (needed for exact set Jaccard; the min of a
    multiset equals the min of its set, so MinHash skips it).
    """
    toks = tokenize(text)
    if not toks:
        return np.array([_EMPTY_SENTINEL], dtype=np.uint64)
    th = hash_str_array(toks, seed=seed)
    if len(toks) < k:
        return poly_fold(th[None, :])
    sh = shingle_hashes(th, k)
    return np.unique(sh) if unique else sh


def batch_shingle_hashes(
    texts, k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """All shingle hashes for a batch of texts.

    Returns ``(flat, lengths)``: ``flat`` concatenates every document's
    shingle hashes, ``lengths[i] >= 1`` is document i's count. This flat
    +offsets layout is what keeps the MinHash stage a pure reduceat —
    no per-document python in the hot loop after tokenization.
    """
    parts = [doc_shingle_hashes(t, k, seed=seed) for t in texts]
    lengths = np.array([p.shape[0] for p in parts], dtype=np.int64)
    flat = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )
    return flat, lengths


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash *sets* (inputs must be unique)."""
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union if union else 1.0
