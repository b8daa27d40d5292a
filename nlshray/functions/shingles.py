"""Text -> token -> k-shingle hash kernels (fully vectorized).

The engine's analog of the reference's input featurization (there: dense
GloVe/SIFT vectors loaded from HDF5, ``/root/reference/nlsh/data.py:23-49``;
here: web text reduced to a set of k-token shingle hashes). Batch layout
mirrors the reference's batch-first shape (``nlsh/hashings.py:66-85``):
one flat concatenated hash array + per-doc lengths, ready for
``np.minimum.reduceat`` in the MinHash stage.

Hot path: tokenization runs in Arrow's C++ RE2 split kernel
(``utf8_lower`` + ``split_pattern_regex``), token hashing is a segmented
polynomial fold over the raw utf-8 byte buffer, and shingle windows are
computed across the whole batch's flat token-hash array at once — no
per-document python anywhere. (Round-1 profiling: per-token python
blake2b was the pipeline's serial floor at ~585 docs/s/core.)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nlshray.functions.nputil import lexsort2, segment_ids, segmented_arange

from nlshray.hashing import (
    _POLY,
    _seed_mix,
    _string_array_bytes,
    poly_fold_ragged,
    splitmix64,
)

# ONE token definition for scalar and batch paths: maximal runs of
# [0-9a-z_] in the lowercased text. ASCII-only ON PURPOSE — the batch
# path runs in Arrow's RE2 split kernel, whose fast byte-class scan
# can't match python's Unicode \w, and a scalar/batch divergence would
# change query semantics across size-routing boundaries (non-ASCII word
# chars act as separators in BOTH paths; tested on de/fr text).
_TOKEN_RE = re.compile(r"[0-9a-z_]+")
_SPLIT_PATTERN = r"[^0-9a-z_]+"

# sentinel shingle for documents with zero tokens: all empty docs share
# one shingle set -> they hash identically (and are exact dups anyway)
_EMPTY_SENTINEL = np.uint64(0xE117E117E117E117)


def tokenize(text: str) -> list[str]:
    """Lowercased ASCII word tokens ([0-9a-z_]+ runs). Pure function of
    the text bytes, identical to the batch RE2 tokenizer by definition."""
    return _TOKEN_RE.findall(text.lower())


def _as_string_array(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(list(texts), pa.string())
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    return texts


def batch_token_hashes(texts, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tokenize+hash for a batch of texts.

    Returns ``(flat_hashes, counts)``: ``flat_hashes`` concatenates every
    document's token hashes in order; ``counts[i]`` is doc i's token
    count (0 for empty docs). Tokens are the ``[0-9a-z_]+`` runs of the
    lowercased text (same definition as the scalar ``tokenize``); hashes
    are ``splitmix64(poly_fold(bytes) ^ seed)``.
    """
    arr = _as_string_array(texts)
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    # split emits empty strings at text edges; hash everything then drop
    data, lengths = _string_array_bytes(flat)
    raw = poly_fold_ragged(data, lengths)
    hashes = splitmix64(raw ^ _seed_mix(seed))
    keep = lengths > 0
    # per-doc kept-token counts (cumsum trick is empty-doc safe)
    per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    per_doc = per_doc.astype(np.int64)
    doc_ends = np.cumsum(per_doc)
    csk = np.concatenate([[0], np.cumsum(keep)])
    counts = csk[doc_ends] - csk[doc_ends - per_doc]
    return hashes[keep], counts


def _segmented_positions(seg_starts: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(start, start+len)`` per segment (boundary
    scatter + cumsum — see ``nputil.segmented_arange``)."""
    return segmented_arange(seg_starts, seg_lens)


def batch_shingle_hashes(
    texts, k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """All shingle hashes for a batch of texts.

    Returns ``(flat, lengths)``: ``flat`` concatenates every document's
    shingle hashes, ``lengths[i] >= 1`` is document i's count. Documents
    shorter than k tokens contribute their whole token sequence as a
    single shingle; empty documents contribute the sentinel shingle.
    This flat+offsets layout keeps the MinHash stage a pure reduceat.
    """
    th, counts = batch_token_hashes(texts, seed=seed)
    n_docs = counts.shape[0]
    if n_docs == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    doc_ends = np.cumsum(counts)
    doc_starts = doc_ends - counts
    m = th.shape[0]

    long_mask = counts >= k
    short_mask = (counts > 0) & ~long_mask
    empty_mask = counts == 0
    out_lengths = np.where(long_mask, counts - k + 1, 1).astype(np.int64)
    out_ends = np.cumsum(out_lengths)
    out_starts = out_ends - out_lengths
    flat_out = np.empty(int(out_lengths.sum()), dtype=np.uint64)

    if long_mask.any():
        # k-window polynomial fold across the whole flat token array at
        # once; then keep only windows fully inside one long document
        W = m - k + 1
        acc = np.zeros(W, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(k):
                acc = acc * _POLY + th[i : W + i]
        wh = splitmix64(acc)
        delta = np.zeros(W + 1, dtype=np.int64)
        ls = doc_starts[long_mask]
        le = ls + counts[long_mask] - k + 1
        np.add.at(delta, ls, 1)
        np.add.at(delta, le, -1)
        valid = np.cumsum(delta[:-1]) > 0
        tgt = _segmented_positions(
            out_starts[long_mask], out_lengths[long_mask]
        )
        flat_out[tgt] = wh[valid]

    if short_mask.any():
        member = np.repeat(short_mask, counts)
        short_raw = poly_fold_ragged(th[member], counts[short_mask])
        flat_out[out_starts[short_mask]] = splitmix64(short_raw)

    if empty_mask.any():
        flat_out[out_starts[empty_mask]] = _EMPTY_SENTINEL

    return flat_out, out_lengths


def doc_shingle_hashes(
    text: str, k: int, seed: int = 0, unique: bool = False
) -> np.ndarray:
    """uint64 shingle hashes of one document (always >= 1 element).

    Documents shorter than k tokens contribute their whole token sequence
    as a single shingle; empty documents contribute the sentinel shingle.
    ``unique=True`` dedupes (needed for exact set Jaccard; the min of a
    multiset equals the min of its set, so MinHash skips it).
    Delegates to the batch kernel so per-doc and batch paths are one
    implementation (verify's exact Jaccard must live in the same hash
    space as the signatures).
    """
    flat, _lengths = batch_shingle_hashes([text], k, seed=seed)
    return np.unique(flat) if unique else flat


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash *sets* (inputs must be unique)."""
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union if union else 1.0


def segmented_unique(
    flat: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted-unique of a ragged flat array, fully vectorized.

    ``flat`` concatenates ``len(lengths)`` segments; returns
    ``(new_flat, new_lengths)`` where each segment has been replaced by
    its sorted distinct values — one lexsort over the whole batch, no
    per-segment python (the batch analog of ``np.unique`` per doc).
    """
    n = lengths.shape[0]
    if flat.shape[0] == 0:
        return flat, np.zeros(n, dtype=np.int64)
    seg = segment_ids(lengths)
    order = lexsort2(flat, seg)
    f = flat[order]
    s = seg[order]
    keep = np.empty(f.shape[0], dtype=bool)
    keep[0] = True
    keep[1:] = (f[1:] != f[:-1]) | (s[1:] != s[:-1])
    return f[keep], np.bincount(s[keep], minlength=n).astype(np.int64)
