"""Small shared numpy utilities for broadcast-lookup stages."""

from __future__ import annotations

import numpy as np


def isin_sorted(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership mask of ``vals`` against a SORTED key array.

    O(len(vals) * log(len(keys))) via searchsorted — the per-batch
    membership test used by every broadcast semi-join in the engine.
    Safe for empty ``keys`` (all-false) and empty ``vals``.
    """
    if keys.shape[0] == 0 or vals.shape[0] == 0:
        return np.zeros(vals.shape[0], dtype=bool)
    idx = np.searchsorted(keys, vals)
    idx[idx == keys.shape[0]] = 0
    return keys[idx] == vals


def lookup_sorted(
    keys: np.ndarray, values: np.ndarray, queries: np.ndarray, default: np.ndarray
) -> np.ndarray:
    """For each query, ``values[pos(key)]`` if present in SORTED ``keys``,
    else the corresponding ``default`` element."""
    if keys.shape[0] == 0 or queries.shape[0] == 0:
        return default.copy() if queries.shape[0] else default[:0].copy()
    idx = np.searchsorted(keys, queries)
    idx[idx == keys.shape[0]] = 0
    hit = keys[idx] == queries
    return np.where(hit, values[idx], default)

def lexsort2(secondary: np.ndarray, primary: np.ndarray) -> np.ndarray:
    """``np.lexsort((secondary, primary))`` via two stable argsorts.

    np.lexsort has no radix path — measured 2.9 s on 2.2M int64 keys
    where two stable argsorts (radix on integer dtypes) take 0.9 s.
    Semantically identical: sort by ``primary``, ties by ``secondary``,
    remaining ties by position (both routes are stable).
    """
    o1 = np.argsort(secondary, kind="stable")
    return o1[np.argsort(primary[o1], kind="stable")]


def segmented_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(start_i, start_i + len_i)`` per segment.

    Built with one boundary scatter + one cumsum instead of
    ``np.repeat`` — repeat allocates (and first-touches) 3x the output
    and runs ~12M elem/s on this class of host, where the cumsum form is
    two linear passes over the single output buffer. Zero-length
    segments contribute nothing.
    """
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    nz = lens > 0
    s = starts[nz].astype(np.int64, copy=False)
    L = lens[nz].astype(np.int64, copy=False)
    out = np.ones(total, dtype=np.int64)
    out[0] = s[0]
    if s.shape[0] > 1:
        bounds = np.cumsum(L)[:-1]
        out[bounds] = s[1:] - s[:-1] - L[:-1] + 1
    return np.cumsum(out)


def segment_ids(lens: np.ndarray) -> np.ndarray:
    """Segment index per element of the concatenated ragged array
    (the ``np.repeat(arange(n), lens)`` result, without the repeat).

    Zero-length segments are handled: consecutive boundaries landing on
    the same element accumulate, so their ids are skipped exactly as
    repeat would."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    marks = np.zeros(total, dtype=np.int64)
    ends = np.cumsum(lens)[:-1]
    ends = ends[ends < total]
    np.add.at(marks, ends, 1)
    return np.cumsum(marks)


def segmented_rev_arange(lens: np.ndarray) -> np.ndarray:
    """Concatenated ``[len_i - 1, ..., 1, 0]`` per segment (descending),
    same cumsum construction as ``segmented_arange``."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    L = lens[lens > 0].astype(np.int64, copy=False)
    out = np.full(total, -1, dtype=np.int64)
    out[0] = L[0] - 1
    if L.shape[0] > 1:
        bounds = np.cumsum(L)[:-1]
        out[bounds] = L[1:] - 1
    return np.cumsum(out)
