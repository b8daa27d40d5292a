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
