"""Distributed spherical k-means over the embeddings table.

``fit_ivf_centroids`` (stages/ann.py) fits Lloyd's on a driver-side
sample — the right call for a coarse quantizer. This module is the
FULL-CORPUS fit: every iteration is one task round over the pinned
embedding blocks (assign = one matmul against the broadcast centroid
matrix; per-block partial = k x d cluster sums + counts), with the
driver doing only the tiny k x d reduce + re-normalize between rounds.
That is the classic scale shape: per-round data movement is
``blocks x k x (d + 1)`` numbers regardless of corpus size, and the
corpus itself never moves after the initial read.

Two determinism guarantees (both pytest-gated):

- **Parallelism independence.** Float partial sums would make centroid
  bits depend on block boundaries; instead each vector's contribution
  is quantized ONCE to fixed-point int64 (``round(x * 2^20)``) and the
  cluster sums are integer sums — associative and commutative, so any
  partitioning produces bit-identical centroids (the ``stages/lm.py``
  micro-nat trick applied to vector accumulation).
- **Seeded init without an RNG stream.** The k seeds are the vectors
  with the smallest ``splitmix64(vec_id ^ seed)`` — a global order any
  partitioning agrees on (same device as ``stages/topk.py`` sampling).

Reference parity: the reference's trainers iterate batched passes over
an in-memory matrix with a fixed batch driver (/root/reference/nlsh/
trainers/base.py); this is that loop re-expressed as Ray task rounds
over resident blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from nlshray.hashing import splitmix64

_FP = np.int64(1 << 20)  # fixed-point scale for order-independent sums


def _block_mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, unit-normalized float64 matrix) for one block."""
    ids = t["vec_id"].to_numpy()
    col = t["embedding"].combine_chunks()
    flat = np.asarray(col.values, dtype=np.float64)
    d = flat.shape[0] // max(len(t), 1)
    X = flat.reshape(len(t), d)
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return ids, X / nrm


@ray.remote
def _init_candidates(t: pa.Table, k: int, seed: int) -> pa.Table:
    """Block-local k smallest splitmix64(vec_id ^ seed) rows."""
    if len(t) == 0:
        return pa.table(
            {
                "h": pa.array([], pa.uint64()),
                "vec_id": pa.array([], pa.int64()),
                "emb": pa.array([], pa.list_(pa.float64())),
            }
        )
    ids, X = _block_mat(t)
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    order = np.argsort(h)[:k]
    return pa.table(
        {
            "h": pa.array(h[order].astype(np.uint64)),
            "vec_id": pa.array(ids[order]),
            "emb": pa.array(list(X[order]), pa.list_(pa.float64())),
        }
    )


@ray.remote
def _assign_partial(
    t: pa.Table, C: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """One Lloyd round's block partial: (k x d int64 fixed-point sums,
    k int64 counts). Assignment = argmax cosine (first index wins ties,
    deterministic)."""
    k = C.shape[0]
    if len(t) == 0:
        return np.zeros((k, C.shape[1]), np.int64), np.zeros(k, np.int64)
    ids, X = _block_mat(t)
    assign = np.argmax(X @ C.T, axis=1)
    Xq = np.round(X * _FP).astype(np.int64)
    sums = np.zeros((k, X.shape[1]), np.int64)
    np.add.at(sums, assign, Xq)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return sums, counts


@ray.remote
def _assign_final(t: pa.Table, C: np.ndarray) -> pa.Table:
    if len(t) == 0:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    ids, X = _block_mat(t)
    sims = X @ C.T
    assign = np.argmax(sims, axis=1)
    best = sims[np.arange(X.shape[0]), assign]
    p = 10.0**6
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "cluster": pa.array(assign.astype(np.int64)),
            "sim": pa.array(np.round(best * p) / p),
        }
    )


def kmeans_embeddings(
    ds: rd.Dataset, k: int = 8, *, n_iters: int = 10, seed: int = 42
) -> tuple[rd.Dataset, np.ndarray]:
    """Full-corpus spherical Lloyd's: returns (assignments Dataset with
    ``vec_id / cluster / sim``, final centroid matrix). Deterministic
    across partitioning and rerun (see module docstring)."""
    refs = ds.select_columns(["vec_id", "embedding"]).to_arrow_refs()
    if not refs:
        return (
            rd.from_arrow(
                pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            ),
            np.zeros((0, 0)),
        )
    cand = pa.concat_tables(
        ray.get([_init_candidates.remote(r, k, seed) for r in refs])
    )
    h = cand["h"].to_numpy()
    order = np.argsort(h)[: min(k, len(cand))]
    col = cand["emb"].combine_chunks()
    flat = np.asarray(col.values, dtype=np.float64)
    d = flat.shape[0] // max(len(cand), 1)
    C = flat.reshape(len(cand), d)[order].copy()
    for _ in range(n_iters):
        parts = ray.get([_assign_partial.remote(r, C) for r in refs])
        sums = np.zeros((C.shape[0], d), np.int64)
        counts = np.zeros(C.shape[0], np.int64)
        for s, c in parts:
            sums += s
            counts += c
        upd = counts > 0
        Cn = sums.astype(np.float64) / float(_FP)
        nrm = np.linalg.norm(Cn, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        C[upd] = (Cn / nrm)[upd]
    out = [_assign_final.remote(r, C) for r in refs]
    return rd.from_arrow_refs(out), C
