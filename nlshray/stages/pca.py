"""PCA projection of an embedding column — the dimensionality-reduction
step an embedding pipeline runs before IVF/PQ indexing or whitened
cosine search (OPQ's first move is exactly this rotation).

Plan: the covariance comes from ``stages/stats.embedding_moments``
(per-block (n, Σx, XᵀX) float64 partials, driver merge — O(blocks ×
dim²), never the data); the driver eigendecomposes the tiny d×d
matrix once; the k chosen components are broadcast with one
``ray.put`` and the projection is a single matmul per block
(map_batches, zero-copy Arrow in/out). The corpus streams — nothing
but d×d partials and the d×k basis ever converge.

Determinism: ``np.linalg.eigh`` of the same float64 matrix is
reproducible on one platform, but each eigenvector's SIGN is
arbitrary — normalized here to make the largest-|coefficient| entry
positive (ties: lowest index), so projections are stable across runs
and parallelism. Components are returned for persistence; pass them
back in to project a different corpus into the same space
(train-on-clean / project-the-crawl).

Approximate BY CONTRACT like the kNN members: no SQL oracle can
eigendecompose, so the pytest gates are exactness vs a direct numpy
PCA on the same data, orthonormality of the basis, and the
explained-variance ordering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def fit_pca(
    ds: ray.data.Dataset, k: int, col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean d, components d×k, explained_variance k) from the
    streaming covariance. Components are unit eigenvectors of the
    population covariance, sorted by eigenvalue DESC, sign-normalized
    (largest-|entry| positive)."""
    from nlshray.stages.stats import embedding_moments

    n, mean, cov = embedding_moments(ds, col=col)
    if k > cov.shape[0]:
        raise ValueError(f"k={k} exceeds dim={cov.shape[0]}")
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w, kind="stable")[::-1][:k]
    comps = v[:, order]
    ev = w[order]
    # sign convention: largest-|coefficient| entry positive
    amax = np.abs(comps).argmax(axis=0)
    signs = np.sign(comps[amax, np.arange(comps.shape[1])])
    signs[signs == 0] = 1.0
    comps = comps * signs
    return mean, comps, ev


def project_pca(
    ds: ray.data.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
    explained_variance: np.ndarray | None = None,
    eps: float = 1e-12,
) -> ray.data.Dataset:
    """(id, list<float64> k-dim projection) — one matmul per block
    against the broadcast basis; centering uses the FIT corpus mean,
    so a foreign corpus lands in the same space. Pass
    ``explained_variance`` to WHITEN (divide each component by
    sqrt(var + eps)) — unit-variance coordinates, the usual input to
    PQ codebook training."""
    comps = np.asarray(components, np.float64)
    if explained_variance is not None:
        comps = comps / np.sqrt(
            np.asarray(explained_variance, np.float64) + eps
        )
    basis_ref = ray.put((np.asarray(mean, np.float64), comps))
    k = components.shape[1]

    def proj(t: pa.Table) -> pa.Table:
        mu, comp = ray.get(basis_ref)
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        x = np.asarray(arr.values, np.float64).reshape(len(arr), -1)
        y = (x - mu) @ comp
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(y.ravel(), pa.float64()), k
                ),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
