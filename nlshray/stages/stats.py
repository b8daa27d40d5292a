"""Distributed second-moment corpus statistics (covariance / correlation).

The 100-TB shape: per-block *raw-moment partials* (n, Σx per column,
Σxy per pair) computed in one vectorized map pass, then ONE tiny
combine on the driver — the partial table is O(blocks × groups), never
the data. No shuffle at all; this is the canonical
combiner-before-groupby pattern (ray_guide 'pre-aggregate inside
map_batches').

Numerics: raw moments (E[xy] − E[x]E[y]) rather than Welford, because
partials must be mergeable by plain summation; callers round outputs
(queries.py `_round`) so cross-engine accumulation-order noise cannot
flip a value hash. Reference parity: the reference computes per-batch
means/stds for normalization only (`/root/reference/nlsh/data.py`);
pairwise moments are part of the corpus-analysis extension surface.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def grouped_covariance(
    ds: rd.Dataset, by: str, cols: list[str]
) -> pa.Table:
    """Population covariance and correlation for every unordered pair
    of ``cols``, per group of ``by``. Returns a small long-format
    Arrow table: (by, var_x, var_y, n, cov_pop, corr)."""
    pairs = list(combinations(range(len(cols)), 2))

    def partial(t: pa.Table) -> pa.Table:
        keys = t[by]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = keys.dictionary_encode()
        idx = np.asarray(codes.indices)
        cats = codes.dictionary.to_pylist()
        g = len(cats)
        x = np.stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols]
        )  # (k, n)
        n = np.bincount(idx, minlength=g).astype(np.float64)
        sums = np.stack(
            [np.bincount(idx, weights=x[i], minlength=g)
             for i in range(len(cols))]
        )  # (k, g)
        sq = np.stack(
            [np.bincount(idx, weights=x[i] * x[i], minlength=g)
             for i in range(len(cols))]
        )
        cross = np.stack(
            [np.bincount(idx, weights=x[i] * x[j], minlength=g)
             for i, j in pairs]
        )  # (p, g)
        out = {by: pa.array(cats), "n": pa.array(n)}
        for i, c in enumerate(cols):
            out[f"s_{c}"] = pa.array(sums[i])
            out[f"q_{c}"] = pa.array(sq[i])
        for p, (i, j) in enumerate(pairs):
            out[f"x_{cols[i]}__{cols[j]}"] = pa.array(cross[p])
        return pa.table(out)

    # Partials are O(blocks x groups): safe to collect on the driver.
    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    value_cols = [c for c in parts.schema.names if c != by]
    merged = (
        pa.TableGroupBy(parts, by)
        .aggregate([(c, "sum") for c in value_cols])
        .sort_by(by)
    )

    g = len(merged)
    n = merged["n_sum"].to_numpy().astype(np.float64)  # (g,)
    mean = np.stack(
        [merged[f"s_{c}_sum"].to_numpy() / n for c in cols]
    )  # (k, g)
    var = np.stack(
        [merged[f"q_{c}_sum"].to_numpy() / n - mean[i] ** 2
         for i, c in enumerate(cols)]
    )  # (k, g)
    ii = np.array([i for i, _ in pairs])
    jj = np.array([j for _, j in pairs])
    cov = np.stack(
        [merged[f"x_{cols[i]}__{cols[j]}_sum"].to_numpy() / n
         - mean[i] * mean[j]
         for i, j in pairs]
    )  # (p, g)
    denom = np.sqrt(var[ii] * var[jj])  # (p, g)
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(denom > 0, cov / denom, np.nan)

    # long format, pair-major per group (matches the pandas-era order)
    p = len(pairs)
    keys = merged[by]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    rep_idx = np.repeat(np.arange(g), p)
    return pa.table(
        {
            by: keys.take(pa.array(rep_idx)),
            "var_x": pa.array(np.tile(np.array([cols[i] for i in ii]), g)),
            "var_y": pa.array(np.tile(np.array([cols[j] for j in jj]), g)),
            "n": pa.array(
                np.repeat(n.astype(np.int64), p), pa.int64()
            ),
            # cov/corr are (p, g): transpose -> group-major flatten
            "cov_pop": pa.array(cov.T.ravel(), pa.float64()),
            "corr": pa.array(
                corr.T.ravel(), pa.float64(), from_pandas=True
            ),
        }
    )


def hll_distinct(ds: rd.Dataset, hash_batch) -> np.ndarray:
    """Distributed HyperLogLog: ``hash_batch(table) -> uint64 hashes``
    per block, one 16 KiB register partial per block, driver max-merge
    (O(blocks) tiny arrays — the data itself never leaves the map
    pass). Returns the merged register array; estimate with
    ``functions.hll.hll_estimate``. Exactly deterministic at any
    parallelism: register max is order-independent."""
    from nlshray.functions.hll import M, hll_merge, hll_partial

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(np.ascontiguousarray(hash_batch(t), np.uint64))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(M, np.uint8)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for raw in b["regs"].to_pylist():
            merged = hll_merge(merged, np.frombuffer(raw, np.uint8))
    return merged


def embedding_moments(
    ds: rd.Dataset, col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, population covariance matrix) of a list<float> column.
    Per-block partials are (n, Σx, XᵀX) — a float64 matmul per block,
    merged by summation on the driver (O(blocks × dim²) floats, never
    the data). The PCA/whitening input."""

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        x = np.asarray(arr.values, np.float64).reshape(len(arr), -1)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tobytes()], pa.binary()),
                "xtx": pa.array([(x.T @ x).tobytes()], pa.binary()),
            }
        )

    n, s, xtx = 0, None, None
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for bn, bs, bx in zip(
            b["n"].to_pylist(), b["s"].to_pylist(), b["xtx"].to_pylist()
        ):
            bs = np.frombuffer(bs, np.float64)
            bx = np.frombuffer(bx, np.float64)
            n += bn
            s = bs if s is None else s + bs
            xtx = bx if xtx is None else xtx + bx
    if s is None or n == 0:
        raise ValueError("embedding_moments: empty dataset has no moments")
    d = s.shape[0]
    mean = s / n
    cov = xtx.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def fit_pca(
    mean: np.ndarray, cov: np.ndarray, n_components: int, *, whiten: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components [d, k], explained variances [k], mean) from a
    covariance matrix — driver-side eigh (the matrix is dim², tiny).
    Deterministic sign convention: each component's
    largest-|coefficient| entry is positive."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps, vars_ = v[:, order], w[order]
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])] < 0
    comps = comps * np.where(flip, -1.0, 1.0)
    if whiten:
        comps = comps / np.sqrt(np.maximum(vars_, 1e-12))
    return comps, vars_, mean


def project_pca(
    ds: rd.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> rd.Dataset:
    """Center + project each vector onto the (broadcast) components —
    one matmul per batch; components ship via ray.put once."""
    ref = ray.put((np.asarray(mean, np.float64), np.asarray(components, np.float64)))

    def fn(t: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        x = np.asarray(arr.values, np.float64).reshape(len(arr), -1)
        proj = (x - m) @ c
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(proj.ravel(), pa.float64()), proj.shape[1]
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
