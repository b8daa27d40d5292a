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
    df = parts.to_pandas().groupby(by, sort=True).sum().reset_index()

    rows: dict[str, list] = {
        by: [], "var_x": [], "var_y": [], "n": [], "cov_pop": [], "corr": []
    }
    for _, r in df.iterrows():
        n = r["n"]
        mean = {c: r[f"s_{c}"] / n for c in cols}
        var = {c: r[f"q_{c}"] / n - mean[c] ** 2 for c in cols}
        for i, j in pairs:
            ci, cj = cols[i], cols[j]
            cov = r[f"x_{ci}__{cj}"] / n - mean[ci] * mean[cj]
            denom = np.sqrt(var[ci] * var[cj])
            rows[by].append(r[by])
            rows["var_x"].append(ci)
            rows["var_y"].append(cj)
            rows["n"].append(int(n))
            rows["cov_pop"].append(cov)
            rows["corr"].append(cov / denom if denom > 0 else None)
    return pa.table(
        {
            by: pa.array(rows[by]),
            "var_x": pa.array(rows["var_x"]),
            "var_y": pa.array(rows["var_y"]),
            "n": pa.array(rows["n"], pa.int64()),
            "cov_pop": pa.array(rows["cov_pop"], pa.float64()),
            "corr": pa.array(rows["corr"], pa.float64()),
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
