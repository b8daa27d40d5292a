"""Distributed spherical k-means: bit-equality vs a direct numpy
Lloyd's and across partitionings (fixed-point sums make the reduce
order-independent — see stages/kmeans.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.hashing import splitmix64
from nlshray.stages.kmeans import _FP, kmeans_embeddings


def _direct(X, ids, k, n_iters, seed):
    d = X.shape[1]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    C = Xn[np.argsort(h)[:k]].copy()
    for _ in range(n_iters):
        a = np.argmax(Xn @ C.T, axis=1)
        Xq = np.round(Xn * _FP).astype(np.int64)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, a, Xq)
        cnt = np.bincount(a, minlength=k)
        upd = cnt > 0
        Cn = sums.astype(np.float64) / float(_FP)
        nrm = np.linalg.norm(Cn, axis=1, keepdims=True)
        nrm[nrm == 0] = 1
        C[upd] = (Cn / nrm)[upd]
    return np.argmax(Xn @ C.T, axis=1), C


def test_kmeans_matches_direct_and_partitioning_independent(ray_session):
    rng = np.random.default_rng(7)
    n, d, k = 400, 16, 5
    X = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(X.astype(np.float64)), pa.list_(pa.float64())),
        }
    )
    ds1, C1 = kmeans_embeddings(rd.from_arrow(t), k=k, n_iters=10, seed=42)
    ds2, C2 = kmeans_embeddings(
        rd.from_arrow(t).repartition(7), k=k, n_iters=10, seed=42
    )
    a_direct, C_direct = _direct(X, ids, k, 10, 42)
    df1 = ds1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    df2 = ds2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert df1.equals(df2)
    assert np.array_equal(C1, C2) and np.array_equal(C1, C_direct)
    assert np.array_equal(df1.cluster.values, a_direct)
    # every cluster is populated on gaussian data at n >> k
    assert (np.bincount(df1.cluster.values, minlength=k) > 0).all()


def test_kmeans_empty_input(ray_session):
    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        }
    )
    ds, C = kmeans_embeddings(rd.from_arrow(t), k=4)
    assert ds.count() == 0 and C.shape[0] == 0
