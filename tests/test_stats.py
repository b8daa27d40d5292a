"""grouped_covariance: partial-merge result == direct numpy, any split."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.stats import grouped_covariance


def _tbl(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    flag = np.array(["A", "B", "C"])[rng.integers(0, 3, n)]
    a = rng.normal(50, 10, n)
    b = 3.0 * a + rng.normal(0, 5, n)  # strongly correlated with a
    c = rng.normal(0, 1, n)
    return pa.table(
        {"flag": pa.array(flag), "a": pa.array(a), "b": pa.array(b),
         "c": pa.array(c)}
    )


def _direct(t, by, cols):
    df = t.to_pandas()
    out = {}
    for key, g in df.groupby(by, sort=True):
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                x, y = g[cols[i]].values, g[cols[j]].values
                cov = np.mean(x * y) - x.mean() * y.mean()
                corr = cov / np.sqrt(
                    (np.mean(x * x) - x.mean() ** 2)
                    * (np.mean(y * y) - y.mean() ** 2)
                )
                out[(key, cols[i], cols[j])] = (len(g), cov, corr)
    return out


def test_grouped_covariance_matches_direct(ray_session):
    t = _tbl()
    got = grouped_covariance(
        rd.from_arrow(t).repartition(7), "flag", ["a", "b", "c"]
    )
    want = _direct(t, "flag", ["a", "b", "c"])
    assert got.num_rows == len(want)  # every (group, pair) present
    for row in got.to_pylist():
        n, cov, corr = want[(row["flag"], row["var_x"], row["var_y"])]
        assert row["n"] == n
        np.testing.assert_allclose(row["cov_pop"], cov, rtol=1e-9)
        np.testing.assert_allclose(row["corr"], corr, rtol=1e-9)


def test_grouped_covariance_parallelism_independent(ray_session):
    t = _tbl(1200, seed=4)
    r1 = grouped_covariance(rd.from_arrow(t).repartition(2), "flag", ["a", "b"])
    r2 = grouped_covariance(rd.from_arrow(t).repartition(9), "flag", ["a", "b"])
    # identical partial-merge sums up to float addition order; exact n
    assert r1["n"].to_pylist() == r2["n"].to_pylist()
    np.testing.assert_allclose(
        r1["cov_pop"].to_numpy(), r2["cov_pop"].to_numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        r1["corr"].to_numpy(), r2["corr"].to_numpy(), rtol=1e-12
    )


def test_hll_estimate_accuracy():
    from nlshray.functions.hll import hll_estimate, hll_partial
    from nlshray.hashing import splitmix64

    # 200k distinct values: estimate within ~3 standard errors (0.81%/P14)
    h = splitmix64(np.arange(200_000, dtype=np.uint64))
    est = hll_estimate(hll_partial(h))
    assert abs(est - 200_000) / 200_000 < 0.03
    # duplicates never change the sketch
    regs1 = hll_partial(h)
    regs2 = hll_partial(np.concatenate([h, h[:50_000]]))
    assert np.array_equal(regs1, regs2)


def test_hll_small_range_linear_counting():
    from nlshray.functions.hll import hll_estimate, hll_partial
    from nlshray.hashing import splitmix64

    h = splitmix64(np.arange(100, dtype=np.uint64) + np.uint64(7))
    est = hll_estimate(hll_partial(h))
    assert abs(est - 100) < 3  # linear counting is near-exact here


def test_hll_merge_is_union():
    from nlshray.functions.hll import hll_estimate, hll_merge, hll_partial
    from nlshray.hashing import splitmix64

    a = splitmix64(np.arange(0, 50_000, dtype=np.uint64))
    b = splitmix64(np.arange(25_000, 80_000, dtype=np.uint64))
    merged = hll_merge(hll_partial(a), hll_partial(b))
    assert np.array_equal(merged, hll_partial(np.concatenate([a, b])))
    est = hll_estimate(merged)
    assert abs(est - 80_000) / 80_000 < 0.03


def test_hll_distinct_parallelism_independent(ray_session):
    from nlshray.stages.stats import hll_distinct
    from nlshray.hashing import hash_utf8_array

    t = pa.table(
        {"w": pa.array([f"tok{i % 700}" for i in range(5000)], pa.string())}
    )
    fn = lambda b: hash_utf8_array(b["w"], seed=0)
    r1 = hll_distinct(rd.from_arrow(t).repartition(3), fn)
    r2 = hll_distinct(rd.from_arrow(t).repartition(11), fn)
    assert np.array_equal(r1, r2)


def _emb_table(n=400, d=8, seed=13):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (n, 3))
    mixing = rng.normal(0, 1, (3, d))
    x = (base @ mixing + rng.normal(0, 0.05, (n, d))).astype(np.float32)
    flat = pa.array(x.astype(np.float64).ravel(), pa.float32())
    return x.astype(np.float64), pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(flat, d),
        }
    )


def test_embedding_moments_match_direct(ray_session):
    from nlshray.stages.stats import embedding_moments

    x, t = _emb_table()
    x32 = x.astype(np.float32).astype(np.float64)
    n, mean, cov = embedding_moments(rd.from_arrow(t).repartition(6))
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x32.mean(axis=0), rtol=1e-12)
    want = (x32.T @ x32) / n - np.outer(x32.mean(axis=0), x32.mean(axis=0))
    np.testing.assert_allclose(cov, want, rtol=0, atol=1e-12)


def test_pca_projection_recovers_structure(ray_session):
    from nlshray.stages.stats import embedding_moments, fit_pca, project_pca

    x, t = _emb_table()
    ds = rd.from_arrow(t).repartition(5)
    n, mean, cov = embedding_moments(ds)
    comps, vars_, mean = fit_pca(mean, cov, 3)
    # rank-3 structure: top-3 eigenvalues carry ~all variance
    assert vars_[2] > 1e-2 and np.linalg.eigvalsh(cov)[: -3].max() < 1e-2
    out = pa.concat_tables(
        project_pca(ds, mean, comps).iter_batches(batch_format="pyarrow")
    ).sort_by("vec_id")
    proj = np.asarray(out["pca"].combine_chunks().values, np.float64).reshape(
        -1, 3
    )
    x32 = x.astype(np.float32).astype(np.float64)
    want = (x32 - x32.mean(axis=0)) @ comps
    np.testing.assert_allclose(proj, want, rtol=0, atol=1e-9)
    # whitened projection has identity covariance
    wcomps, _, _ = fit_pca(mean, cov, 3, whiten=True)
    wt = pa.concat_tables(
        project_pca(ds, mean, wcomps).iter_batches(batch_format="pyarrow")
    )
    w = np.asarray(wt["pca"].combine_chunks().values, np.float64).reshape(-1, 3)
    np.testing.assert_allclose(
        (w.T @ w) / w.shape[0], np.eye(3), atol=1e-6
    )


def test_empty_inputs(ray_session):
    import pytest

    from nlshray.stages.stats import embedding_moments
    from nlshray.stages.shuffle import epoch_shuffle_rank

    empty_emb = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="empty"):
        embedding_moments(rd.from_arrow(empty_emb))

    empty_ids = pa.table({"doc_id": pa.array([], pa.int64())})
    ds = epoch_shuffle_rank(rd.from_arrow(empty_ids))
    assert ds.count() == 0
    assert sorted(ds.schema().names) == ["doc_id", "epoch_rank"]
