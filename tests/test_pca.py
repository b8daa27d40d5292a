"""PCA projection (`stages/pca.py`)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.pca import fit_pca, project_pca


def _emb_table(n=400, d=12, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so the top components are unambiguous
    scales = np.linspace(5.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales
    return x, pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.ravel(), pa.float64()), d
            ),
        }
    )


def test_pca_matches_direct_numpy(ray_session):
    x, t = _emb_table()
    k = 4
    mean, comps, ev = fit_pca(rd.from_arrow(t).repartition(7), k)
    # direct PCA on the same data
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / x.shape[0]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w, kind="stable")[::-1][:k]
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(ev, w[order], atol=1e-6)
    # components match up to the documented sign convention
    for j in range(k):
        ref = v[:, order[j]]
        amax = np.abs(ref).argmax()
        ref = ref * np.sign(ref[amax])
        assert np.allclose(comps[:, j], ref, atol=1e-8), j
    # orthonormal basis
    assert np.allclose(comps.T @ comps, np.eye(k), atol=1e-10)
    # variance ordering
    assert (np.diff(ev) <= 1e-12).all()

    got = (
        project_pca(rd.from_arrow(t).repartition(5), mean, comps)
        .to_pandas().set_index("vec_id").sort_index()
    )
    want = (x - mu) @ comps
    gx = np.stack(got["pca"].values)
    assert np.allclose(gx, want, atol=1e-9)


def test_pca_parallelism_independent(ray_session):
    _, t = _emb_table(seed=9)

    def run(parts):
        ds = rd.from_arrow(t)
        if parts:
            ds = ds.repartition(parts)
        m, c, _ = fit_pca(ds, 3)
        return (
            project_pca(ds, m, c).to_pandas()
            .sort_values("vec_id").reset_index(drop=True)
        )

    a, b = run(None), run(13)
    ax = np.stack(a["pca"].values)
    bx = np.stack(b["pca"].values)
    # partials sum in different orders -> allclose, not bit-equal
    assert np.allclose(ax, bx, atol=1e-8)


def test_pca_foreign_corpus_same_space(ray_session):
    x, t = _emb_table(seed=5)
    m, c, _ = fit_pca(rd.from_arrow(t), 3)
    rng = np.random.default_rng(6)
    y = rng.normal(size=(50, x.shape[1]))
    t2 = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(y.ravel(), pa.float64()), x.shape[1]
            ),
        }
    )
    got = (
        project_pca(rd.from_arrow(t2), m, c)
        .to_pandas().set_index("vec_id").sort_index()
    )
    want = (y - m) @ c  # centered by the FIT mean, not y's own
    assert np.allclose(np.stack(got["pca"].values), want, atol=1e-9)


def test_pca_whitening_unit_variance(ray_session):
    x, t = _emb_table(n=600, seed=11)
    m, c, ev = fit_pca(rd.from_arrow(t), 4)
    got = (
        project_pca(rd.from_arrow(t), m, c, explained_variance=ev)
        .to_pandas().set_index("vec_id").sort_index()
    )
    y = np.stack(got["pca"].values)
    # population variance of each whitened coordinate ~ 1
    assert np.allclose(y.var(axis=0), 1.0, atol=1e-6)
