"""HNSW graph index (ST5 — the reference's hnswlib competitor,
``/root/reference/nlsh/trainers/hnsw.py:28-48``, rebuilt library-free).

Gates: kernel recall vs exact brute force on clustered data, graph
determinism, and stage-level parallelism-independence (shard membership
is ``vec_id % n_shards``, never block boundaries).
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from nlshray.functions.hnsw import HNSWIndex, assign_levels
from nlshray.pipelines.dedup import to_arrow
from nlshray.stages.ann import knn_bruteforce, knn_hnsw

SF = "/root/testdata/sf0.001"


def _clustered(n_clusters=40, per=10, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    pts = np.repeat(centers, per, axis=0) + 0.1 * rng.normal(
        size=(n_clusters * per, dim)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def test_levels_deterministic_and_geometric():
    ids = np.arange(100_000, dtype=np.int64)
    lv = assign_levels(ids, m=10, seed=42)
    assert (lv == assign_levels(ids, m=10, seed=42)).all()
    assert lv.min() == 0
    # geometric: ~1/M of nodes above level 0 (1/ln(M) scale)
    frac = float((lv > 0).mean())
    assert 0.05 < frac < 0.2


def test_kernel_recall_vs_bruteforce():
    pts = _clustered()
    ids = np.arange(len(pts), dtype=np.int64)
    idx = HNSWIndex.build(pts, ids, m=10, ef_construction=100, seed=42)
    sims = pts @ pts.T
    recalls = []
    for q in range(0, len(pts), 7):
        true = set(np.argsort(-sims[q])[:10].tolist())
        got, _ = idx.search(pts[q], 10, ef=64)
        recalls.append(len(true & set(got.tolist())) / 10)
    assert float(np.mean(recalls)) >= 0.95


def test_kernel_deterministic():
    pts = _clustered(seed=3)
    ids = np.arange(len(pts), dtype=np.int64)
    a = HNSWIndex.build(pts, ids, m=10, ef_construction=60, seed=42)
    b = HNSWIndex.build(pts, ids, m=10, ef_construction=60, seed=42)
    for q in (0, 17, 311):
        ga, sa = a.search(pts[q], 10, ef=40)
        gb, sb = b.search(pts[q], 10, ef=40)
        assert (ga == gb).all() and (sa == sb).all()


def _query(ds, n=3):
    import pyarrow.compute as pc

    rows = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return q, np.array([r["vec_id"] for r in rows], dtype=np.int64)


def test_stage_recall_and_parallelism_independence(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    q, qids = _query(ds)
    bf = to_arrow(knn_bruteforce(ds, q, qids, k=10))
    out = to_arrow(knn_hnsw(ds, q, qids, k=10, ef_search=64))
    recalls = []
    for qid in qids:
        want = set(
            bf.filter(pa.compute.equal(bf["query_id"], int(qid)))[
                "neighbor_id"
            ].to_pylist()
        )
        got = set(
            out.filter(pa.compute.equal(out["query_id"], int(qid)))[
                "neighbor_id"
            ].to_pylist()
        )
        recalls.append(len(want & got) / 10)
    # sharded exact-merge over 4 graphs at ef=64: near-exact even on
    # near-random sf embeddings (each shard's top-k unioned = 40 cands)
    assert float(np.mean(recalls)) >= 0.9

    # identical output at a different read parallelism (shards are
    # id-derived, not block-derived)
    ds2 = rd.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=7)
    out2 = to_arrow(knn_hnsw(ds2, q, qids, k=10, ef_search=64))
    key = lambda t: sorted(
        zip(
            t["query_id"].to_pylist(),
            t["neighbor_id"].to_pylist(),
            [round(s, 12) for s in t["sim"].to_pylist()],
        )
    )
    assert key(out) == key(out2)


# ---------------- IVF (same recall-gate pattern) ----------------

def test_ivf_centroids_deterministic():
    from nlshray.stages.ann import fit_ivf_centroids

    pts = _clustered(seed=5)
    a = fit_ivf_centroids(pts, 8, seed=42)
    b = fit_ivf_centroids(pts, 8, seed=42)
    assert (a == b).all()
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_ivf_stage_recall_and_determinism(ray_session):
    from nlshray.stages.ann import knn_ivf

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    q, qids = _query(ds)
    bf = to_arrow(knn_bruteforce(ds, q, qids, k=10))
    out = to_arrow(knn_ivf(ds, q, qids, k=10, n_centroids=16, nprobe=6))
    recalls = []
    for qid in qids:
        want = set(
            bf.filter(pa.compute.equal(bf["query_id"], int(qid)))[
                "neighbor_id"
            ].to_pylist()
        )
        got = set(
            out.filter(pa.compute.equal(out["query_id"], int(qid)))[
                "neighbor_id"
            ].to_pylist()
        )
        recalls.append(len(want & got) / 10)
    # nprobe=6 of 16 centroids on near-random sf embeddings: high but
    # not exact (same theory bound as LSH at equal candidate budget)
    assert float(np.mean(recalls)) >= 0.5

    out2 = to_arrow(
        knn_ivf(
            rd.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=7),
            q, qids, k=10, n_centroids=16, nprobe=6,
        )
    )
    key = lambda t: sorted(
        zip(
            t["query_id"].to_pylist(),
            t["neighbor_id"].to_pylist(),
            [round(s, 12) for s in t["sim"].to_pylist()],
        )
    )
    assert key(out) == key(out2)


# ---------------- PQ (the reference's declared-but-unimplemented
# ProductQuantization, nlsh/hashings.py:142-145) ----------------

def test_pq_codebooks_deterministic_and_shapes():
    from nlshray.stages.ann import encode_pq, fit_pq_codebooks

    pts = _clustered(dim=64, seed=2)
    a = fit_pq_codebooks(pts, n_subspaces=16, n_centroids=16, seed=42)
    b = fit_pq_codebooks(pts, n_subspaces=16, n_centroids=16, seed=42)
    assert a.shape == (16, 16, 4)
    assert (a == b).all()
    codes = encode_pq(pts, a)
    assert codes.shape == (len(pts), 16) and codes.dtype == np.uint8


def test_pq_kernel_recall_on_clustered():
    from nlshray.stages.ann import encode_pq, fit_pq_codebooks

    pts = _clustered(dim=64, seed=0)
    books = fit_pq_codebooks(pts, n_subspaces=16, n_centroids=16, seed=42)
    codes = encode_pq(pts, books)
    m, kc, dsub = books.shape
    qsub = pts.reshape(-1, m, dsub)
    lut = ((qsub[:, :, None, :] - books[None]) ** 2).sum(axis=3)
    d2 = np.zeros((len(pts), len(pts)))
    for s in range(m):
        d2 += lut[:, s, :][:, codes[:, s]]
    sims_true = pts @ pts.T
    sims_adc = 1 - d2 / 2
    rec = []
    for q in range(0, len(pts), 7):
        t = set(np.argsort(-sims_true[q])[1:11].tolist())
        g = set(np.argsort(-sims_adc[q])[1:11].tolist())
        rec.append(len(t & g) / 10)
    assert float(np.mean(rec)) >= 0.7


def test_pq_stage_runs_and_deterministic(ray_session):
    from nlshray.stages.ann import knn_pq

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    q, qids = _query(ds)
    out = to_arrow(knn_pq(ds, q, qids, k=10))
    assert out.num_rows == 30  # 3 queries x 10
    out2 = to_arrow(
        knn_pq(
            rd.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=7),
            q, qids, k=10,
        )
    )
    key = lambda t: sorted(
        zip(
            t["query_id"].to_pylist(),
            t["neighbor_id"].to_pylist(),
            [round(s, 12) for s in t["sim"].to_pylist()],
        )
    )
    assert key(out) == key(out2)


def test_index_store_builds_once(ray_session, tmp_path):
    """VERDICT r2 #4: knn_hnsw twice over the same corpus must build each
    shard graph ONCE (builds.log counter) and return identical results;
    IVF/PQ artifacts behave the same via _fit_or_load."""
    import pyarrow as pa
    import ray.data as rd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.stages.ann import knn_hnsw, knn_ivf, knn_pq
    from nlshray.state.indexstore import IndexStore

    rng = np.random.default_rng(3)
    n, dim = 200, 16
    mat = rng.normal(size=(n, dim))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    q, qids = mat[:3], np.arange(3, dtype=np.int64)
    store_dir = str(tmp_path / "idx")
    n_shards = 3

    r1 = to_arrow(
        knn_hnsw(ds, q, qids, k=5, n_shards=n_shards, dim=dim,
                 index_dir=store_dir)
    ).sort_by([("query_id", "ascending"), ("neighbor_id", "ascending")])
    store = IndexStore(store_dir)
    assert store.build_count("hnsw") == n_shards
    r2 = to_arrow(
        knn_hnsw(ds, q, qids, k=5, n_shards=n_shards, dim=dim,
                 index_dir=store_dir)
    ).sort_by([("query_id", "ascending"), ("neighbor_id", "ascending")])
    assert store.build_count("hnsw") == n_shards  # second run: zero builds
    assert r1.equals(r2)

    for fn, kind in ((knn_ivf, "ivf"), (knn_pq, "pq")):
        a = to_arrow(fn(ds, q, qids, k=5, dim=dim, index_dir=store_dir))
        assert store.build_count(kind) == 1
        b = to_arrow(fn(ds, q, qids, k=5, dim=dim, index_dir=store_dir))
        assert store.build_count(kind) == 1
        key = lambda t: sorted(
            map(tuple, zip(t["query_id"].to_pylist(),
                           t["neighbor_id"].to_pylist()))
        )
        assert key(a) == key(b)
