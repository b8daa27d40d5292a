"""End-to-end golden: full pipeline vs exact oracle (SURVEY.md §5.2-5.3).

The acceptance gate from BASELINE.json: dup-pair recall >= 0.99 at the
mandated config (k=5 shingles, 128 perms, b=16, r=8, threshold 0.8).
"""

import numpy as np

import ray.data as rd

from nlshray.metrics import dup_pair_precision, dup_pair_recall
from nlshray.pipelines.dedup import to_arrow
from nlshray.stages.cluster import label_propagation


def test_recall_gate(tiny_result, tiny_fixture):
    recall = dup_pair_recall(tiny_result["clusters"], tiny_fixture["true_pairs"])
    assert recall >= 0.99, recall


def test_precision_floor(tiny_result, tiny_fixture):
    precision = dup_pair_precision(
        tiny_result["clusters"], tiny_fixture["true_pairs"]
    )
    assert precision >= 0.95, precision


def test_every_doc_labelled_once(tiny_result, tiny_fixture):
    clusters = tiny_result["clusters"]
    assert clusters.num_rows == tiny_fixture["pages"].num_rows
    ids = clusters["doc_id"].to_numpy()
    assert len(np.unique(ids)) == len(ids)
    # labels are canonical min member ids
    lab = clusters["cluster_id"].to_numpy()
    assert (lab <= ids).all()


def test_confirmed_pairs_meet_threshold(tiny_result, tiny_fixture):
    pairs = tiny_result["pairs"]
    cfg = tiny_fixture["cfg"]
    j = pairs["jaccard"].to_numpy()
    # exact-verified pairs respect the threshold exactly; estimate-accepted
    # ones sit above exact_hi by construction
    methods = pairs["method"].to_pylist()
    for jac, m in zip(j.tolist(), methods):
        if m == "exact":
            assert jac >= cfg.threshold
        else:
            assert jac > cfg.exact_hi


def test_label_propagation_matches_unionfind(ray_session, tiny_result):
    """The distributed CC path must agree with driver union-find."""
    res = tiny_result["result"]
    nodes = res.clusters.select_columns(["doc_id"])
    # distributed CC over the same edges: confirmed pairs + exact edges
    import pyarrow as pa

    emap = res.docs.select_columns(["doc_id", "rep_id"])
    exact_edges = emap.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t["doc_id"], t["rep_id"])
        ).rename_columns(["left_id", "right_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edges = res.pairs.select_columns(["left_id", "right_id"]).union(exact_edges)
    lp = to_arrow(label_propagation(edges, nodes, num_partitions=4))
    uf = tiny_result["clusters"]
    got = dict(zip(lp["doc_id"].to_pylist(), lp["cluster_id"].to_pylist()))
    want = dict(zip(uf["doc_id"].to_pylist(), uf["cluster_id"].to_pylist()))
    assert got == want


def test_cluster_stage_distributed_dispatch(ray_session, tiny_result):
    """max_driver_pairs=0 must force the label-propagation branch and
    produce clusters identical to the driver path (VERDICT r1 #3)."""
    from nlshray.config import DedupConfig
    from nlshray.stages.cluster import cluster_stage

    res = tiny_result["result"]
    emap = res.docs.select_columns(["doc_id", "rep_id"])
    cfg0 = DedupConfig(max_driver_pairs=0)
    dist = to_arrow(
        cluster_stage(res.pairs, emap, cfg0, num_partitions=4)
    )
    got = dict(zip(dist["doc_id"].to_pylist(), dist["cluster_id"].to_pylist()))
    uf = tiny_result["clusters"]
    want = dict(zip(uf["doc_id"].to_pylist(), uf["cluster_id"].to_pylist()))
    assert got == want


def test_numpy_components_matches_unionfind():
    """Vectorized min-label components == UnionFind on random graphs."""
    import numpy as np

    from nlshray.stages.cluster import numpy_components
    from nlshray.state.unionfind import UnionFind

    rng = np.random.default_rng(11)
    for trial in range(5):
        n_edges = int(rng.integers(1, 200))
        l = rng.integers(0, 60, size=n_edges).astype(np.int64)
        r = rng.integers(0, 60, size=n_edges).astype(np.int64)
        uf = UnionFind()
        for a, b in zip(l.tolist(), r.tolist()):
            uf.union(a, b)
        keys, labels = numpy_components(l, r)
        want = uf.labels(keys.tolist())
        assert labels.tolist() == want


def test_verify_threshold_above_exact_hi_forces_exact(ray_session):
    """ADVICE r2 (high): with threshold > exact_hi the confident-accept
    cut must move UP to the threshold — a pair whose ESTIMATE is high
    (here: bit-equal signatures, est=1.0) but whose true Jaccard is
    below the threshold must be exact-verified and rejected, never
    confirmed on the estimate."""
    import pyarrow as pa

    from nlshray.config import DedupConfig
    from nlshray.stages.sign import MinHashSigner
    from nlshray.stages.verify import verify_stage

    cfg = DedupConfig(threshold=1.0)
    base = " ".join(f"tok{i}" for i in range(3000))
    signer = MinHashSigner(cfg)

    # deterministic search: an appended token whose 5 new shingles never
    # win a min under any of the 128 permutations -> est_jaccard == 1.0
    # while the true shingle-set Jaccard is < 1.0
    sig_a = None
    text_b = None
    for cand in range(200):
        ta, tb = base, base + f" extra{cand}"
        t = signer(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([ta, tb], pa.string()),
                }
            )
        )
        if t["sig"][0].as_py() == t["sig"][1].as_py():
            sig_a, text_b = t, tb
            break
    assert sig_a is not None, "no est==1.0 construction found"

    pairs = rd.from_arrow(
        pa.table(
            {
                "left_id": pa.array([1], pa.int64()),
                "right_id": pa.array([2], pa.int64()),
                "n_bands": pa.array([16], pa.int64()),
            }
        )
    )
    sigs = rd.from_arrow(sig_a)
    reps = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([base, text_b], pa.string()),
            }
        )
    )
    out = to_arrow(
        verify_stage(pairs, sigs, reps, cfg, allow_small_path=False)
    )
    assert out.num_rows == 0, out.to_pylist()


def test_empty_and_dupfree_inputs(ray_session, tiny_fixture):
    """Zero-row and duplicate-free corpora flow through BOTH physical
    plans (zero-row blocks pass through map_batches unmapped, so every
    raw-task round must guard missing columns)."""
    from nlshray.pipelines.dedup import dedup_pages

    pages = tiny_fixture["pages"]
    cfg = tiny_fixture["cfg"]
    empty = pages.slice(0, 0)
    for force in (False, True):
        res = dedup_pages(rd.from_arrow(empty), cfg, force_distributed=force)
        assert to_arrow(res.clusters).num_rows == 0
        assert to_arrow(res.pairs).num_rows == 0


def test_force_distributed_equals_driver_plans(ray_session, tiny_result, tiny_fixture):
    """The scale plans (raw-task shuffles for groups/pairs, est+borderline
    raw-task verify rounds, broadcast-free gathers) must produce the SAME
    clusters and confirmed pairs as the driver-merge fast paths — plan
    choice is a physical detail, never a semantic one."""
    from nlshray.pipelines.dedup import dedup_pages

    res = dedup_pages(
        rd.from_arrow(tiny_fixture["pages"]),
        tiny_fixture["cfg"],
        force_distributed=True,
    )
    got_clusters = to_arrow(res.clusters).to_pandas()
    got_pairs = to_arrow(res.pairs).to_pandas()
    exp_clusters = tiny_result["clusters"].to_pandas()
    exp_pairs = tiny_result["pairs"].to_pandas()

    key = ["doc_id", "cluster_id"]
    assert sorted(map(tuple, got_clusters[key].values.tolist())) == sorted(
        map(tuple, exp_clusters[key].values.tolist())
    )
    pkey = ["left_id", "right_id"]
    got_p = got_pairs.sort_values(pkey).reset_index(drop=True)
    exp_p = exp_pairs.sort_values(pkey).reset_index(drop=True)
    assert got_p[pkey].values.tolist() == exp_p[pkey].values.tolist()
    # jaccard agrees wherever both plans verified exactly (the driver
    # fast path exact-verifies everything; the distributed plan may
    # confident-accept on the estimate, which only rounds UP past hi)
    both_exact = (got_p["method"] == "exact").values
    assert np.allclose(
        got_p["jaccard"].values[both_exact],
        exp_p["jaccard"].values[both_exact],
    )


def test_text_store_mode_equals_pinned(
    ray_session, tiny_result, tiny_fixture, tmp_path
):
    """Corpus-beyond-plasma mode (VERDICT r3 #6): with ``text_store_dir``
    the hashed corpus is persisted as Parquet and NEVER pinned in the
    object store — verify's borderline gathers run as row-group-pruned
    Parquet reads — and the clusters/pairs must be byte-identical to the
    pinned plan under force_distributed (the plan that needs the texts
    back, est+borderline)."""
    from nlshray.pipelines.dedup import dedup_pages

    store = str(tmp_path / "textstore")
    res = dedup_pages(
        rd.from_arrow(tiny_fixture["pages"]),
        tiny_fixture["cfg"],
        force_distributed=True,
        text_store_dir=store,
    )
    got_clusters = to_arrow(res.clusters).to_pandas()
    got_pairs = to_arrow(res.pairs).to_pandas()

    import os

    docs_dir = os.path.join(store, "docs_h")
    files = [f for f in os.listdir(docs_dir) if f.endswith(".parquet")]
    assert files, "store mode must persist the hashed corpus as parquet"

    # identical results vs the (already cross-checked) pinned plans
    exp_clusters = tiny_result["clusters"].to_pandas()
    key = ["doc_id", "cluster_id"]
    assert sorted(map(tuple, got_clusters[key].values.tolist())) == sorted(
        map(tuple, exp_clusters[key].values.tolist())
    )
    pkey = ["left_id", "right_id"]
    exp_pairs = tiny_result["pairs"].to_pandas()
    assert sorted(map(tuple, got_pairs[pkey].values.tolist())) == sorted(
        map(tuple, exp_pairs[pkey].values.tolist())
    )

    # a fresh non-empty store dir must be refused, not silently merged
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_pages(
            rd.from_arrow(tiny_fixture["pages"]),
            tiny_fixture["cfg"],
            text_store_dir=store,
        )


def test_oph_signer_end_to_end(ray_session, tiny_fixture):
    """The OPH signer (one-permutation hashing + rotation densification,
    the 100-TB sign plan) must hold the recall/precision gates through
    the UNCHANGED banding/verify/cluster machinery — same signature
    shape, same slot-match estimator, ~num_perms× less hash compute."""
    from nlshray.config import DedupConfig
    from nlshray.pipelines.dedup import dedup_pages

    cfg = DedupConfig(signer="oph")
    res = dedup_pages(rd.from_arrow(tiny_fixture["pages"]), cfg)
    clusters = to_arrow(res.clusters)
    recall = dup_pair_recall(clusters, tiny_fixture["true_pairs"])
    precision = dup_pair_precision(clusters, tiny_fixture["true_pairs"])
    assert recall >= 0.97, recall
    assert precision >= 0.90, precision
    # exact-verified borderline pairs still respect the exact threshold
    pairs = to_arrow(res.pairs)
    for jac, m in zip(
        pairs["jaccard"].to_pylist(), pairs["method"].to_pylist()
    ):
        if m == "exact":
            assert jac >= cfg.threshold


def test_text_store_auto_dispatch(ray_session, tiny_result, tiny_fixture):
    """r4 verdict #4: when the estimated corpus bytes exceed
    ``text_store_auto_fraction`` of the plasma budget, ``dedup_docs``
    must choose the text-store plan on its own (no env var, no explicit
    dir) — and the output must stay identical to the pinned plan. The
    plasma budget is mocked tiny via ``text_store_plasma_budget``."""
    import dataclasses

    from nlshray.pipelines.dedup import dedup_docs
    from nlshray.stages.extract import extract_stage

    class RecordingSink:
        def __init__(self):
            self.metas, self.events = [], []

        def meta(self, d):
            self.metas.append(d)

        def emit(self, stage, payload, wall):
            self.events.append((stage, payload, wall))

    # rd.from_arrow is materialized -> size is metadata-cheap; a 1 KiB
    # mocked plasma budget guarantees the gate fires for any corpus
    cfg = dataclasses.replace(
        tiny_fixture["cfg"], text_store_plasma_budget=1024
    )
    docs = extract_stage(
        rd.from_arrow(tiny_fixture["pages"])
    ).materialize()
    sink = RecordingSink()
    res = dedup_docs(docs, cfg, force_distributed=True, sink=sink)
    got = to_arrow(res.clusters).to_pandas()

    assert sink.metas and sink.metas[0]["text_store"] is True
    assert sink.metas[0]["text_store_auto"] is True

    exp = tiny_result["clusters"].to_pandas()
    key = ["doc_id", "cluster_id"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, exp[key].values.tolist())
    )

    # plasma-resident corpus (default budget = real plasma, far bigger
    # than the fixture): the pinned plan must stay the default
    sink2 = RecordingSink()
    dedup_docs(docs, tiny_fixture["cfg"], force_distributed=True, sink=sink2)
    assert sink2.metas[0]["text_store"] is False
    assert sink2.metas[0]["text_store_auto"] is False


def test_star_components_matches_unionfind_random(ray_session):
    """Large-star/small-star CC == driver union-find on random graphs
    (duplicate edges, self loops, isolated nodes included)."""
    import numpy as np
    import pyarrow as pa

    from nlshray.stages.cluster import numpy_components, star_components

    rng = np.random.default_rng(7)
    for trial in range(4):
        n_edges = int(rng.integers(1, 300))
        l = rng.integers(0, 80, size=n_edges).astype(np.int64)
        r = rng.integers(0, 80, size=n_edges).astype(np.int64)
        all_nodes = np.arange(90, dtype=np.int64)  # 80..89 isolated
        edges = rd.from_arrow(
            pa.table({"left_id": pa.array(l), "right_id": pa.array(r)})
        ).repartition(3)
        nodes = rd.from_arrow(pa.table({"doc_id": pa.array(all_nodes)}))
        got_t = to_arrow(star_components(edges, nodes, num_partitions=4))
        got = dict(
            zip(got_t["doc_id"].to_pylist(), got_t["cluster_id"].to_pylist())
        )
        keys, labels = numpy_components(l, r)
        want = dict(zip(keys.tolist(), labels.tolist()))
        for n in all_nodes.tolist():
            want.setdefault(n, n)
        assert got == want, f"trial {trial}"


def test_star_components_long_chain(ray_session):
    """A 2000-node path graph: the O(diameter) min-label engine's worst
    case; the star rounds must flatten it to one min-labelled component
    well inside max_rounds (geometric convergence)."""
    import numpy as np
    import pyarrow as pa

    from nlshray.stages.cluster import star_components

    n = 2000
    ids = np.arange(n, dtype=np.int64) * 7 + 3  # non-contiguous ids
    edges = rd.from_arrow(
        pa.table(
            {"left_id": pa.array(ids[:-1]), "right_id": pa.array(ids[1:])}
        )
    ).repartition(4)
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    got = to_arrow(star_components(edges, nodes, num_partitions=4))
    labs = set(got["cluster_id"].to_pylist())
    assert labs == {3}
    assert got.num_rows == n


def test_cluster_stage_distributed_uses_star_engine(ray_session, tiny_result):
    """cluster_stage's beyond-driver-memory branch (max_driver_pairs=0)
    now routes to star_components; labels must still equal union-find."""
    from nlshray.config import DedupConfig
    from nlshray.stages.cluster import cluster_stage

    res = tiny_result["result"]
    emap = res.docs.select_columns(["doc_id", "rep_id"])
    cfg0 = DedupConfig(max_driver_pairs=0)
    dist = to_arrow(cluster_stage(res.pairs, emap, cfg0, num_partitions=4))
    got = dict(zip(dist["doc_id"].to_pylist(), dist["cluster_id"].to_pylist()))
    uf = tiny_result["clusters"]
    want = dict(zip(uf["doc_id"].to_pylist(), uf["cluster_id"].to_pylist()))
    assert got == want
