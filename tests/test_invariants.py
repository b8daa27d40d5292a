"""Invariant + property tests (SURVEY.md §5.3-5.4)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from nlshray.config import DedupConfig
from nlshray.functions.minhash import estimate_jaccard, perm_seeds, sign_concat
from nlshray.functions.shingles import exact_jaccard
from nlshray.pipelines.dedup import dedup_pages, to_arrow

SEEDS = perm_seeds(128, 42)


@settings(max_examples=25, deadline=None)
@given(
    n_shared=st.integers(5, 300),
    n_a=st.integers(0, 150),
    n_b=st.integers(0, 150),
    seed=st.integers(0, 2**31),
)
def test_minhash_estimate_tracks_exact_jaccard(n_shared, n_a, n_b, seed):
    """Property: |est - exact| bounded w.h.p. at 128 perms (Chernoff)."""
    rng = np.random.default_rng(seed)
    pool = rng.integers(1, 2**62, size=n_shared + n_a + n_b).astype(np.uint64)
    shared, only_a, only_b = np.split(pool, [n_shared, n_shared + n_a])
    a = np.unique(np.concatenate([shared, only_a]))
    b = np.unique(np.concatenate([shared, only_b]))
    exact = exact_jaccard(a, b)
    sig = sign_concat(
        np.concatenate([a, b]), np.array([a.shape[0], b.shape[0]]), SEEDS
    )
    est = estimate_jaccard(sig[0:1], sig[1:2])[0]
    assert abs(est - exact) < 0.2


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_exact_jaccard_metric_properties(data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    a = np.unique(rng.integers(1, 1000, size=50).astype(np.uint64))
    b = np.unique(rng.integers(1, 1000, size=50).astype(np.uint64))
    jab = exact_jaccard(a, b)
    assert 0.0 <= jab <= 1.0
    assert jab == exact_jaccard(b, a)            # symmetric
    assert exact_jaccard(a, a) == 1.0            # reflexive


def test_clusters_invariant_under_input_shuffle(ray_session, tiny_fixture):
    """Permutation invariance (SURVEY.md §7.4.2): shuffling input rows
    changes nothing — ids are content-derived, labels canonical."""
    pages = tiny_fixture["pages"]
    cfg: DedupConfig = tiny_fixture["cfg"]
    idx = np.random.default_rng(9).permutation(pages.num_rows)
    shuffled = pages.take(pa.array(idx))
    a = to_arrow(dedup_pages(rd.from_arrow(pages), cfg).clusters)
    b = to_arrow(dedup_pages(rd.from_arrow(shuffled), cfg).clusters)
    da = dict(zip(a["doc_id"].to_pylist(), a["cluster_id"].to_pylist()))
    db = dict(zip(b["doc_id"].to_pylist(), b["cluster_id"].to_pylist()))
    assert da == db


def test_clusters_invariant_under_partitioning(ray_session, tiny_fixture):
    """Same clusters at different num_partitions (SURVEY.md §5.3)."""
    pages = tiny_fixture["pages"]
    cfg: DedupConfig = tiny_fixture["cfg"]
    a = to_arrow(
        dedup_pages(rd.from_arrow(pages), cfg, num_partitions=4).clusters
    )
    b = to_arrow(
        dedup_pages(rd.from_arrow(pages), cfg, num_partitions=13).clusters
    )
    da = dict(zip(a["doc_id"].to_pylist(), a["cluster_id"].to_pylist()))
    db = dict(zip(b["doc_id"].to_pylist(), b["cluster_id"].to_pylist()))
    assert da == db
