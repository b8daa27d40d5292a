"""Incremental (new-vs-seen) exact dedup — broadcast and bloom plans."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.incremental import (
    _bloom_params,
    _bloom_set,
    _bloom_test,
    _pair_membership,
    _unique_pairs,
    novel_docs,
)


def _docs(texts, start_id=0):
    return pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _sorted_ids(ds):
    return sorted(
        int(x) for b in ds.iter_batches(batch_format="pyarrow")
        for x in b["doc_id"].to_pylist()
    )


def test_novel_docs_broadcast(ray_session):
    seen = _docs(["alpha beta", "gamma delta", "shared text here"], 0)
    new = _docs(
        ["alpha beta", "totally new page", "shared text here", "fresh stuff"],
        100,
    )
    out = novel_docs(rd.from_arrow(new), rd.from_arrow(seen))
    assert _sorted_ids(out) == [101, 103]


def test_novel_docs_bloom_equals_broadcast(ray_session):
    rng = np.random.default_rng(7)
    seen_texts = [f"seen document number {i} word {rng.integers(1000)}" for i in range(200)]
    # half of new duplicates seen text, half is novel
    new_texts = seen_texts[:100] + [f"novel page {i}" for i in range(100)]
    seen = rd.from_arrow(_docs(seen_texts, 0))
    new_tbl = _docs(new_texts, 1000)
    a = _sorted_ids(novel_docs(rd.from_arrow(new_tbl), seen))
    b = _sorted_ids(
        novel_docs(
            rd.from_arrow(new_tbl), seen, force_bloom=True, num_partitions=5
        )
    )
    assert a == b == list(range(1100, 1200))


def test_novel_docs_empty_seen(ray_session):
    new = _docs(["a doc", "b doc"], 0)
    out = novel_docs(rd.from_arrow(new), rd.from_arrow(_docs([], 0)))
    assert _sorted_ids(out) == [0, 1]
    out2 = novel_docs(
        rd.from_arrow(new), rd.from_arrow(_docs([], 0)), force_bloom=True,
        num_partitions=3,
    )
    assert _sorted_ids(out2) == [0, 1]


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 1 << 63, 5000, dtype=np.int64)
    h2 = rng.integers(0, 1 << 63, 5000, dtype=np.int64)
    m, k = _bloom_params(5000, 16)
    words = np.zeros(m >> 6, np.uint64)
    _bloom_set(words, h, h2, k)
    assert _bloom_test(words, h, h2, k).all()  # zero false negatives
    qh = rng.integers(0, 1 << 63, 20000, dtype=np.int64)
    qh2 = rng.integers(0, 1 << 63, 20000, dtype=np.int64)
    fp = _bloom_test(words, qh, qh2, k).mean()
    assert fp < 0.01  # 16 bits/key -> ~4e-4 expected


def test_pair_membership_collision_run():
    # duplicate text_hash with different hash2 (a 63-bit collision):
    # membership must match on the PAIR, not the first hash alone
    H = np.array([5, 5, 9], np.int64)
    H2 = np.array([1, 2, 7], np.int64)
    H, H2 = _unique_pairs(H, H2)
    hit = _pair_membership(
        np.array([5, 5, 5, 9], np.int64),
        np.array([1, 2, 3, 8], np.int64),
        H,
        H2,
    )
    assert hit.tolist() == [True, True, False, False]
