"""Grouped top-k and stratified sampling — combiner correctness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.topk import grouped_topk, stratified_sample


def _tbl(n=200, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(
                [["en", "de", "fr"][i] for i in rng.integers(0, 3, n)]
            ),
            "n_chars": pa.array(rng.integers(10, 100, n).astype(np.int64)),
        }
    )


def _pdf(ds):
    import pandas as pd

    df = ds.to_pandas()
    return df.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def test_grouped_topk_matches_pandas(ray_session):
    t = _tbl()
    got = _pdf(grouped_topk(rd.from_arrow(t), "lang", "n_chars", 4))
    df = t.to_pandas()
    want = (
        df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("lang", group_keys=False)
        .head(4)
    )
    want = want.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])


def test_grouped_topk_parallelism_independent(ray_session):
    t = _tbl(300, seed=9)
    a = _pdf(grouped_topk(rd.from_arrow(t), "lang", "n_chars", 3))
    b = _pdf(
        grouped_topk(
            rd.from_arrow(t).repartition(13), "lang", "n_chars", 3
        )
    )
    assert a.equals(b)


def test_stratified_exact_quota(ray_session):
    t = _tbl(250, seed=1)
    out = _pdf(stratified_sample(rd.from_arrow(t), "lang", 0.2, seed=42))
    df = t.to_pandas()
    sizes = df.groupby("lang").size()
    got_sizes = out.groupby("lang").size()
    for lang, n in sizes.items():
        assert got_sizes.get(lang, 0) == int(np.ceil(0.2 * n))
    # deterministic across partitioning
    out2 = _pdf(
        stratified_sample(
            rd.from_arrow(t).repartition(7), "lang", 0.2, seed=42
        )
    )
    assert out.equals(out2)
