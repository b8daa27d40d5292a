"""Prefix-filtered set-similarity join vs the brute member."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _corpus(n=300, seed=3):
    """Docs with heavy overlap: templates + small edits."""
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(120)]
    templates = [
        " ".join(rng.choice(vocab, size=rng.integers(8, 30), replace=False))
        for _ in range(40)
    ]
    texts = []
    for i in range(n):
        base = templates[int(rng.integers(0, len(templates)))].split()
        k = int(rng.integers(0, 3))
        for _ in range(k):
            base[int(rng.integers(0, len(base)))] = vocab[
                int(rng.integers(0, len(vocab)))
            ]
        texts.append(" ".join(base))
    texts.append("")  # empty doc never pairs
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )


def _brute(t: pa.Table, thr: float):
    """Pure-python exact reference."""
    toks = [set(s.split()) for s in t["text"].to_pylist()]
    ids = t["doc_id"].to_pylist()
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = toks[i], toks[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= thr:
                out.add((ids[i], ids[j], round(jac, 6)))
    return out


@pytest.mark.parametrize("thr", [0.7, 0.9])
@pytest.mark.parametrize("ordering", ["freq", "hash"])
def test_ssjoin_matches_brute(ray_session, thr, ordering):
    from nlshray.stages.ssjoin import ssjoin_jaccard

    t = _corpus()
    got = ssjoin_jaccard(
        rd.from_arrow(t).repartition(5),
        thr,
        ordering=ordering,
        num_partitions=4,
    ).to_pandas()
    got_set = {
        (r.left_id, r.right_id, r.jaccard) for r in got.itertuples()
    }
    assert len(got_set) == len(got)  # each pair exactly once
    assert got_set == _brute(t, thr)


def test_ssjoin_parallelism_independent(ray_session):
    from nlshray.stages.ssjoin import ssjoin_jaccard

    t = _corpus(seed=9)
    outs = []
    for nparts, P in [(2, 2), (7, 5)]:
        outs.append(
            ssjoin_jaccard(
                rd.from_arrow(t).repartition(nparts), 0.8, num_partitions=P
            )
            .to_pandas()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
