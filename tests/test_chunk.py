"""Overlapping chunking: direct-slicing equality + edge cases."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from nlshray.stages.chunk import chunk_docs


def _direct(texts, size, overlap):
    step = size - overlap
    out = []
    for d, s in enumerate(texts):
        for i in range(math.ceil(max(len(s), 1) / step)):
            out.append((d, i, s[i * step : i * step + size]))
    return out


@pytest.mark.parametrize("size,overlap", [(8, 3), (10, 0), (5, 4)])
def test_chunk_docs_matches_direct(ray_session, size, overlap):
    rng = np.random.default_rng(6)
    texts = ["".join(rng.choice(list("abcdef "), rng.integers(0, 40)))
             for _ in range(50)]
    texts[7] = ""  # empty doc -> one empty chunk
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = pa.concat_tables(
        chunk_docs(
            rd.from_arrow(t).repartition(4), size=size, overlap=overlap
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
    got = list(zip(out["doc_id"].to_pylist(), out["chunk_idx"].to_pylist(),
                   out["chunk_text"].to_pylist()))
    assert got == _direct(texts, size, overlap)


def test_chunk_docs_rejects_bad_overlap(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x"], pa.string())})
    with pytest.raises(ValueError):
        chunk_docs(rd.from_arrow(t), size=5, overlap=5)
