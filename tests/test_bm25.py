"""BM25 retrieval semantics (the oracle pins the formula at sf0.01)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_bm25_ranks_duplicate_first_and_idf_downweights(ray_session, tmp_path):
    from nlshray.pipelines.queries import bm25_search

    rng = np.random.default_rng(5)
    texts = {
        0: "rare signal phrase alpha beta",          # query
        7: "rare signal phrase alpha beta",          # its exact duplicate
        8: "rare signal noise gamma delta",          # partial match
    }
    rows = []
    for i in range(40):
        if i in texts:
            rows.append(texts[i])
        else:  # background docs share only the stop-ish token 'noise'
            rows.append(
                "noise " + " ".join(f"bg{rng.integers(0, 400)}" for _ in range(12))
            )
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(40), pa.int64()),
            "text": pa.array(rows),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = bm25_search(str(tmp_path), n_queries=1, k=5).to_pandas()
    got = got[got.query_id == 0].sort_values("score", ascending=False)
    assert got.iloc[0].neighbor_id == 7  # exact dup wins
    assert got.iloc[1].neighbor_id == 8  # partial match second
    assert 0 not in set(got.neighbor_id)  # self excluded
