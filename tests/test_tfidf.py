"""tf-idf keywords: direct-pandas equality + parallelism independence."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.tfidf import doc_frequencies, tfidf_topk


def _docs(n=60, seed=9):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 40))) for _ in range(n)
    ]
    texts[3] = ""  # empty doc: contributes to N, gets no keywords
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _direct_topk(t: pa.Table, k=3):
    rows = []
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    n = len(docs)
    df: dict[str, int] = {}
    toks_by_doc = {}
    for did, text in docs:
        toks = [w for w in re.split(r"[^0-9a-z_]+", text.lower()) if w]
        toks_by_doc[did] = toks
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    for did, toks in toks_by_doc.items():
        tf: dict[str, int] = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        scored = [
            (w, c, round(c * (math.log((n + 1) / (df[w] + 1)) + 1), 6))
            for w, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        rows.extend((did, w, c, s) for w, c, s in scored[:k])
    return sorted(rows)


def _collect(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return sorted(
        zip(
            t["doc_id"].to_pylist(),
            t["tok"].to_pylist(),
            t["tf"].to_pylist(),
            t["score"].to_pylist(),
        )
    )


def test_tfidf_matches_direct(ray_session):
    t = _docs()
    got = _collect(tfidf_topk(rd.from_arrow(t).repartition(5), k=3))
    assert got == _direct_topk(t, 3)


def test_tfidf_parallelism_independent(ray_session):
    t = _docs(40, seed=2)
    r1 = _collect(tfidf_topk(rd.from_arrow(t).repartition(2), k=2))
    r2 = _collect(tfidf_topk(rd.from_arrow(t).repartition(7), k=2))
    assert r1 == r2


def test_doc_frequencies(ray_session):
    t = _docs(30, seed=4)
    got = doc_frequencies(rd.from_arrow(t).repartition(4))
    want: dict[str, int] = {}
    for text in t["text"].to_pylist():
        for w in set(x for x in re.split(r"[^0-9a-z_]+", text.lower()) if x):
            want[w] = want.get(w, 0) + 1
    assert dict(zip(got["tok"].to_pylist(), got["df"].to_pylist())) == want


def test_doc_frequencies_sparse_partitions(ray_session):
    """Vocabulary smaller than num_partitions: empty groupby partitions
    (bare schema blocks) must not break the merge, and the single-pass
    doc count must be exact."""
    from nlshray.stages.tfidf import doc_frequencies, tfidf_topk

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aa bb", "aa", "bb aa"], pa.string()),
        }
    )
    tbl, n = doc_frequencies(
        rd.from_arrow(t), num_partitions=8, with_doc_count=True
    )
    assert n == 3
    assert dict(zip(tbl["tok"].to_pylist(), tbl["df"].to_pylist())) == {
        "aa": 3, "bb": 2,
    }
    out = pa.concat_tables(
        tfidf_topk(rd.from_arrow(t), k=1, num_partitions=8).iter_batches(
            batch_format="pyarrow"
        )
    )
    assert out.num_rows == 3  # one keyword per doc, no crash


def test_tfidf_cosine_pairs_vs_sklearn_style_reference(ray_session):
    """Brute pairs match a direct dense tf-idf cosine computed in
    numpy on the same corpus; symmetric, no self-pairs, left<right."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.stages.tfidf import tfidf_cosine_pairs

    rng = np.random.default_rng(23)
    vocab = np.array(["tok%d" % i for i in range(20)])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(120)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    thr = 0.85
    got = (
        tfidf_cosine_pairs(rd.from_arrow(t).repartition(7), thr)
        .to_pandas().sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    # dense reference
    toks = [s.split() for s in texts]
    vmap = {v: i for i, v in enumerate(vocab)}
    tf = np.zeros((120, 20))
    for i, ws in enumerate(toks):
        for wd in ws:
            tf[i, vmap[wd]] += 1
    df = (tf > 0).sum(axis=0)
    idf = np.log((120 + 1) / (df + 1)) + 1
    w = tf * idf
    nrm = np.sqrt((w * w).sum(axis=1))
    cos = (w @ w.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(120, k=1)
    rcos = np.round(cos[iu], 6)
    sel = rcos >= thr
    want = sorted(zip(iu[0][sel], iu[1][sel]))
    assert list(zip(got["left_id"], got["right_id"])) == want
    for (_, row), (i, j) in zip(got.iterrows(), want):
        assert abs(row["cosine"] - np.round(cos[i, j], 6)) < 2e-6
    assert (got["left_id"] < got["right_id"]).all()
