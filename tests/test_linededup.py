"""Cross-document line dedup (stages/linededup) on multi-line corpora.

The sf testdata has no newlines (the driver oracle checks the identity
path); the multi-line semantics — distinct-doc counting, within-doc
repeats, order preservation, all-dropped docs — are pinned here against
a pure-python reference and a DuckDB replay of the registry SQL.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _make_docs(n: int = 200, seed: int = 7) -> list[tuple[int, str]]:
    rng = np.random.default_rng(seed)
    boiler = [f"BOILER LINE {i}" for i in range(8)]
    docs = []
    for i in range(n):
        lines = []
        for _ in range(int(rng.integers(1, 7))):
            if rng.random() < 0.4:
                lines.append(boiler[int(rng.integers(0, len(boiler)))])
            else:
                words = rng.integers(0, 50, size=int(rng.integers(1, 8)))
                lines.append(" ".join(f"w{w}" for w in words))
        if rng.random() < 0.1:  # within-doc repeat of a unique line
            lines.append(lines[0])
        docs.append((i, "\n".join(lines)))
    docs.append((n, ""))  # empty doc
    return docs


def _py_reference(docs, min_docs):
    c: Counter = Counter()
    for _, s in docs:
        for ln in set(s.split("\n")):
            c[ln] += 1
    boiler = {ln for ln, k in c.items() if k >= min_docs}
    out = {}
    for d, s in docs:
        lines = s.split("\n")
        kept = [ln for ln in lines if ln not in boiler]
        out[d] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return boiler, out


def _ds(docs, nparts=4):
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    return rd.from_arrow(t).repartition(nparts)


@pytest.mark.parametrize("min_docs", [2, 3])
def test_line_dedup_matches_python_reference(ray_session, min_docs):
    from nlshray.stages.linededup import boilerplate_lines, line_dedup

    docs = _make_docs()
    boiler_ref, ref = _py_reference(docs, min_docs)

    got_boiler = boilerplate_lines(_ds(docs), min_docs).to_pandas()
    assert set(got_boiler["line"]) == boiler_ref
    # counts are exact distinct-doc counts, not occurrence counts
    exact = Counter()
    for _, s in docs:
        for ln in set(s.split("\n")):
            exact[ln] += 1
    for ln, nd in zip(got_boiler["line"], got_boiler["n_docs"]):
        assert nd == exact[ln]

    out = line_dedup(_ds(docs), min_docs).to_pandas()
    assert len(out) == len(docs)
    for row in out.itertuples():
        ct, nl, ndrop = ref[row.doc_id]
        assert row.clean_text == ct
        assert row.n_lines == nl and row.n_dropped == ndrop


def test_line_dedup_parallelism_independent(ray_session):
    from nlshray.stages.linededup import line_dedup

    docs = _make_docs(seed=11)
    a = line_dedup(_ds(docs, 2), 2).to_pandas().sort_values("doc_id")
    b = line_dedup(_ds(docs, 9), 2).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_line_dedup_oracle_sql_replay_multiline(ray_session, tmp_path):
    """The registry SQL agrees with the Ray kernel on NON-degenerate
    (multi-line) data, not just the newline-free sf corpora."""
    import duckdb

    from nlshray.pipelines.queries import ORACLE_SQL, line_dedup_docs

    docs = _make_docs(seed=23)
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        line_dedup_docs(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.sql(ORACLE_SQL["line_dedup_docs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[got.columns]
        .astype({c: got[c].dtype for c in got.columns})
    )
    assert got.equals(want)


def test_containment_pairs_finds_subset_jaccard_misses(ray_session, tmp_path):
    """A short doc quoted whole inside a long one: overlap == 1.0 while
    Jaccard is far below 0.9 — the pair the Jaccard member can't see."""
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    other = " ".join(f"zed{i}" for i in range(30))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([short, long, other]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = containment_pairs(str(tmp_path)).to_pandas()
    assert [(r.left_id, r.right_id, r.overlap) for r in got.itertuples()] == [
        (1, 2, 1.0)
    ]
    jac = ngram_jaccard_pairs(str(tmp_path)).to_pandas()
    assert len(jac) == 0  # Jaccard(short, long) = 4/44 << 0.9
