"""Driver-contract registry invariants."""

import numpy as np

import __ray_entry__ as entry_mod


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oss = entry_mod.oracle_sql()
    assert set(oss) <= set(qs), set(oss) - set(qs)
    assert len(qs) >= 18
    assert len(oss) >= 12
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oss.values())


def test_smoke_one_query_runs(ray_session):
    out = entry_mod.queries()["token_counts"]("/root/testdata/sf0.001")
    import ray

    tbl = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(tbl) == 500


def test_sampled_docs_seeded_deterministic(ray_session):
    """T2: Dataset.random_sample(seed=) — same seed, same sample."""
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import QUERIES

    a = to_arrow(QUERIES["sampled_docs"]("/root/testdata/sf0.001"))
    b = to_arrow(QUERIES["sampled_docs"]("/root/testdata/sf0.001"))
    assert a.num_rows > 0
    assert sorted(a["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())
