"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest

import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture():
    """500-row pages table + oracle tables, generated once per session."""
    from nlshray.config import DedupConfig
    from nlshray.fixtures import (
        compute_true_clusters,
        compute_true_pairs,
        generate_pages,
    )

    cfg = DedupConfig()
    pages = generate_pages(500, seed=42)
    tp = compute_true_pairs(pages, cfg)
    tc = compute_true_clusters(pages, tp)
    return {"pages": pages, "true_pairs": tp, "true_clusters": tc, "cfg": cfg}


@pytest.fixture(scope="session")
def tiny_result(ray_session, tiny_fixture):
    """Full pipeline output over the tiny fixture, shared across tests."""
    import ray.data as rd

    from nlshray.pipelines.dedup import dedup_pages, to_arrow

    res = dedup_pages(
        rd.from_arrow(tiny_fixture["pages"]),
        tiny_fixture["cfg"],
        collect_stats=True,
    )
    return {
        "result": res,
        "clusters": to_arrow(res.clusters),
        "pairs": to_arrow(res.pairs),
    }
