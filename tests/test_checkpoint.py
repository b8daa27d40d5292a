"""Checkpoint/resume invariants (SURVEY.md §5.3: 'resume-from-manifest
equals cold run'; BASELINE.md resumability row)."""

import os

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from nlshray.config import DedupConfig
from nlshray.pipelines.checkpoint import STAGES, run_checkpointed
from nlshray.pipelines.dedup import dedup_pages, to_arrow


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory, tiny_fixture):
    d = tmp_path_factory.mktemp("ckpt_pages")
    p = str(d / "pages.parquet")
    pq.write_table(tiny_fixture["pages"], p, row_group_size=128)
    return p


def _clusters_dict(out_root):
    t = pq.read_table(os.path.join(out_root, "clusters"))
    return dict(zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()))


def test_cold_run_matches_in_memory(ray_session, pages_path, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    report = run_checkpointed(pages_path, out, tiny_fixture["cfg"])
    assert [s for s in STAGES] == list(report)
    assert not any(r["skipped"] for r in report.values())
    got = _clusters_dict(out)
    mem = to_arrow(
        dedup_pages(
            rd.from_arrow(tiny_fixture["pages"]), tiny_fixture["cfg"]
        ).clusters
    )
    want = dict(zip(mem["doc_id"].to_pylist(), mem["cluster_id"].to_pylist()))
    assert got == want


def test_rerun_skips_everything(ray_session, pages_path, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(pages_path, out, tiny_fixture["cfg"])
    report = run_checkpointed(pages_path, out, tiny_fixture["cfg"])
    assert all(r["skipped"] for r in report.values())


def test_resume_after_partial_run(ray_session, pages_path, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    partial = run_checkpointed(
        pages_path, out, tiny_fixture["cfg"], stop_after="sigs"
    )
    assert list(partial) == ["docs", "sigs"]
    report = run_checkpointed(pages_path, out, tiny_fixture["cfg"])
    assert report["docs"]["skipped"] and report["sigs"]["skipped"]
    assert not report["pairs"]["skipped"]
    # resumed result equals a cold run elsewhere
    out2 = str(tmp_path / "out2")
    run_checkpointed(pages_path, out2, tiny_fixture["cfg"])
    assert _clusters_dict(out) == _clusters_dict(out2)


def test_config_change_invalidates(ray_session, pages_path, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(pages_path, out, tiny_fixture["cfg"])
    other = DedupConfig(threshold=0.7)
    report = run_checkpointed(pages_path, out, other)
    assert not any(r["skipped"] for r in report.values())


def test_stage_metrics_recorded(ray_session, pages_path, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    report = run_checkpointed(pages_path, out, tiny_fixture["cfg"])
    pm = report["pairs"]["manifest"]
    assert pm["metrics"]["hot_buckets"] > 0
    assert pm["rows"] > 0
    assert pm["wall_sec"] > 0
