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


def test_metrics_sink_stream(ray_session, tmp_path):
    """JSONL metrics sink: one meta event + one event per stage on a
    cold run; skip events on resume (the reference's pluggable logger
    surface, loggers.py:6-97, as a no-network JSONL stream)."""
    import json

    import pyarrow.parquet as pq

    from nlshray.fixtures import generate_pages
    from nlshray.pipelines.checkpoint import run_checkpointed
    from nlshray.state.metrics import CompositeSink, JsonlSink, NullSink

    pages = generate_pages(120, seed=7)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    mpath = str(tmp_path / "metrics.jsonl")
    sink = CompositeSink(JsonlSink(mpath), NullSink())

    run_checkpointed(ppath, str(tmp_path / "ckpt"), sink=sink)
    events = [json.loads(l) for l in open(mpath)]
    kinds = [e["event"] for e in events]
    assert kinds[0] == "meta"
    stages = [e["stage"] for e in events if e["event"] == "stage"]
    assert len(stages) >= 4                      # docs/sigs/pairs/... stages
    assert all(not e.get("metrics", {}).get("skipped", False)
               for e in events if e["event"] == "stage")

    # resume: everything skips, and says so in the stream
    run_checkpointed(ppath, str(tmp_path / "ckpt"), sink=sink)
    events2 = [json.loads(l) for l in open(mpath)][len(events):]
    skipped = [e for e in events2 if e["event"] == "stage"]
    assert skipped and all(e["metrics"]["skipped"] for e in skipped)
