"""Fixed-seed golden snapshots for the six approximate kNN members
(VERDICT r3 #2).

All six members are seed-deterministic — hyperplane draws, k-means
init, ITQ rotation, triplet training, and HNSW level assignment all
derive from ``DedupConfig.seed`` (``functions/hnsw.py:13``) — so their
full (query_id, neighbor_id, sim) result sets are committed as goldens
(``tools/make_knn_goldens.py`` regenerates; mirrors the reference's
pinned-eval shape, ``/root/reference/eval.py:178-196``). Any ranking
change fails here and must be reviewed as a semantic change.

Cross-parallelism: the same members re-run in a fresh subprocess at a
different ``num_cpus`` must be bit-identical — buckets/graphs are
functions of (data, seed), never of block layout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens", "knn_goldens_sf0.001.json"
)
SF_DIR = "/root/testdata/sf0.001"
MEMBERS = [
    "knn_cosine_lsh", "knn_hnsw", "knn_ivf", "knn_pq",
    "knn_neural", "knn_neural_trained",
    # SemDeDup k-means dedup: hash-sampled fit + fixed-iter Lloyd ->
    # pure function of (data, seed); pinned exactly like the kNN sets
    "semantic_dup_pairs",
]


def _canonical(tbl) -> list[list]:
    if "query_id" in tbl.column_names:
        cols = ("query_id", "neighbor_id", "sim")
    else:                      # semantic_dup_pairs: (left_id, right_id, cosine)
        cols = ("left_id", "right_id", "cosine")
    rows = sorted(
        zip(
            tbl[cols[0]].to_pylist(),
            tbl[cols[1]].to_pylist(),
            tbl[cols[2]].to_pylist(),
        )
    )
    return [[int(q), int(n), float(s)] for q, n, s in rows]


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", MEMBERS)
def test_knn_member_matches_golden(ray_session, goldens, name):
    from nlshray.pipelines.queries import QUERIES

    got = _canonical(QUERIES[name](SF_DIR))
    want = goldens[name]
    assert len(got) == len(want) > 0
    assert got == want, f"{name}: ranking changed vs committed golden"


def test_knn_members_parallelism_invariant(ray_session, goldens, tmp_path):
    """One fresh subprocess at num_cpus=8 (session fixture runs 4):
    every member's full result set must be bit-identical to the golden
    — i.e. independent of Ray parallelism and of index build-vs-reload
    (the subprocess reloads the persisted HNSW/IVF/PQ artifacts)."""
    out_file = tmp_path / "knn8.json"
    script = f"""
import json, os, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
os.environ["RAY_GRAFT_CPUS"] = "8"
from tools.make_knn_goldens import MEMBERS, canonical
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from nlshray.pipelines.queries import QUERIES
out = {{m: canonical(QUERIES[m]({SF_DIR!r})) for m in MEMBERS}}
json.dump(out, open({str(out_file)!r}, "w"))
ray.shutdown()
"""
    subprocess.run(
        [sys.executable, "-c", script],
        check=True,
        capture_output=True,
        text=True,
        timeout=540,
    )
    with open(out_file) as f:
        got8 = json.load(f)
    for name in MEMBERS:
        assert got8[name] == goldens[name], f"{name}: differs at num_cpus=8"
