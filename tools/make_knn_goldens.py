"""Regenerate the fixed-seed kNN golden snapshots (VERDICT r3 #2).

Runs the six approximate-kNN query members over the sf0.001 testdata and
writes their full (query_id, neighbor_id, sim) result sets to
``tests/goldens/knn_goldens_sf0.001.json``. All six are
seed-deterministic (hyperplanes / k-means init / ITQ rotation / triplet
training / HNSW level draws all derive from ``DedupConfig.seed``), so
any ranking change is a semantic change and must be reviewed, not
re-recorded blindly.

Usage: python tools/make_knn_goldens.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEMBERS = [
    "knn_cosine_lsh", "knn_hnsw", "knn_ivf", "knn_pq",
    "knn_neural", "knn_neural_trained",
    # the seventh rows-only member: SemDeDup k-means embedding dedup —
    # hash-sampled fit + fixed-iteration Lloyd make it a pure function
    # of (data, seed), so its pair set pins exactly like the kNN sets
    "semantic_dup_pairs",
]
SF_DIR = "/root/testdata/sf0.001"


def canonical(tbl) -> list[list]:
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


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "4")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from nlshray.pipelines.queries import QUERIES

    out = {}
    for name in MEMBERS:
        out[name] = canonical(QUERIES[name](SF_DIR))
        print(name, len(out[name]), "rows", file=sys.stderr)
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "knn_goldens_sf0.001.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print("wrote", dest, file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    main()
