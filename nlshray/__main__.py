"""CLI dispatch — the descendant of the reference's argparse driver
(``/root/reference/main.py:266-403``) reduced to the data-engine verbs.

    python -m nlshray dedup   --input pages_dir --out out_dir [--docs]
    python -m nlshray queries --sf-dir /root/testdata/sf0.01 --name q1_pricing_summary
    python -m nlshray fixture --out /tmp/pages.parquet --n 5000

Owns its Ray session (the library never calls ray.init — driver
contract), guarded for pre-initialised environments.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_dedup(args) -> int:
    _ray_session(args.num_cpus)
    from nlshray.config import DedupConfig

    cfg = DedupConfig(
        threshold=args.threshold, shingle_k=args.shingle_k, seed=args.seed
    )
    if args.checkpoint:
        from nlshray.pipelines.checkpoint import run_checkpointed

        report = run_checkpointed(args.input, args.out, cfg)
        print(
            json.dumps(
                {
                    s: {"skipped": r["skipped"], "rows": r["manifest"]["rows"]}
                    for s, r in report.items()
                }
            )
        )
        return 0

    import ray.data as rd

    from nlshray.pipelines.dedup import dedup_docs, dedup_pages

    if args.docs:
        res = dedup_docs(rd.read_parquet(args.input), cfg, collect_stats=True)
    else:
        res = dedup_pages(rd.read_parquet(args.input), cfg, collect_stats=True)
    res.clusters.write_parquet(f"{args.out}/clusters")
    res.pairs.write_parquet(f"{args.out}/pairs")
    print(json.dumps(res.stats))
    return 0


def cmd_queries(args) -> int:
    _ray_session(args.num_cpus)
    from nlshray.pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(
            f"unknown query {args.name!r}; available: {', '.join(sorted(QUERIES))}",
            file=sys.stderr,
        )
        return 2
    out = QUERIES[args.name](args.sf_dir)
    n = out.count() if hasattr(out, "count") and not hasattr(out, "num_rows") else (
        out.num_rows if hasattr(out, "num_rows") else len(out)
    )
    if args.out:
        if hasattr(out, "write_parquet"):
            out.write_parquet(args.out)
        else:
            import pyarrow.parquet as pq

            pq.write_table(out, args.out)
    print(json.dumps({"query": args.name, "rows": int(n)}))
    return 0


def cmd_index(args) -> int:
    """Build (or grow) the incremental-dedup seen index from a docs
    parquet path."""
    _ray_session(args.num_cpus)
    import ray.data as rd

    from nlshray.config import DedupConfig
    from nlshray.stages.incremental import build_seen_index

    cfg = DedupConfig(
        threshold=args.threshold, shingle_k=args.shingle_k, seed=args.seed
    )
    manifest = build_seen_index(
        rd.read_parquet(args.input), cfg, args.out
    )
    print(json.dumps(manifest))
    return 0


def cmd_probe(args) -> int:
    """Filter a NEW docs parquet against a seen index (exact + near)."""
    _ray_session(args.num_cpus)
    import ray.data as rd

    from nlshray.config import DedupConfig
    from nlshray.stages.incremental import novel_docs_near

    cfg = DedupConfig(
        threshold=args.threshold, shingle_k=args.shingle_k, seed=args.seed
    )
    stats: dict = {}
    out = novel_docs_near(
        rd.read_parquet(args.input), cfg=cfg,
        seen_index_dir=args.index, stats_out=stats,
    )
    out.write_parquet(args.out)
    stats["n_novel"] = out.count()
    print(json.dumps(stats))
    return 0


def cmd_fixture(args) -> int:
    import pyarrow.parquet as pq

    from nlshray.fixtures import generate_pages

    tbl = generate_pages(args.n, seed=args.seed)
    pq.write_table(tbl, args.out, row_group_size=2048)
    print(json.dumps({"rows": tbl.num_rows, "path": args.out}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nlshray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="near-dup detect + cluster")
    d.add_argument("--input", required=True, help="pages/docs parquet path")
    d.add_argument("--out", required=True)
    d.add_argument("--docs", action="store_true",
                   help="input is (doc_id, text) docs, not raw pages")
    d.add_argument("--checkpoint", action="store_true",
                   help="per-stage parquet checkpoints with resume")
    d.add_argument("--threshold", type=float, default=0.8)
    d.add_argument("--shingle-k", type=int, default=5)
    d.add_argument("--seed", type=int, default=42)
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    q = sub.add_parser("queries", help="run one driver-contract query")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--name", required=True)
    q.add_argument("--out", default=None)
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_queries)

    ix = sub.add_parser(
        "index", help="build the incremental-dedup seen index"
    )
    ix.add_argument("--input", required=True, help="seen docs parquet path")
    ix.add_argument("--out", required=True, help="index directory")
    ix.add_argument("--threshold", type=float, default=0.8)
    ix.add_argument("--shingle-k", type=int, default=5)
    ix.add_argument("--seed", type=int, default=42)
    ix.add_argument("--num-cpus", type=int, default=None)
    ix.set_defaults(fn=cmd_index)

    pr = sub.add_parser(
        "probe", help="filter NEW docs against a seen index (exact + near)"
    )
    pr.add_argument("--input", required=True, help="new docs parquet path")
    pr.add_argument("--index", required=True, help="seen index directory")
    pr.add_argument("--out", required=True, help="novel docs parquet out")
    pr.add_argument("--threshold", type=float, default=0.8)
    pr.add_argument("--shingle-k", type=int, default=5)
    pr.add_argument("--seed", type=int, default=42)
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_probe)

    f = sub.add_parser("fixture", help="generate the synthetic pages fixture")
    f.add_argument("--out", required=True)
    f.add_argument("--n", type=int, default=5000)
    f.add_argument("--seed", type=int, default=42)
    f.set_defaults(fn=cmd_fixture)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
