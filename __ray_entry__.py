"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Per the contract, nothing here (nor in the nlshray library) calls
``ray.init`` / ``ray.shutdown``; only bench.py, CLI entry points and the
pytest fixture own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: MinHash/LSH near-dup clustering over the
    sf0.001 documents table -> (doc_id, cluster_id) for every doc."""
    import ray.data as rd

    from nlshray.config import DedupConfig
    from nlshray.pipelines.dedup import dedup_docs

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    res = dedup_docs(docs, DedupConfig(), num_partitions=8)
    return res.clusters


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from nlshray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query above."""
    from nlshray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
