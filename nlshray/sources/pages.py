"""Parquet readers/writers for the engine's tables."""

from __future__ import annotations

import ray.data as rd

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    paths,
    *,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Read a pages table, pruning to the extraction inputs by default.

    ``text`` is deliberately NOT read by default — the pipeline derives
    it from ``html`` (the byte-identical extraction invariant) and a
    read that loads a column the first stage recomputes is waste.
    """
    cols = columns or ["url", "warc_ts", "html", "lang"]
    return rd.read_parquet(
        paths, columns=cols, override_num_blocks=override_num_blocks
    )


def read_docs(paths, *, columns: list[str] | None = None) -> rd.Dataset:
    """Read a documents table (doc_id, text, ...)."""
    return rd.read_parquet(paths, columns=columns or ["doc_id", "text"])


def write_partitioned(
    ds: rd.Dataset, out_dir: str, *, min_rows_per_file: int = 500_000
) -> None:
    """Directory-of-parts sink: never one giant file, so a rerun can
    skip finished partitions (ray_guide 'Sources & sinks')."""
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
