"""Parquet readers/writers for the engine's tables."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def clean_schema(paths, columns: list[str] | None = None) -> pa.Schema | None:
    """Metadata-free (and column-pruned) schema of a parquet file/dir.

    Parquet written by pandas/pyarrow carries a ``pandas`` schema-metadata
    dict; Ray's block-schema dedup tries ``hash(schema)`` which raises on
    dict-valued metadata and logs a noisy warning per task. Passing an
    explicit stripped schema to ``read_parquet`` keeps blocks clean.
    """
    path = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return None
        path = os.path.join(path, parts[0])
    try:
        s = pq.read_schema(path)
    except (OSError, pa.ArrowInvalid):
        return None
    if columns:
        s = pa.schema([s.field(c) for c in columns])
    return s.remove_metadata()


def read_parquet_clean(paths, *, columns=None, **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` with schema metadata stripped at the read."""
    return rd.read_parquet(
        paths, columns=columns, schema=clean_schema(paths, columns), **kwargs
    )


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
    return read_parquet_clean(
        paths, columns=cols, override_num_blocks=override_num_blocks
    )


def read_docs(paths, *, columns: list[str] | None = None) -> rd.Dataset:
    """Read a documents table (doc_id, text, ...)."""
    return read_parquet_clean(paths, columns=columns or ["doc_id", "text"])


def write_partitioned(
    ds: rd.Dataset, out_dir: str, *, min_rows_per_file: int = 500_000
) -> None:
    """Directory-of-parts sink: never one giant file, so a rerun can
    skip finished partitions (ray_guide 'Sources & sinks')."""
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
