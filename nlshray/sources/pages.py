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
    ds: rd.Dataset,
    out_dir: str,
    *,
    partition_by: list[str] | None = None,
    min_rows_per_file: int = 500_000,
) -> None:
    """Directory-of-parts sink: never one giant file, so a rerun can
    skip finished partitions (ray_guide 'Sources & sinks'). With
    ``partition_by``, writes hive-layout key directories
    (``lang=en/...``) so downstream reads of one key prune at the
    directory level."""
    ds.write_parquet(
        out_dir,
        partition_cols=partition_by,
        min_rows_per_file=min_rows_per_file,
    )


# ---------------------------------------------------------------------
# Non-parquet sources: web corpora arrive as JSONL dumps (one object
# per line) and tabular sidecars as CSV. Arrow's readers infer types;
# the helpers below normalize to the engine's schemas so every
# downstream pipeline runs identically regardless of the wire format.
# JSON/CSV cannot push column pruning into the read the way parquet
# does — the prune happens right after, and the docstrings say so, so
# a 100-TB user knows to convert to parquet first for scan-heavy work.
# ---------------------------------------------------------------------


def _cast_like(ds: rd.Dataset, types: dict[str, pa.DataType]) -> rd.Dataset:
    """Cast named columns to the engine's canonical types (no-op when
    the inferred type already matches)."""

    def f(t: pa.Table) -> pa.Table:
        for name, typ in types.items():
            if name in t.column_names and t.schema.field(name).type != typ:
                i = t.column_names.index(name)
                t = t.set_column(i, name, t[name].cast(typ))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def read_docs_json(paths, *, columns: list[str] | None = None) -> rd.Dataset:
    """Read a documents table from JSONL (one JSON object per line;
    ``.gz``/``.zst`` handled by Arrow). Columns are pruned AFTER the
    read — JSON has no column projection; convert to parquet for
    scan-heavy 100-TB work."""
    ds = rd.read_json(paths)
    cols = columns or ["doc_id", "text"]
    return _cast_like(
        ds.select_columns(cols),
        {"doc_id": pa.int64(), "text": pa.string(), "n_chars": pa.int64()},
    )


def read_pages_json(
    paths, *, columns: list[str] | None = None
) -> rd.Dataset:
    """Read a pages table from JSONL; same pruning caveat as
    ``read_docs_json``. Wire encoding: ``warc_ts`` as epoch
    microseconds (or an ISO string — both cast), ``html`` as utf-8
    text; both are normalized to the engine's parquet schema
    (timestamp[us] / binary)."""
    ds = rd.read_json(paths)
    cols = columns or ["url", "warc_ts", "html", "lang"]
    return _cast_like(
        ds.select_columns(cols),
        {
            "url": pa.string(),
            "warc_ts": pa.timestamp("us"),
            "html": pa.binary(),
            "lang": pa.string(),
        },
    )


def read_docs_csv(paths, *, columns: list[str] | None = None) -> rd.Dataset:
    """Read a documents table from CSV (header row required)."""
    ds = rd.read_csv(paths)
    cols = columns or ["doc_id", "text"]
    return _cast_like(
        ds.select_columns(cols),
        {"doc_id": pa.int64(), "text": pa.string(), "n_chars": pa.int64()},
    )


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Directory-of-parts JSONL sink (interchange with non-Arrow
    consumers; parquet remains the engine's native format)."""
    ds.write_json(out_dir)
