"""Overlapping document chunking — the embedding/RAG prep operator.

Splits each doc's text into fixed-size windows with overlap
(`size`/`overlap` in characters; ASCII corpora: bytes == chars, the
same stance every byte-level oracle in this repo documents). Fully
vectorized: chunk counts/starts/ends come from the per-doc length
arithmetic, and the chunk payloads are ONE fancy-index gather over the
batch's concatenated utf-8 buffer (``hashing._string_array_bytes`` —
zero per-row Python). Streams block-by-block; no shuffle.

Chunk rule (replayed verbatim by the SQL oracle): step = size -
overlap; chunk i of a doc covers [i*step, min(i*step + size, len));
n_chunks = ceil(max(len, 1) / step) — an empty doc yields one empty
chunk, so every doc_id survives into the chunked table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.functions.nputil import segment_ids, segmented_arange
from nlshray.hashing import _string_array_bytes


def chunk_docs(
    ds: rd.Dataset, *, size: int = 200, overlap: int = 50,
    id_col: str = "doc_id", text_col: str = "text",
) -> rd.Dataset:
    """(doc_id, chunk_idx, chunk_text) with overlapping windows."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        data, lens = _string_array_bytes(arr)
        lens = lens.astype(np.int64)
        doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        n_chunks = np.ceil(np.maximum(lens, 1) / step).astype(np.int64)
        doc_of_chunk = segment_ids(n_chunks)
        # 0-based chunk index within each doc
        idx = segmented_arange(np.zeros(len(lens), np.int64), n_chunks)
        starts = idx * step
        ends = np.minimum(starts + size, lens[doc_of_chunk])
        span = np.maximum(ends - starts, 0)
        abs_starts = doc_starts[doc_of_chunk] + starts
        # one gather index per output byte: arange(abs_start, abs_end)
        gather = segmented_arange(abs_starts, span)
        buf = data[gather] if gather.shape[0] else np.empty(0, np.uint8)
        offsets = np.concatenate([[0], np.cumsum(span)]).astype(np.int32)
        chunk_text = pa.StringArray.from_buffers(
            len(span),
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(buf.tobytes()),
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[doc_of_chunk], pa.int64()),
                "chunk_idx": pa.array(idx),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
