"""Content-defined chunking (gear-rolling-hash CDC) + chunk-level dedup.

The storage-dedup family (Xia et al., FastCDC, USENIX ATC 2016): chunk
boundaries are set where a rolling hash of the last 64 bytes hits a
mask, so an insertion near the head of a document shifts only the
chunks it touches — byte-offset chunking would shift every later chunk.
Chunk-level dedup then finds byte ranges shared ACROSS documents even
when no full document (and no fixed k-gram alignment) matches: the
member of the dedup family that catches templated boilerplate blocks
and quoted passages at byte granularity.

Scale plan — all per-batch work is vectorized over the batch's
concatenated UTF-8 buffer:
  * gear hash: 64 shift-add passes over the whole buffer (uint64 wrap),
    NOT a per-byte python loop; cross-document contamination in the
    first 63 bytes of each doc is provably irrelevant because
    ``min_size > 64`` gates those positions out of candidacy.
  * boundary walk: python only over CANDIDATE cut points (expected one
    per 2^mask_bits bytes), never over bytes.
  * chunk hashes: one ``poly_fold_ragged`` segmented fold over the
    buffer (chunks tile each doc exactly) + splitmix finalize — the
    same kernel the exact-dup stage uses (`nlshray/hashing.py:109`).
  * dedup: only (doc_id, chunk_hash, length) int64 rows move — a raw
    two-round task shuffle (the `stages/lm.py:merged_bigram_counts`
    plan shape: Dataset.groupby.map_groups walks every tiny hash group
    in Python, measured 25 s at 50k pages; two numpy rounds do the
    same flagging in ~3 s), then ONE built-in groupby(doc_id) sum over
    the per-shard per-doc partials. Text never moves.

Reference parity: the reference has no byte-level dedup member; this
extends the dedup family table in SURVEY.md §2.7 the same way the
ExactSubstr and SimHash members do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.hashing import (
    _seed_mix,
    _string_array_bytes,
    poly_fold_ragged,
    splitmix64,
)

_U64 = np.uint64
WINDOW = 64  # effective gear window: bits age out of the register after 64 shifts


def gear_table(seed: int = 0x5EED) -> np.ndarray:
    """256-entry random table, derived from the seed via splitmix64."""
    return splitmix64(np.arange(256, dtype=_U64) ^ _seed_mix(seed))


def gear_hashes(buf: np.ndarray, gear: np.ndarray) -> np.ndarray:
    """h[i] = sum_{j=0..63} gear[buf[i-j]] << j (mod 2^64) — the value
    of the classic per-byte recurrence ``h = (h << 1) + gear[b]`` at
    every position >= 63, computed with 64 vector passes."""
    g = gear[buf]
    h = g.copy()
    n = h.shape[0]
    with np.errstate(over="ignore"):
        for j in range(1, WINDOW):
            if j >= n:
                break
            h[j:] += g[: n - j] << _U64(j)
    return h


def cut_points(
    cand: np.ndarray, doc_len: int, min_size: int, max_size: int
) -> np.ndarray:
    """Chunk end-offsets (exclusive) for one doc given its sorted
    candidate end-offsets. Uniform rule per chunk starting at `start`:
    a remainder <= min_size closes the doc; else the first candidate in
    (start+min_size-1, start+max_size] cuts; else cut at start+max_size
    (or doc end if nearer). A sub-min tail after a candidate cut stays
    its own final chunk — boundary stability beats size uniformity for
    dedup."""
    ends: list[int] = []
    start = 0
    while start < doc_len:
        if doc_len - start <= min_size:
            e = doc_len
        else:
            lo, hi = start + min_size, start + max_size
            k = int(np.searchsorted(cand, lo, side="left"))
            if k < len(cand) and cand[k] <= min(hi, doc_len):
                e = int(cand[k])
            elif doc_len - start <= max_size:
                e = doc_len
            else:
                e = hi
        ends.append(e)
        start = e
    return np.asarray(ends, dtype=np.int64)


def chunk_table(
    t: pa.Table,
    min_size: int = 128,
    max_size: int = 1024,
    mask_bits: int = 7,
    seed: int = 0x5EED,
) -> pa.Table:
    """(doc_id, chunk_idx, start, length, chunk_hash) for one batch."""
    assert min_size > WINDOW, "min_size must exceed the gear window"
    arr = t["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf, doc_lens = _string_array_bytes(arr)
    mask = _U64((1 << mask_bits) - 1)
    h = gear_hashes(buf, gear_table(seed))
    hits = np.nonzero((h & mask) == 0)[0] + 1  # end-offset = index + 1
    doc_ends = np.cumsum(doc_lens)
    doc_starts = doc_ends - doc_lens
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)

    out_doc, out_idx, out_len = [], [], []
    lo_k = np.searchsorted(hits, doc_starts, side="left")
    hi_k = np.searchsorted(hits, doc_ends, side="right")
    for d in range(len(doc_lens)):
        cand = hits[lo_k[d] : hi_k[d]] - doc_starts[d]
        ends = cut_points(cand, int(doc_lens[d]), min_size, max_size)
        lens = np.diff(np.concatenate([[0], ends]))
        out_doc.append(np.full(len(ends), doc_ids[d], np.int64))
        out_idx.append(np.arange(len(ends), dtype=np.int64))
        out_len.append(lens)
    if out_doc:
        doc = np.concatenate(out_doc)
        idx = np.concatenate(out_idx)
        lens = np.concatenate(out_len)
    else:
        doc = idx = lens = np.zeros(0, np.int64)
    # chunks tile the buffer contiguously -> one segmented fold
    raw = poly_fold_ragged(buf, lens)
    chash = splitmix64(raw ^ _seed_mix(seed))
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else lens
    # starts above are buffer-global; rebase per doc
    if len(lens):
        first_of_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
        doc_base = np.maximum.accumulate(
            np.where(first_of_doc, starts, 0)
        )
        starts = starts - doc_base
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "chunk_hash": pa.array(chash.view(np.int64), pa.int64()),
        }
    )


def _cdc_triples(t: pa.Table) -> pa.Table:
    """Round-A partial: project one block's chunk rows to the
    (doc_id, chunk_hash, length) int64 triples — no text."""
    return t.select(["doc_id", "chunk_hash", "length"])


def _cdc_flag(t: pa.Table) -> pa.Table:
    """Round-B merge: one numpy lexsort per shard flags every chunk
    whose hash spans >= 2 distinct docs, then rolls up per-doc
    partials."""
    if len(t) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chunks": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
                "n_dup_chunks": pa.array([], pa.int64()),
                "dup_bytes": pa.array([], pa.int64()),
            }
        )
    h = t["chunk_hash"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    ln = t["length"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, h))
    h, d, ln = h[order], d[order], ln[order]
    new_run = np.concatenate([[True], h[1:] != h[:-1]])
    new_doc = np.concatenate([[True], (d[1:] != d[:-1]) | new_run[1:]])
    run_id = np.cumsum(new_run) - 1
    n_distinct = np.bincount(run_id, weights=new_doc).astype(np.int64)
    is_dup = (n_distinct >= 2)[run_id].astype(np.int64)
    ud, inv = np.unique(d, return_inverse=True)
    return pa.table(
        {
            "doc_id": pa.array(ud, pa.int64()),
            "n_chunks": pa.array(np.bincount(inv).astype(np.int64)),
            "n_bytes": pa.array(np.bincount(inv, weights=ln).astype(np.int64)),
            "n_dup_chunks": pa.array(np.bincount(inv, weights=is_dup).astype(np.int64)),
            "dup_bytes": pa.array(
                np.bincount(inv, weights=ln * is_dup).astype(np.int64)
            ),
        }
    )


def cdc_chunk_dedup(
    docs: rd.Dataset,
    min_size: int = 128,
    max_size: int = 1024,
    mask_bits: int = 7,
    seed: int = 0x5EED,
    nparts: int = 8,
) -> rd.Dataset:
    """Per-doc chunk-dedup report: (doc_id, n_chunks, n_bytes,
    n_dup_chunks, dup_bytes) where a chunk is 'dup' iff its hash occurs
    in >= 2 DISTINCT documents."""

    def chunks(t: pa.Table) -> pa.Table:
        return chunk_table(t, min_size, max_size, mask_bits, seed)

    from nlshray.stages.exchange import hash_exchange, int64_key_hash

    ch = docs.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)
    refs = ch.to_arrow_refs()
    if not refs:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_hash": pa.array([], pa.int64()),
                "length": pa.array([], pa.int64()),
            }
        )
        return rd.from_arrow(_cdc_flag(empty))
    from nlshray.stages.exchange import _identity_table, grouped_sum_merge

    b_out = hash_exchange(
        refs, _cdc_triples, int64_key_hash("chunk_hash"), _cdc_flag, nparts
    )
    # a doc's chunks span shards (keyed by chunk_hash), so each doc has
    # up to P per-shard partial rows — one more tiny exchange keyed by
    # doc_id rolls them up exactly
    c_out = hash_exchange(
        b_out,
        _identity_table,
        int64_key_hash("doc_id"),
        grouped_sum_merge(
            "doc_id", ["n_chunks", "n_bytes", "n_dup_chunks", "dup_bytes"]
        ),
        nparts,
    )
    return rd.from_arrow_refs(c_out)
