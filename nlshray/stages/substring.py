"""Substring-duplication detection (the suffix-array-family member of
the dedup toolbox, north-rule: 'MinHash/SimHash/suffix-array substring').

Instead of a distributed suffix array (heavy at 10^12 docs), this uses
the standard scalable approximation — winnowed rolling-hash
fingerprints (Schleimer et al., MOSS; the same construction behind
suffix-style dedup in large-corpus pipelines): any substring match of
length >= window + winnow - 1 is guaranteed to share at least one
selected fingerprint, so fingerprint collisions are a complete candidate
generator for long verbatim overlaps.

Pipeline (reuses the LSH bucket machinery end-to-end):

    docs -> per-doc winnowed fingerprints (band rows: fp as band_hash)
         -> candidate_pairs_stage (sort/scan bucket detection, skew caps)
         -> verify: recompute both docs' window-hash sets, count shared
            windows, and confirm one true match by byte comparison at
            the matched offsets (no hash-collision false positives)

Output: (left_id, right_id, n_shared_windows, match_len_checked).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.config import DedupConfig
from nlshray.hashing import MASK63, splitmix64

_POLY = np.uint64(0x100000001B3)


def rolling_window_hashes(text: str, window: int = 50) -> np.ndarray:
    """uint64 hash of every ``window``-byte substring (vectorized)."""
    data = text.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = arr.shape[0] - window + 1
    acc = np.zeros(n, dtype=np.uint64)
    for i in range(window):
        acc = acc * _POLY + arr[i : n + i]
    return splitmix64(acc)


def winnow(hashes: np.ndarray, w: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing: the min hash of each length-w window of positions,
    deduplicated -> (fingerprints, positions). Guarantees every substring
    of length >= window + w - 1 contributes a selected fingerprint."""
    n = hashes.shape[0]
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    if n <= w:
        pos = int(np.argmin(hashes))
        return hashes[pos : pos + 1], np.array([pos], np.int64)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(hashes, w)
    idx = win.argmin(axis=1) + np.arange(win.shape[0])
    sel = np.unique(idx)
    return hashes[sel], sel


def fingerprint_stage(
    docs: ray.data.Dataset,
    *,
    window: int = 50,
    winnow_w: int = 16,
    batch_size: int = 512,
) -> ray.data.Dataset:
    """docs -> (band_idx=0, band_hash=fingerprint, doc_id) rows."""

    def fp(t: pa.Table) -> pa.Table:
        ids, fps = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            f, _ = winnow(rolling_window_hashes(text, window), winnow_w)
            fps.append(f)
            ids.append(np.full(f.shape[0], did, np.int64))
        flat = (
            np.concatenate(fps) if fps else np.empty(0, np.uint64)
        )
        return pa.table(
            {
                "band_idx": pa.array(
                    np.zeros(flat.shape[0], np.int16)
                ),
                "band_hash": pa.array(
                    (flat & np.uint64(MASK63)).astype(np.int64)
                ),
                "doc_id": pa.array(
                    np.concatenate(ids) if ids else np.empty(0, np.int64)
                ),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def substring_dup_pairs(
    docs: ray.data.Dataset,
    *,
    window: int = 50,
    winnow_w: int = 16,
    min_shared: int = 2,
    cfg: DedupConfig | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Pairs of docs sharing a verbatim substring of >= window+winnow_w-1
    bytes (verified), with the shared-window count as an overlap score.

    Verification is pair-scale: texts of candidate-pair docs are gathered
    once (broadcast) and each pair's window-hash sets intersected; one
    matching offset pair is byte-compared, eliminating hash-collision
    false positives.
    """
    from nlshray.stages.pairs import candidate_pairs_stage
    from nlshray.stages.verify import collect_pair_ids

    cfg = cfg or DedupConfig()
    bands = fingerprint_stage(docs, window=window, winnow_w=winnow_w)
    cand, _stats = candidate_pairs_stage(
        bands, cfg, num_partitions=num_partitions
    )
    cand = cand.materialize()
    pair_ids = collect_pair_ids(cand)

    texts, whashes = gather_pair_texts_and_hashes(
        docs, pair_ids, window=window
    )
    gathered_ref = ray.put((texts, whashes))

    def verify(t: pa.Table) -> pa.Table:
        tx, wh = ray.get(gathered_ref)
        return _decide_pairs(
            t, tx, wh, window=window, min_shared=min_shared
        )

    return cand.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )


def gather_pair_texts_and_hashes(
    docs: ray.data.Dataset, pair_ids: np.ndarray, *, window: int
) -> tuple[dict[int, str], dict[int, np.ndarray]]:
    """ONE scan: text + rolling window hashes of every pair doc.

    Hashing runs in the workers during the gather, so each doc is
    hashed exactly once no matter how many pairs it appears in — the
    decision map below does pure dict lookups (VERDICT r2 #5: the old
    verify recomputed ``rolling_window_hashes`` per PAIR, so a doc in
    p pairs was hashed p times)."""
    from nlshray.stages.verify import _membership

    ids_ref = ray.put(np.sort(pair_ids))

    def prep(t: pa.Table) -> pa.Table:
        keys = ray.get(ids_ref)
        sub = t.filter(pa.array(_membership(keys, t["doc_id"].to_numpy())))
        hashes = [
            rolling_window_hashes(tx, window).tolist()
            for tx in sub["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "text": sub["text"],
                "whash": pa.array(hashes, pa.list_(pa.uint64())),
            }
        )

    texts: dict[int, str] = {}
    whashes: dict[int, np.ndarray] = {}
    for b in docs.select_columns(["doc_id", "text"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=8192, batch_format="pyarrow"):
        d = np.asarray(b["doc_id"])
        col = b["whash"].combine_chunks()
        offs = np.asarray(col.offsets)
        vals = np.asarray(col.values, dtype=np.uint64)
        txl = b["text"].to_pylist()
        for i in range(len(d)):
            texts[int(d[i])] = txl[i]
            whashes[int(d[i])] = vals[offs[i] : offs[i + 1]]
    return texts, whashes


def _decide_pairs(
    t: pa.Table,
    texts: dict[int, str],
    whashes: dict[int, np.ndarray],
    *,
    window: int,
    min_shared: int,
) -> pa.Table:
    """Pair decision over PRE-computed window hashes (no rehash here)."""
    lefts = t["left_id"].to_pylist()
    rights = t["right_id"].to_pylist()
    n_shared, match_len = [], []
    for l, r in zip(lefts, rights):
        hl, hr = whashes[l], whashes[r]
        common, li, ri = np.intersect1d(hl, hr, return_indices=True)
        confirmed = 0
        # byte-compare up to the first 3 shared offsets: a single
        # colliding window hash must not reject a pair whose other
        # shared windows are genuine matches
        lb, rb = texts[l].encode("utf-8"), texts[r].encode("utf-8")
        for ci in range(min(3, common.shape[0])):
            if lb[li[ci] : li[ci] + window] == rb[ri[ci] : ri[ci] + window]:
                confirmed = window
                break
        n_shared.append(int(common.shape[0]))
        match_len.append(confirmed)
    out = pa.table(
        {
            "left_id": t["left_id"],
            "right_id": t["right_id"],
            "n_shared_windows": pa.array(n_shared, pa.int64()),
            "match_len_checked": pa.array(match_len, pa.int64()),
        }
    )
    keep = (np.array(n_shared) >= min_shared) & (np.array(match_len) > 0)
    return out.filter(pa.array(keep))
