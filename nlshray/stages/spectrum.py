"""Token frequency spectrum: frequency-of-frequencies corpus report.

The Zipf/Heaps-law view a corpus analyst (or tokenizer trainer) asks
for first: for each occurrence count c, how many distinct tokens occur
exactly c times. Hapax fraction (c=1) predicts vocabulary growth;
the spectrum tail shows whether a BPE vocab budget is spent on
boilerplate.

Plan — the decisive property is that the FULL token->count table is
never collected anywhere, because the spectrum only needs counts:

1. Round A (raw tasks over doc block refs, same plan shape as
   ``stages/lm.fit_bigram_counts``): tokenize + hash each block
   (strings never leave the block — the same 64-bit-hash argument
   ``repetition_stats`` documents: a collision would merge two tokens
   and fail the string-space SQL oracle), run-length-count the sorted
   hashes, shard partials by ``h % P``.
2. Round B: each partition merges its (h, c) partials with one numpy
   sort + ``reduceat`` — at this point it holds exact global counts
   for ITS tokens — and immediately collapses them to a partial
   spectrum ``(c, n_tokens)``: bounded by the distinct COUNT VALUES
   in the partition (hundreds), not the vocabulary.
3. Driver: sum the P tiny spectra.

Shuffle volume is O(distinct tokens) int64 pairs; driver traffic is
O(distinct count values). At 100 TB both bounds hold: the open
vocabulary stays distributed, only the spectrum converges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.hashing import hash_utf8_array
from nlshray.stages.lm import _block_token_stream


def _run_length(sorted_vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    starts = np.flatnonzero(
        np.r_[True, sorted_vals[1:] != sorted_vals[:-1]]
    )
    return sorted_vals[starts], np.diff(
        np.r_[starts, sorted_vals.size]
    ).astype(np.int64)


@ray.remote
def _spec_shard(block: pa.Table, text_col: str, seed: int, P: int):
    """Round A: (token_hash, count) partials sharded by hash % P."""
    flat, _ = _block_token_stream(block, text_col)
    if len(flat) == 0:
        e = np.empty(0, np.uint64)
        out = [(e, np.empty(0, np.int64))] * P
        return out[0] if P == 1 else tuple(out)
    h = np.sort(hash_utf8_array(flat, seed=seed))
    uh, c = _run_length(h)
    part = (uh % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(1, P))
    out = list(zip(np.split(uh[order], cuts), np.split(c[order], cuts)))
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _spec_merge(*chunks) -> pa.Table:
    """Round B: exact global counts for this partition's tokens ->
    partial spectrum (occur_count, n_tokens)."""
    if not chunks:
        return pa.table(
            {
                "occur_count": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    h = np.concatenate([c[0] for c in chunks])
    n = np.concatenate([c[1] for c in chunks])
    if h.size == 0:
        return pa.table(
            {
                "occur_count": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    order = np.argsort(h, kind="stable")
    uh, starts = np.unique(h[order], return_index=True)
    totals = np.add.reduceat(n[order], starts)
    occ, freq = np.unique(totals, return_counts=True)
    return pa.table(
        {
            "occur_count": pa.array(occ.astype(np.int64)),
            "n_tokens": pa.array(freq.astype(np.int64)),
        }
    )


def token_frequency_spectrum(
    docs: ray.data.Dataset,
    text_col: str = "text",
    seed: int = 0,
    num_partitions: int = 8,
) -> pa.Table:
    """(occur_count, n_tokens) sorted by occur_count — see module
    docstring for the plan."""
    P = max(1, num_partitions)
    refs = docs.select_columns([text_col]).to_arrow_refs()
    if not refs:
        return pa.table(
            {
                "occur_count": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    a_out = [
        _spec_shard.options(num_returns=P).remote(r, text_col, seed, P)
        for r in refs
    ]
    if P == 1:
        a_out = [[r] for r in a_out]
    parts = ray.get(
        [
            _spec_merge.remote(*[a_out[b][p] for b in range(len(a_out))])
            for p in range(P)
        ]
    )
    merged = pa.concat_tables(parts)
    occ = merged["occur_count"].to_numpy(zero_copy_only=False)
    cnt = merged["n_tokens"].to_numpy(zero_copy_only=False)
    uo, starts = np.unique(np.sort(occ), return_index=True)
    order = np.argsort(occ, kind="stable")
    sums = np.add.reduceat(cnt[order], starts)
    return pa.table(
        {
            "occur_count": pa.array(uo.astype(np.int64)),
            "n_tokens": pa.array(sums.astype(np.int64)),
        }
    )
