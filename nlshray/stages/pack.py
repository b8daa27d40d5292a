"""Sequence packing: assign every document a global token offset and the
training-sequence range it lands in.

The last step of a pre-training data pipeline: the deduped corpus is
tokenized, concatenated in a canonical order (here: ``doc_id``), and cut
into fixed-length sequences; each doc needs to know its global token
``start_tok`` and the ``[first_seq, last_seq]`` window it occupies (docs
straddle sequence boundaries — packing splits, it does not pad). The
reference's batched indexer walks its corpus in fixed batch strides
(``/root/reference/nlsh/indexer.py:36-44``); this is the distributed
analog where the stride becomes a global prefix sum.

Plan (two bounded steps, the corpus text is NEVER shuffled):

1. one streaming ``map_batches`` pass reduces each doc to 16 bytes
   (``doc_id, n_tokens``) and each doc to a coarse ``chunk = doc_id //
   chunk_size`` key; per-chunk token totals are combiner-aggregated and
   prefix-summed on the driver (``n_docs / chunk_size`` entries — at
   10^12 docs and chunk_size 2^20 that is ~10^6 rows, a broadcastable
   array);
2. one ``groupby(chunk).map_groups`` over the 16-byte rows computes each
   doc's within-chunk exclusive cumsum and adds the broadcast chunk
   base — the only shuffle in the plan moves ids+counts, not text.

Determinism: output is a pure function of (doc_id, n_tokens), identical
at any parallelism — SQL-oracle-replayable with one window cumsum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def pack_sequences(
    docs: rd.Dataset,
    seq_len: int = 512,
    chunk_size: int = 128,
    text_col: str = "text",
) -> rd.Dataset:
    """Emit ``doc_id, n_tokens, start_tok, first_seq, last_seq, n_seqs``
    for packing docs (in ``doc_id`` order) into ``seq_len``-token
    sequences. ``n_tokens`` counts whitespace tokens (``\\S+`` runs,
    the ``token_counts`` definition)."""

    def counts(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = (
            pc.count_substring_regex(arr, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        did = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n),
                "chunk": pa.array(did // chunk_size),
            }
        )

    # 16-byte rows; materialized because both passes consume it (at real
    # scale this is the bounded `counts.parquet` checkpoint, ~16 TB per
    # 10^12 docs vs the corpus' ~100 TB of text)
    cnt = docs.map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # pass 1: per-chunk totals -> driver prefix sum (combiner pattern:
    # each batch pre-aggregates, the driver sees blocks x chunks rows)
    def chunk_partials(t: pa.Table) -> pa.Table:
        ch = t["chunk"].to_numpy()
        n = t["n_tokens"].to_numpy()
        u, inv = np.unique(ch, return_inverse=True)
        s = np.zeros(u.shape[0], np.int64)
        np.add.at(s, inv, n)
        return pa.table({"chunk": pa.array(u), "tok": pa.array(s)})

    parts = cnt.map_batches(
        chunk_partials, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    chunks = np.array([r["chunk"] for r in parts], dtype=np.int64)
    toks = np.array([r["tok"] for r in parts], dtype=np.int64)
    u, inv = np.unique(chunks, return_inverse=True)
    totals = np.zeros(u.shape[0], np.int64)
    np.add.at(totals, inv, toks)
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])
    base_ref = ray.put((u, bases))

    # pass 2: within-chunk exclusive cumsum + broadcast base
    def assign(t: pa.Table) -> pa.Table:
        cu, cb = ray.get(base_ref)
        did = t["doc_id"].to_numpy()
        n = t["n_tokens"].to_numpy()
        order = np.argsort(did, kind="stable")
        start = np.empty(n.shape[0], np.int64)
        ns = n[order]
        start[order] = np.cumsum(ns) - ns
        ch = int(t["chunk"][0].as_py())
        start += cb[np.searchsorted(cu, ch)]
        first = start // seq_len
        last = np.where(n > 0, (start + np.maximum(n, 1) - 1) // seq_len, first)
        n_seqs = np.where(n > 0, last - first + 1, 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "start_tok": pa.array(start),
                "first_seq": pa.array(first),
                "last_seq": pa.array(last),
                "n_seqs": pa.array(n_seqs),
            }
        )

    return cnt.groupby("chunk").map_groups(assign, batch_format="pyarrow")
