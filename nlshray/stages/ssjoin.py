"""Prefix-filtered EXACT set-similarity self-join (AllPairs family).

Public-literature basis: Bayardo/Ma/Srikant, WWW 2007 ("Scaling Up All
Pairs Similarity Search") for the prefix filter, and Vernica/Carey/Li,
SIGMOD 2010 for the token-grouped distributed plan this stage
re-expresses over Ray tasks. It is the exact, shuffle-based scale path
for a Jaccard-threshold join: unlike MinHash+LSH (`pipelines/dedup`),
which is probabilistic and needs a verify pass, every pair with
``J >= t`` is emitted with its exact score and nothing else — and
unlike the broadcast-corpus brute member (``ngram_jaccard_pairs``),
nothing corpus-sized is ever resident on one node: the only data that
shuffles is each doc's PREFIX (its ``|x| - ceil(t|x|) + 1`` rarest
tokens — ~11% of tokens at t=0.9) as index rows, plus the doc's full
rank set shipped once per (block, partition) it has a prefix token in.

Why the prefix filter is lossless: order every token set by one global
total order and keep each doc's first ``p = |x| - ceil(t|x|) + 1``
tokens. If ``J(A,B) >= t`` and the smallest common token ``w0 =
min(A ∩ B)`` were OUTSIDE A's prefix, then A has >= p non-shared
tokens before it, so ``|A ∩ B| <= ceil(t|A|) - 1 < t|A| <= t·|A ∪ B|``
— contradiction. Hence ``w0`` is in BOTH prefixes, the pair meets in
``w0``'s token group, and emitting a pair ONLY in its ``w0`` group
makes the cross-partition dedup structural (no third shuffle round —
``stages/pairs.py`` needs its round C only because LSH bands have no
per-pair canonical owner).

Plan (same raw-task-round idiom as ``stages/pairs._pairs_task_shuffle``):
  prep  — map_batches: tokenize, per-doc unique, map to canonical
          ranks, per-doc sort (all segmented-vectorized).
  A     — one task per block: prefix positions -> P hash partitions;
          each partition receives (token, local-doc) index rows and
          the involved docs' (id, size, full rank set) once.
  B     — one task per partition: sort index rows by token, walk token
          groups, length-filter (``|B| >= t|A|``), exact
          sorted-intersection verify, emit where the group token is
          the pair's smallest common token.

Canonical order: ascending corpus document-frequency (the AllPairs
ordering — rare tokens first minimizes group sizes), from one
vocab-sized counting pass whose (sorted token hash -> rank) table is
broadcast with ``ray.put``. ``ordering="hash"`` skips that pass and
orders by the 63-bit token hash itself: identical output (any
consistent total order is correct), larger candidate groups — the
fallback when the vocabulary is too large to broadcast.

Skew note: with frequency ordering the hottest token group is bounded
by the docs whose PREFIX reaches into the frequent tail — short docs.
A corpus of millions of near-identical two-token docs would still pile
into one group; the LSH plan with its group caps + forgone accounting
(`stages/pairs.py`) is the right tool there, and this stage is its
exact-recall complement, not a replacement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from nlshray.functions.nputil import lexsort2, segment_ids, segmented_arange
from nlshray.functions.shingles import batch_token_hashes

_MASK63 = np.uint64((1 << 63) - 1)


# ---------------------------------------------------------------------------
# canonical token order
# ---------------------------------------------------------------------------

def token_doc_freq(
    docs: rd.Dataset, text_col: str = "text", num_partitions: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique token hashes, document frequency) for the corpus.

    One combiner-style pass: each block emits its per-doc-deduped
    token counts, a vocab-bounded groupby sums them. The result is
    vocabulary-sized — collected once to build the rank table (see
    module docstring for the ``ordering="hash"`` escape hatch when
    that is too large).
    """

    from functools import partial as fpartial

    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        int64_key_hash,
    )

    refs = docs.select_columns([text_col]).to_arrow_refs()
    if not refs:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    shards = [
        s
        for s in ray.get(
            hash_exchange(
                refs,
                fpartial(_tdf_partial, text_col=text_col),
                int64_key_hash("tok"),
                grouped_sum_merge("tok", ["n"]),
                num_partitions,
            )
        )
        if len(s)
    ]
    if not shards:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    merged = pa.concat_tables(shards)
    toks = merged["tok"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n = merged["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(toks)
    return toks[order], n[order]


def _tdf_partial(t: pa.Table, text_col: str) -> pa.Table:
    """One block's per-doc-deduped (tok_hash, df) partial."""
    flat, counts = batch_token_hashes(t[text_col])
    if flat.shape[0] == 0:
        return pa.table(
            {
                "tok": pa.array([], pa.uint64()),
                "n": pa.array([], pa.int64()),
            }
        )
    doc_idx = segment_ids(counts)
    order = lexsort2(flat.astype(np.int64), doc_idx)
    d_s, f_s = doc_idx[order], flat[order]
    first = np.empty(f_s.shape[0], dtype=bool)
    first[0] = True
    first[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    toks, n = np.unique(f_s[first], return_counts=True)
    return pa.table(
        {
            "tok": pa.array(toks, pa.uint64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }
    )


def _rank_table(toks_sorted: np.ndarray, freq: np.ndarray) -> np.ndarray:
    """rank aligned to ``toks_sorted``: ascending (freq, token hash)."""
    order = lexsort2(toks_sorted.astype(np.int64), freq)
    rank = np.empty(toks_sorted.shape[0], dtype=np.int64)
    rank[order] = np.arange(toks_sorted.shape[0], dtype=np.int64)
    return rank


# ---------------------------------------------------------------------------
# prep: per-doc sorted rank sets
# ---------------------------------------------------------------------------

def _rank_sets_fn(id_col: str, text_col: str, rank_ref):
    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts = batch_token_hashes(t[text_col])
        if flat.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "rks": pa.array(
                        [[] for _ in range(ids.shape[0])],
                        pa.list_(pa.int64()),
                    ),
                }
            )
        doc_idx = segment_ids(counts)
        order = lexsort2(flat.astype(np.int64), doc_idx)
        d_s, f_s = doc_idx[order], flat[order]
        first = np.empty(f_s.shape[0], dtype=bool)
        first[0] = True
        first[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
        d_u, f_u = d_s[first], f_s[first]
        if rank_ref is None:
            rks = (f_u & _MASK63).astype(np.int64)
        else:
            toks_sorted, rank = ray.get(rank_ref)
            rks = rank[np.searchsorted(toks_sorted, f_u)]
        order2 = lexsort2(rks, d_u)
        d_2, r_2 = d_u[order2], rks[order2]
        sizes = np.bincount(d_2, minlength=ids.shape[0]).astype(np.int64)
        offsets = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(sizes, dtype=np.int64)]
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "rks": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(r_2, pa.int64())
                ),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# round A: prefix -> partitions
# ---------------------------------------------------------------------------

def _empty_shard():
    e = np.empty(0, np.int64)
    return (e, e, e, e, np.zeros(1, np.int64), e)


@ray.remote
def _ssjoin_shard(block: pa.Table, id_col: str, thr: float, P: int):
    """(tok, local_doc, ids, sizes, set_offsets, set_values) per part."""
    if block.num_rows == 0 or id_col not in block.column_names:
        out = [_empty_shard()] * P
        return out[0] if P == 1 else tuple(out)
    ids = block[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    col = block["rks"].combine_chunks()
    vals = np.asarray(col.values, dtype=np.int64)
    off = np.asarray(col.offsets, dtype=np.int64)
    sizes = np.diff(off)
    plen = sizes - np.ceil(thr * sizes).astype(np.int64) + 1
    plen = np.clip(plen, 0, sizes)
    pos = segmented_arange(off[:-1], plen)
    tok = vals[pos]
    pdoc = segment_ids(plen)
    part = tok % P
    order = lexsort2(tok, part)
    tok_s, pdoc_s, part_s = tok[order], pdoc[order], part[order]
    cuts = np.searchsorted(part_s, np.arange(1, P))
    out = []
    for p, (t_p, d_p) in enumerate(
        zip(np.split(tok_s, cuts), np.split(pdoc_s, cuts))
    ):
        if t_p.shape[0] == 0:
            out.append(_empty_shard())
            continue
        docs_p = np.unique(d_p)
        local = np.searchsorted(docs_p, d_p)
        seg_idx = segmented_arange(off[docs_p], sizes[docs_p])
        off_p = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(sizes[docs_p], dtype=np.int64)]
        )
        out.append(
            (t_p, local, ids[docs_p], sizes[docs_p], off_p, vals[seg_idx])
        )
    return out[0] if P == 1 else tuple(out)


# ---------------------------------------------------------------------------
# round B: token groups -> verified pairs
# ---------------------------------------------------------------------------

@ray.remote
def _ssjoin_verify_part(thr: float, nd: int, *chunks) -> pa.Table:
    tok_c, doc_c, ids_c, sz_c, val_c = [], [], [], [], []
    base = 0
    for t_p, local, ids_p, sizes_p, off_p, vals_p in chunks:
        tok_c.append(t_p)
        doc_c.append(local + base)
        ids_c.append(ids_p)
        sz_c.append(sizes_p)
        val_c.append(vals_p)
        base += ids_p.shape[0]
    tok = np.concatenate(tok_c)
    doc = np.concatenate(doc_c)
    ids = np.concatenate(ids_c)
    sizes = np.concatenate(sz_c)
    starts = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(sizes, dtype=np.int64)]
    )
    flat = np.concatenate(val_c) if val_c else np.empty(0, np.int64)

    empty = pa.table(
        {
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if tok.shape[0] == 0:
        return empty

    order = lexsort2(doc, tok)
    tok_s, doc_s = tok[order], doc[order]
    bounds = np.flatnonzero(
        np.concatenate([[True], tok_s[1:] != tok_s[:-1], [True]])
    )
    lefts, rights, jacs = [], [], []
    p = 10.0**nd
    for gi in range(bounds.shape[0] - 1):
        lo, hi = bounds[gi], bounds[gi + 1]
        g = hi - lo
        if g < 2:
            continue
        w0 = tok_s[lo]
        members = doc_s[lo:hi]
        for i in range(g - 1):
            a = members[i]
            sa = sizes[a]
            av = flat[starts[a] : starts[a] + sa]
            for j in range(i + 1, g):
                b = members[j]
                sb = sizes[b]
                lo_s, hi_s = (sa, sb) if sa <= sb else (sb, sa)
                if lo_s < thr * hi_s:
                    continue  # length filter: J <= min/max < t
                bv = flat[starts[b] : starts[b] + sb]
                inter = np.intersect1d(av, bv, assume_unique=True)
                ni = inter.shape[0]
                if ni == 0 or inter[0] != w0:
                    continue  # not this pair's owner group
                jac = ni / (sa + sb - ni)
                if jac >= thr:
                    la, lb = ids[a], ids[b]
                    lefts.append(min(la, lb))
                    rights.append(max(la, lb))
                    jacs.append(np.round(jac * p) / p)
    return pa.table(
        {
            "left_id": pa.array(np.array(lefts, np.int64)),
            "right_id": pa.array(np.array(rights, np.int64)),
            "jaccard": pa.array(np.array(jacs, np.float64)),
        }
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def ssjoin_jaccard(
    docs: rd.Dataset,
    threshold: float = 0.9,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ordering: str = "freq",
    num_partitions: int = 8,
    round_nd: int = 6,
) -> rd.Dataset:
    """All doc pairs with exact token-set Jaccard >= ``threshold``.

    Output: (left_id, right_id, jaccard[round_nd]), left < right, each
    qualifying pair exactly once. See module docstring for the plan.
    """
    rank_ref = None
    if ordering == "freq":
        toks_sorted, freq = token_doc_freq(
            docs, text_col=text_col, num_partitions=num_partitions
        )
        rank_ref = ray.put((toks_sorted, _rank_table(toks_sorted, freq)))
    elif ordering != "hash":
        raise ValueError(f"unknown ordering: {ordering!r}")

    prep = docs.map_batches(
        _rank_sets_fn(id_col, text_col, rank_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    refs = prep.to_arrow_refs()
    P = max(1, num_partitions)
    thr = float(threshold)
    a_out = [
        _ssjoin_shard.options(num_returns=P).remote(r, id_col, thr, P)
        for r in refs
    ]
    if P == 1:
        a_out = [[r] for r in a_out]
    b_refs = [
        _ssjoin_verify_part.remote(
            thr, round_nd, *[a_out[b][p] for b in range(len(a_out))]
        )
        for p in range(P)
    ]
    return rd.from_arrow_refs(b_refs)
