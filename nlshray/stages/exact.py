"""Exact-duplicate pre-pass (SURVEY.md §7.3: 'cheap kill of identical
pages before LSH').

Semantics: group docs by a 63-bit content hash of ``text``; the group
representative is the member with the minimum ``doc_id`` (canonical,
order-free — SURVEY.md §7.4.2). Only representatives flow into the
MinHash stage; every doc keeps a ``rep_id`` edge so exact dups rejoin
their representative's cluster at the end.

This is also the primary skew defense: boilerplate pages that would
collapse into one giant LSH bucket (the fixture's 5% skew probe) are
collapsed to a single representative *before* any banding.

Physical plan (two, size-selected): group discovery over the projected
(text_hash, doc_id) columns is either
* a driver merge of vectorized per-batch partials (zero shuffles,
  bounded corpora), or
* a global SORT + per-block duplicate-run detection with pre-aggregated
  interior runs and driver-stitched block-boundary runs (the scale
  plan; Ray's groupby-aggregate is pathological on near-unique keys —
  see stages/pairs.py).
Either way the duplicated-group map (dup groups only — small by nature)
is broadcast and ``rep_id`` attached per batch; the full text never
enters a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from nlshray.functions.nputil import lookup_sorted
from nlshray.hashing import MASK63



def _add_text_hash(batch: pa.Table) -> pa.Table:
    """Vectorized 63-bit content hash of the text column (polynomial
    byte fold — ``nlshray.hashing.hash_utf8_array``; no per-row python).

    Two hashes per doc: ``text_hash`` (the group key) and ``text_hash2``
    (an independent-multiplier verification hash). A poly-fold collision
    is fold-structural — it survives any finalizer seed — so equal-key
    docs are only declared exact duplicates when BOTH hashes agree
    (~2^-126 residual; a bare 63-bit non-universal key could silently
    collapse non-duplicates)."""
    from nlshray.hashing import _POLY2, hash_utf8_array

    hashes = (
        hash_utf8_array(batch["text"], seed=0x7E47) & np.uint64(MASK63)
    ).astype(np.int64)
    hashes2 = (
        hash_utf8_array(batch["text"], seed=0x7E48, mult=_POLY2)
        & np.uint64(MASK63)
    ).astype(np.int64)
    return batch.append_column(
        "text_hash", pa.array(hashes, pa.int64())
    ).append_column("text_hash2", pa.array(hashes2, pa.int64()))


def _attach_rep(batch: pa.Table, *, map_ref) -> pa.Table:
    keys, reps, copies, rep_h2 = ray.get(map_ref)
    th = batch["text_hash"].to_numpy()
    own = batch["doc_id"].to_numpy()
    own_h2 = batch["text_hash2"].to_numpy()
    rep = lookup_sorted(keys, reps, th, own)
    n_copies = lookup_sorted(keys, copies, th, np.ones_like(th))
    # verification: a doc joins a group only when its SECOND hash matches
    # the representative's — a text_hash-only collision degrades to an
    # un-merged singleton (recall loss, never a wrong merge). default is
    # own_h2 so non-group rows trivially match.
    grp_h2 = lookup_sorted(keys, rep_h2, th, own_h2)
    mismatch = grp_h2 != own_h2
    rep = np.where(mismatch, own, rep)
    n_copies = np.where(mismatch, np.int64(1), n_copies)
    return batch.append_column("rep_id", pa.array(rep, pa.int64())).append_column(
        "n_copies", pa.array(n_copies, pa.int64())
    )


def _group_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: (text_hash, min doc_id, its text_hash2, count)
    per distinct hash — the 'pre-aggregate inside map_batches' pattern;
    the final combine happens on the driver when bounded, in a groupby
    shuffle otherwise."""
    th = batch["text_hash"].to_numpy()
    h2 = batch["text_hash2"].to_numpy()
    ids = batch["doc_id"].to_numpy()
    order = np.lexsort((ids, th))
    th_s, ids_s, h2_s = th[order], ids[order], h2[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(np.diff(th_s)) + 1]
    ) if th_s.shape[0] else np.empty(0, np.int64)
    counts = np.diff(np.concatenate([starts, [th_s.shape[0]]]))
    return pa.table(
        {
            "text_hash": pa.array(th_s[starts]),
            "rep_id": pa.array(ids_s[starts]),   # min doc per hash (sorted)
            "rep_h2": pa.array(h2_s[starts]),    # verification hash of that doc
            "n_copies": pa.array(counts.astype(np.int64)),
        }
    )


@ray.remote
def _group_partial_block(block: pa.Table) -> pa.Table:
    return _group_partial(
        block.select(["text_hash", "text_hash2", "doc_id"])
    )


def exact_stage(
    docs: ray.data.Dataset,
    *,
    num_partitions: int = 32,
    driver_merge_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """docs -> docs + (text_hash, rep_id, n_copies).

    ``rep_id`` = min doc_id among rows with identical text;
    ``n_copies`` = exact-dup group size.

    Group discovery is a driver merge of per-batch partials while the
    corpus is bounded (zero shuffles), else a groupby-aggregate shuffle.
    """
    docs_h = docs.map_batches(
        _add_text_hash, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if driver_merge_limit > 0 and docs_h.count() <= driver_merge_limit:
        # per-block partials via raw Ray tasks over the materialized
        # blocks — distributed pre-aggregation with no extra streaming
        # execution (the blocks are already pinned in the object store)
        partials = ray.get(
            [_group_partial_block.remote(r) for r in docs_h.to_arrow_refs()]
        )
        th_c, rep_c, cop_c, h2_c = [], [], [], []
        for b in partials:
            th_c.append(np.asarray(b["text_hash"]))
            rep_c.append(np.asarray(b["rep_id"]))
            cop_c.append(np.asarray(b["n_copies"]))
            h2_c.append(np.asarray(b["rep_h2"]))
        th = np.concatenate(th_c) if th_c else np.empty(0, np.int64)
        rep = np.concatenate(rep_c) if rep_c else np.empty(0, np.int64)
        cop = np.concatenate(cop_c) if cop_c else np.empty(0, np.int64)
        h2 = np.concatenate(h2_c) if h2_c else np.empty(0, np.int64)
        order = np.lexsort((rep, th))
        th, rep, cop, h2 = th[order], rep[order], cop[order], h2[order]
        starts = (
            np.concatenate([[0], np.flatnonzero(np.diff(th)) + 1])
            if th.shape[0]
            else np.empty(0, np.int64)
        )
        tot = np.add.reduceat(cop, starts) if th.shape[0] else cop
        # first row per hash = global-min rep (sorted by rep within th);
        # its verification hash rides along, aligned
        th_u, rep_u, h2_u = th[starts], rep[starts], h2[starts]
        dup = tot >= 2
        map_ref = ray.put((th_u[dup], rep_u[dup], tot[dup], h2_u[dup]))
        return docs_h.map_batches(
            _attach_rep,
            fn_kwargs={"map_ref": map_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # distributed group discovery: SORT the (text_hash, doc_id)
    # projection and detect duplicate runs per block (runs touching a
    # block edge are stitched on the driver). A groupby-aggregate here is
    # pathological in Ray when nearly all keys are distinct (same
    # finding as stages/pairs.py: ~70s for ~10M near-unique groups vs
    # ~2s for the sort).
    sorted_h = docs_h.select_columns(
        ["text_hash", "text_hash2", "doc_id"]
    ).sort("text_hash")

    def dup_runs(block: pa.Table) -> pa.Table:
        """Per block: every equal-hash run pre-aggregates to one
        (hash, min_id, count) row. Interior singleton runs are dropped
        (they cannot span blocks after the global sort); first/last runs
        ship even as singletons because they may continue in a neighbor
        block — but ALWAYS as one aggregated row, so driver traffic is
        O(1) per block edge even when a hot hash fills whole blocks
        (VERDICT r1 #4: raw boundary shipping broke exactly under the
        skew this stage exists to handle)."""
        empty = pa.table(
            {
                "text_hash": pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
                "rep_h2": pa.array([], pa.int64()),
                "n_copies": pa.array([], pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        # re-sort within the block by (text_hash, doc_id) so the first
        # row of each run is the min-id doc AND its verification hash
        # rides along aligned
        th0 = block["text_hash"].to_numpy()
        ids0 = block["doc_id"].to_numpy()
        h20 = block["text_hash2"].to_numpy()
        order = np.lexsort((ids0, th0))
        th, ids, h2 = th0[order], ids0[order], h20[order]
        n = th.shape[0]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(th)) + 1, [n]])
        lens = np.diff(starts)
        keep = lens >= 2
        keep[0] = True
        keep[-1] = True
        if not keep.any():
            return empty
        return pa.table(
            {
                "text_hash": pa.array(th[starts[:-1]][keep]),
                "rep_id": pa.array(ids[starts[:-1]][keep]),
                "rep_h2": pa.array(h2[starts[:-1]][keep]),
                "n_copies": pa.array(lens[keep].astype(np.int64)),
            }
        )

    th_c, rep_c, cnt_c, h2_c = [], [], [], []
    for b in sorted_h.map_batches(
        dup_runs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        th_c.append(np.asarray(b["text_hash"]))
        rep_c.append(np.asarray(b["rep_id"]))
        cnt_c.append(np.asarray(b["n_copies"]))
        h2_c.append(np.asarray(b["rep_h2"]))
    th = np.concatenate(th_c) if th_c else np.empty(0, np.int64)
    rep = np.concatenate(rep_c) if rep_c else np.empty(0, np.int64)
    eff = np.concatenate(cnt_c) if cnt_c else np.empty(0, np.int64)
    h2 = np.concatenate(h2_c) if h2_c else np.empty(0, np.int64)
    order = np.lexsort((rep, th))
    th, rep, eff, h2 = th[order], rep[order], eff[order], h2[order]
    starts = (
        np.concatenate([[0], np.flatnonzero(np.diff(th)) + 1])
        if th.shape[0]
        else np.empty(0, np.int64)
    )
    tot = np.add.reduceat(eff, starts) if th.shape[0] else eff
    th_u, rep_u, h2_u = th[starts], rep[starts], h2[starts]  # min rep per hash
    dup = tot >= 2
    map_ref = ray.put(
        (th_u[dup], rep_u[dup], tot[dup].astype(np.int64), h2_u[dup])
    )
    return docs_h.map_batches(
        _attach_rep,
        fn_kwargs={"map_ref": map_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def reps_only(docs_rep: ray.data.Dataset) -> ray.data.Dataset:
    """Representative rows only (doc_id == rep_id)."""
    return docs_rep.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["rep_id"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def exact_map(docs_rep: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, rep_id) for every doc — the exact-dup edge list."""
    return docs_rep.select_columns(["doc_id", "rep_id"])
