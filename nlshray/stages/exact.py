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
* a driver merge of vectorized per-block partials computed by raw Ray
  tasks (zero shuffles, bounded corpora), or
* a manual two-round task shuffle: per-block partials split by
  ``text_hash % P``, then P merge tasks that each see every row of
  their hashes and return only duplicated groups (the scale plan;
  Ray's groupby-aggregate is pathological on near-unique keys — see
  stages/pairs.py).
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

from nlshray.functions.nputil import lexsort2, lookup_sorted
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
    order = lexsort2(ids, th)
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


_EMPTY_PARTIAL = pa.table(
    {
        "text_hash": pa.array([], pa.int64()),
        "rep_id": pa.array([], pa.int64()),
        "rep_h2": pa.array([], pa.int64()),
        "n_copies": pa.array([], pa.int64()),
    }
)


@ray.remote
def _group_partial_block(block: pa.Table) -> pa.Table:
    if block.num_rows == 0:
        # zero-row blocks pass through map_batches unmapped (no
        # text_hash columns) — same guard as the old sort path
        return _EMPTY_PARTIAL
    return _group_partial(
        block.select(["text_hash", "text_hash2", "doc_id"])
    )


@ray.remote
def _shard_partials(block: pa.Table, P: int):
    """Round A of the distributed group discovery: this block's
    (text_hash, min id, h2, count) partials split by text_hash % P."""
    if block.num_rows == 0:
        e = np.empty(0, np.int64)
        out = [(e, e, e, e)] * P
        return out[0] if P == 1 else tuple(out)
    t = _group_partial(block.select(["text_hash", "text_hash2", "doc_id"]))
    th = t["text_hash"].to_numpy()
    part = (th % P).astype(np.int64)  # 63-bit hashes: non-negative
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(1, P))
    cols = [
        np.split(t[c].to_numpy()[order], cuts)
        for c in ("text_hash", "rep_id", "rep_h2", "n_copies")
    ]
    out = [tuple(col[p] for col in cols) for p in range(P)]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _merge_dup_groups(*parts):
    """Round B: merge one hash partition's partials; every row of a
    given text_hash is in this partition, so summing counts here is the
    exact global group size. Only duplicated groups return."""
    th = np.concatenate([p[0] for p in parts])
    rep = np.concatenate([p[1] for p in parts])
    h2 = np.concatenate([p[2] for p in parts])
    eff = np.concatenate([p[3] for p in parts])
    if th.shape[0] == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e
    order = lexsort2(rep, th)
    th, rep, h2, eff = th[order], rep[order], h2[order], eff[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(th)) + 1])
    tot = np.add.reduceat(eff, starts)
    dup = tot >= 2
    # first row per hash = global-min rep (sorted by rep within hash);
    # its verification hash rides along, aligned
    return (
        th[starts][dup],
        rep[starts][dup],
        tot[dup].astype(np.int64),
        h2[starts][dup],
    )


def exact_stage(
    docs: ray.data.Dataset,
    *,
    num_partitions: int = 32,
    driver_merge_limit: int = 5_000_000,
    with_hashed: bool = False,
    store_dir: str | None = None,
) -> ray.data.Dataset:
    """docs -> docs + (text_hash, rep_id, n_copies).

    ``rep_id`` = min doc_id among rows with identical text;
    ``n_copies`` = exact-dup group size.

    Group discovery is a driver merge of per-block partials while the
    corpus is bounded (zero shuffles), else a two-round task shuffle.

    ``with_hashed=True`` returns ``(docs_rep, docs_h)`` where ``docs_h``
    is the internally materialized hashed corpus — downstream raw-task
    gathers (e.g. verify's borderline shingle sets) run straight off its
    blocks instead of re-executing the lazy rep-attach chain.

    ``store_dir``: corpus-beyond-plasma mode (VERDICT r3 #6). The hashed
    corpus is written ONCE as Parquet under ``store_dir/docs_h`` instead
    of being pinned in the object store; only the projected (doc_id,
    text_hash, text_hash2) columns — ~24 bytes/doc — are materialized
    for group discovery, and ``docs_h`` comes back as a lazy
    column-pruned Parquet read. Text consumers (sign, verify's
    borderline gathers) re-read from the store with row-group pruning.
    """
    if store_dir is not None:
        import os

        docs_dir = os.path.join(store_dir, "docs_h")
        if os.path.isdir(docs_dir) and os.listdir(docs_dir):
            raise ValueError(f"text store {docs_dir} is not empty")
        docs.map_batches(
            _add_text_hash, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(docs_dir)
        docs_h = ray.data.read_parquet(docs_dir)
        hash_src = docs_h.select_columns(
            ["doc_id", "text_hash", "text_hash2"]
        ).materialize()
    else:
        docs_h = docs.map_batches(
            _add_text_hash, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        hash_src = docs_h

    def _ret(docs_rep):
        return (docs_rep, docs_h) if with_hashed else docs_rep

    if driver_merge_limit > 0 and hash_src.count() <= driver_merge_limit:
        # per-block partials via raw Ray tasks over the materialized
        # blocks — distributed pre-aggregation with no extra streaming
        # execution (the blocks are already pinned in the object store)
        partials = ray.get(
            [_group_partial_block.remote(r) for r in hash_src.to_arrow_refs()]
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
        order = lexsort2(rep, th)
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
        return _ret(docs_h.map_batches(
            _attach_rep,
            fn_kwargs={"map_ref": map_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        ))

    # distributed group discovery: a manual two-round task shuffle over
    # the materialized blocks — (A) per block, pre-aggregate to
    # (text_hash, min id, h2, count) partials and split them by
    # text_hash % P; (B) per partition, merge the partials and keep only
    # duplicated groups (tiny by nature). Same O(n) object traffic as a
    # global sort, zero streaming-executor executions, and only dup
    # groups ever reach the driver. (A groupby-aggregate here is
    # pathological in Ray when nearly all keys are distinct: ~70 s for
    # ~10M near-unique groups vs ~2 s for a sort; the task shuffle beats
    # both — see stages/pairs.py for the same plan shape.)
    P = max(1, num_partitions)
    a_out = [
        _shard_partials.options(num_returns=P).remote(r, P)
        for r in hash_src.to_arrow_refs()
    ]
    if P == 1:
        a_out = [[r] for r in a_out]
    b_out = ray.get(
        [
            _merge_dup_groups.remote(*[a[p] for a in a_out])
            for p in range(P)
        ]
    )
    th_u = np.concatenate([b[0] for b in b_out])
    rep_u = np.concatenate([b[1] for b in b_out])
    tot = np.concatenate([b[2] for b in b_out])
    h2_u = np.concatenate([b[3] for b in b_out])
    order = np.argsort(th_u)  # _attach_rep looks keys up via searchsorted
    map_ref = ray.put((th_u[order], rep_u[order], tot[order], h2_u[order]))
    return _ret(docs_h.map_batches(
        _attach_rep,
        fn_kwargs={"map_ref": map_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ))


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
