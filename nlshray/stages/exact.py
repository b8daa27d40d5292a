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

Physical plan: one vectorized groupby-aggregate over the projected
(text_hash, doc_id) columns finds duplicated groups; attaching ``rep_id``
back to the full rows uses either
* a driver broadcast of the (small) duplicated-group map — docs not in
  the map are their own representative; no second shuffle of the text, or
* a hash join on ``text_hash`` when the duplicated-group map exceeds the
  broadcast limit (the 10^12-doc fallback).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

from nlshray.functions.nputil import lookup_sorted
from nlshray.hashing import MASK63

# duplicated-group maps beyond this row count hash-join instead of
# broadcasting (~24 B/row -> ~200 MB at the limit)
_BROADCAST_LIMIT = 8_000_000


def _add_text_hash(batch: pa.Table) -> pa.Table:
    salt = (0x7E47).to_bytes(8, "little")
    hashes = [
        int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8, salt=salt).digest(),
            "little",
        )
        & MASK63
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.int64()))


def _attach_rep(batch: pa.Table, *, map_ref) -> pa.Table:
    keys, reps, copies = ray.get(map_ref)
    th = batch["text_hash"].to_numpy()
    own = batch["doc_id"].to_numpy()
    rep = lookup_sorted(keys, reps, th, own)
    n_copies = lookup_sorted(keys, copies, th, np.ones_like(th))
    return batch.append_column("rep_id", pa.array(rep, pa.int64())).append_column(
        "n_copies", pa.array(n_copies, pa.int64())
    )


def _collect_columns(ds: ray.data.Dataset, cols: list[str]) -> list[np.ndarray]:
    chunks: list[list[np.ndarray]] = [[] for _ in cols]
    for b in ds.select_columns(cols).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for i, c in enumerate(cols):
            chunks[i].append(np.asarray(b[c]))
    return [
        np.concatenate(ch) if ch else np.empty(0, dtype=np.int64) for ch in chunks
    ]


def _group_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: (text_hash, min doc_id, count) per distinct hash
    — the 'pre-aggregate inside map_batches' pattern; the final combine
    happens on the driver when bounded, in a groupby shuffle otherwise."""
    th = batch["text_hash"].to_numpy()
    ids = batch["doc_id"].to_numpy()
    order = np.lexsort((ids, th))
    th_s, ids_s = th[order], ids[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(np.diff(th_s)) + 1]
    ) if th_s.shape[0] else np.empty(0, np.int64)
    counts = np.diff(np.concatenate([starts, [th_s.shape[0]]]))
    return pa.table(
        {
            "text_hash": pa.array(th_s[starts]),
            "rep_id": pa.array(ids_s[starts]),   # min doc per hash (sorted)
            "n_copies": pa.array(counts.astype(np.int64)),
        }
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
        th_c, rep_c, cop_c = [], [], []
        for b in docs_h.select_columns(["text_hash", "doc_id"]).map_batches(
            _group_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            th_c.append(np.asarray(b["text_hash"]))
            rep_c.append(np.asarray(b["rep_id"]))
            cop_c.append(np.asarray(b["n_copies"]))
        th = np.concatenate(th_c) if th_c else np.empty(0, np.int64)
        rep = np.concatenate(rep_c) if rep_c else np.empty(0, np.int64)
        cop = np.concatenate(cop_c) if cop_c else np.empty(0, np.int64)
        order = np.lexsort((rep, th))
        th, rep, cop = th[order], rep[order], cop[order]
        starts = (
            np.concatenate([[0], np.flatnonzero(np.diff(th)) + 1])
            if th.shape[0]
            else np.empty(0, np.int64)
        )
        tot = np.add.reduceat(cop, starts) if th.shape[0] else cop
        th_u, rep_u = th[starts], rep[starts]
        dup = tot >= 2
        map_ref = ray.put((th_u[dup], rep_u[dup], tot[dup]))
        return docs_h.map_batches(
            _attach_rep,
            fn_kwargs={"map_ref": map_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    groups = (
        docs_h.select_columns(["text_hash", "doc_id"])
        .groupby("text_hash", num_partitions=num_partitions)
        .aggregate(
            Min("doc_id", alias_name="rep_id"),
            Count(alias_name="n_copies"),
        )
    )
    dup_groups = groups.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_copies"], 2)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if dup_groups.count() <= _BROADCAST_LIMIT:
        th, rep, cop = _collect_columns(
            dup_groups, ["text_hash", "rep_id", "n_copies"]
        )
        order = np.argsort(th)
        map_ref = ray.put((th[order], rep[order], cop[order]))
        return docs_h.map_batches(
            _attach_rep,
            fn_kwargs={"map_ref": map_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # scale fallback: join every row against its group
    return docs_h.join(
        groups, join_type="inner", num_partitions=num_partitions, on=("text_hash",)
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
