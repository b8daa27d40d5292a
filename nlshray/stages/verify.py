"""Pair verification — estimated Jaccard with exact re-rank.

Descendant of the reference's candidate re-rank: after bucket lookup it
computes *exact* distances on the gathered candidates and keeps the
top-k (``/root/reference/nlsh/indexer.py:84-95``, ``eval.py:178-188``).
Here, candidates get a signature-estimated Jaccard (fraction of equal
slots, vectorized — SURVEY.md §2.8) and a three-way decision:

* est >  cfg.exact_hi  -> accept on the estimate (sampling error cannot
  cross the threshold from up there);
* est <  cfg.exact_lo  -> reject;
* otherwise            -> exact shingle-set Jaccard decides, so the
  borderline band around the threshold is noise-free. The borderline doc
  set is small by construction, so its shingle sets are gathered once
  and broadcast (``ray.put``), not shuffled.

Signatures reach the pairs one of two ways (auto-selected):
* **broadcast gather** — the docs participating in candidate pairs are a
  small fraction of the corpus; their signatures are membership-filtered
  out of the sigs dataset in one scan, collected, and broadcast. No
  shuffle at all.
* **two hash joins** on left_id/right_id when the pair-doc set exceeds
  the broadcast limit (the 10^12-doc fallback). Pairs are id-only rows;
  signatures are ~1 KB/doc — corpus text never enters these shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from nlshray.config import DedupConfig
from nlshray.functions.shingles import doc_shingle_hashes, exact_jaccard
from nlshray.stages.sign import sigs_to_numpy

# pair-doc sets beyond this size use the join path (sig matrix at the
# limit: 2M docs x 1 KB = 2 GB broadcast — the ceiling, not the norm)
_BROADCAST_LIMIT = 2_000_000


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


from nlshray.functions.nputil import isin_sorted as _membership


def _est_join_batch(batch: pa.Table, *, num_perms: int) -> pa.Table:
    a = sigs_to_numpy(batch["sig_left"], num_perms)
    b = sigs_to_numpy(batch["sig_right"], num_perms)
    est = (a == b).mean(axis=1)
    return pa.table(
        {
            "left_id": batch["left_id"],
            "right_id": batch["right_id"],
            "n_bands": batch["n_bands"],
            "est_jaccard": pa.array(est),
        }
    )


def _est_lookup_batch(batch: pa.Table, *, sig_ref, num_perms: int) -> pa.Table:
    keys, mat = ray.get(sig_ref)
    li = np.searchsorted(keys, batch["left_id"].to_numpy())
    ri = np.searchsorted(keys, batch["right_id"].to_numpy())
    est = (mat[li] == mat[ri]).mean(axis=1)
    return pa.table(
        {
            "left_id": batch["left_id"],
            "right_id": batch["right_id"],
            "n_bands": batch["n_bands"],
            "est_jaccard": pa.array(est),
        }
    )


def _exact_batch(batch: pa.Table, *, sets_ref) -> pa.Table:
    sets = ray.get(sets_ref)
    lefts = batch["left_id"].to_numpy()
    rights = batch["right_id"].to_numpy()
    out = np.array(
        [exact_jaccard(sets[int(l)], sets[int(r)]) for l, r in zip(lefts, rights)],
        dtype=np.float64,
    )
    return batch.append_column("jaccard", pa.array(out))


def collect_pair_ids(pairs: ray.data.Dataset) -> np.ndarray:
    """Distinct doc ids participating in any pair (driver-side, small)."""
    chunks = [
        np.concatenate([np.asarray(b["left_id"]), np.asarray(b["right_id"])])
        for b in pairs.select_columns(["left_id", "right_id"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    ]
    if not chunks:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(chunks))


def gather_sigs(
    sigs: ray.data.Dataset, ids: np.ndarray, cfg: DedupConfig
):
    """Membership-filter the sigs dataset to ``ids``; collect and
    broadcast as (sorted_keys, sig_matrix). One scan, no shuffle."""
    ids_ref = ray.put(np.sort(ids.astype(np.int64)))

    def filt(t: pa.Table) -> pa.Table:
        keys = ray.get(ids_ref)
        return t.filter(pa.array(_membership(keys, t["doc_id"].to_numpy())))

    sub = sigs.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    key_chunks, mat_chunks = [], []
    for b in sub.iter_batches(batch_size=65536, batch_format="pyarrow"):
        key_chunks.append(np.asarray(b["doc_id"]))
        mat_chunks.append(sigs_to_numpy(b["sig"], cfg.num_perms).copy())
    if not key_chunks:
        return ray.put(
            (np.empty(0, np.int64), np.empty((0, cfg.num_perms), np.uint64))
        )
    keys = np.concatenate(key_chunks)
    mat = np.concatenate(mat_chunks)
    order = np.argsort(keys)
    return ray.put((keys[order], mat[order]))


def gather_shingle_sets(
    reps: ray.data.Dataset, ids: np.ndarray, cfg: DedupConfig
):
    """Shingle sets for a small id set: broadcast-filter the reps, compute
    per-doc unique shingle hashes, collect to the driver. Returns an
    ObjectRef to ``dict[doc_id -> np.ndarray]``."""
    ids_ref = ray.put(np.sort(ids.astype(np.int64)))

    def filt(t: pa.Table) -> pa.Table:
        keys = ray.get(ids_ref)
        return t.filter(pa.array(_membership(keys, t["doc_id"].to_numpy())))

    sub = (
        reps.select_columns(["doc_id", "text"])
        .map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    sets = {
        int(r["doc_id"]): doc_shingle_hashes(r["text"], cfg.shingle_k, unique=True)
        for r in sub
    }
    return ray.put(sets)


def verify_stage(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    reps: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """candidate pairs -> confirmed pairs (left_id, right_id, jaccard,
    n_bands, method)."""
    pair_ids = collect_pair_ids(pairs)

    if pair_ids.shape[0] <= _BROADCAST_LIMIT:
        sig_ref = gather_sigs(sigs, pair_ids, cfg)
        est = pairs.map_batches(
            _est_lookup_batch,
            fn_kwargs={"sig_ref": sig_ref, "num_perms": cfg.num_perms},
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    else:
        left_sigs = _rename(sigs, {"doc_id": "left_id", "sig": "sig_left"})
        right_sigs = _rename(sigs, {"doc_id": "right_id", "sig": "sig_right"})
        j = pairs.join(
            left_sigs,
            join_type="inner",
            num_partitions=num_partitions,
            on=("left_id",),
        ).join(
            right_sigs,
            join_type="inner",
            num_partitions=num_partitions,
            on=("right_id",),
        )
        est = j.map_batches(
            _est_join_batch,
            fn_kwargs={"num_perms": cfg.num_perms},
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()  # small (pairs only); consumed twice below

    def take_confident(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["est_jaccard"], cfg.exact_hi))
        t = t.append_column("jaccard", t["est_jaccard"].cast(pa.float64()))
        return t.append_column(
            "method", pa.array(["est"] * t.num_rows, pa.string())
        )

    def take_borderline(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.greater_equal(t["est_jaccard"], cfg.exact_lo),
                pc.less_equal(t["est_jaccard"], cfg.exact_hi),
            )
        )

    def keep_exact_dups(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["jaccard"], cfg.threshold))
        return t.append_column(
            "method", pa.array(["exact"] * t.num_rows, pa.string())
        )

    cols = ["left_id", "right_id", "jaccard", "n_bands", "method"]
    confident = est.map_batches(
        take_confident, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(cols)

    borderline = est.map_batches(
        take_borderline, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if borderline.count() == 0:
        return confident

    bl_ids = collect_pair_ids(borderline)
    sets_ref = gather_shingle_sets(reps, bl_ids, cfg)
    exact_ok = (
        borderline.map_batches(
            _exact_batch,
            fn_kwargs={"sets_ref": sets_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(keep_exact_dups, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(cols)
    )
    return confident.union(exact_ok)
