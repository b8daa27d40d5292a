"""Pair verification — estimated Jaccard with exact re-rank.

Descendant of the reference's candidate re-rank: after bucket lookup it
computes *exact* distances on the gathered candidates and keeps the
top-k (``/root/reference/nlsh/indexer.py:84-95``, ``eval.py:178-188``).
Here, candidates get a signature-estimated Jaccard (fraction of equal
slots, vectorized — SURVEY.md §2.8) and a three-way decision:

* est >  max(exact_hi, threshold) -> accept on the estimate (sampling
  error cannot cross the threshold from up there);
* est <  cfg.exact_lo  -> reject;
* otherwise            -> exact shingle-set Jaccard decides, so the
  borderline band around the threshold is noise-free. The borderline doc
  set is small by construction, so its shingle sets are gathered once
  and broadcast (``ray.put``), not shuffled.

Shingle sets travel as ONE flat container — ``(ids, values, ends)``,
three numpy arrays with per-doc sorted-unique hash segments — rather
than a dict of per-doc arrays: broadcasting a 100k-entry dict of numpy
objects serializes 100k individual buffers (measured: tens of seconds
on the driver), the flat triple is three zero-copy buffers.

Signatures reach the pairs one of two ways (auto-selected):
* **broadcast gather** — the docs participating in candidate pairs are a
  small fraction of the corpus; their signatures are membership-filtered
  out of the (materialized) sigs blocks by raw Ray tasks — no streaming
  execution at all — collected, and broadcast.
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
from nlshray.functions.nputil import isin_sorted as _membership
from nlshray.functions.shingles import batch_shingle_hashes, segmented_unique
from nlshray.stages.sign import sigs_to_numpy

# pair-doc sets beyond this size use the join path (sig matrix at the
# limit: 2M docs x 1 KB = 2 GB broadcast — the ceiling, not the norm)
_BROADCAST_LIMIT = 2_000_000
# below this many pair docs, shingle sets for ALL pair docs are gathered
# up front and every pair exact-verified in one pass (fewer executions);
# above it only the borderline docs' sets are gathered (~1.6 KB/doc of
# shingle hashes -> ~500 MB at the limit)
_EXACT_ALL_LIMIT = 300_000


# ---------------------------------------------------------------------
# flat shingle-set container: (ids, values, starts, lens)
#   ids:    sorted int64 doc ids, one per document
#   values: uint64 flat buffer in ARRIVAL order — never reordered; doc
#           i's sorted-unique shingle hashes are
#           values[starts[i] : starts[i] + lens[i]]
#
# Only the per-doc metadata (ids/starts/lens) is sorted by id; the
# multi-hundred-MB payload stays where the chunks landed. The previous
# layout physically reordered the payload into id order (a take-index
# build + a full gather = ~3 payload-sized fresh allocations), which on
# this host's slow first-touch page supply dominated the whole verify
# stage.
# ---------------------------------------------------------------------

FlatSets = tuple  # (ids, values, starts, lens) np.ndarrays


def empty_flat_sets() -> FlatSets:
    return (
        np.empty(0, np.int64),
        np.empty(0, np.uint64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )


def _unique_flat_from_texts(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-UNIQUE shingle-hash segments for a batch of texts,
    as (flat_values, lengths) — one batch kernel + one segmented unique,
    no per-document python."""
    flat, lengths = batch_shingle_hashes(texts, k)
    return segmented_unique(flat, lengths)


def _list_array(vals: np.ndarray, lengths: np.ndarray) -> pa.ListArray:
    offs = np.zeros(lengths.shape[0] + 1, dtype=np.int32)
    offs[1:] = np.cumsum(lengths)
    return pa.ListArray.from_arrays(
        pa.array(offs), pa.array(vals.astype(np.uint64, copy=False))
    )


def _flat_from_chunks(id_chunks, val_chunks, len_chunks) -> FlatSets:
    """Assemble a FlatSets from per-batch (ids, flat values, lengths)
    chunks arriving in any order — only the per-doc METADATA is sorted;
    the payload is concatenated once and never reordered."""
    if not id_chunks:
        return empty_flat_sets()
    ids = np.concatenate(id_chunks).astype(np.int64, copy=False)
    vals = np.concatenate(val_chunks).astype(np.uint64, copy=False)
    lens = np.concatenate(len_chunks).astype(np.int64, copy=False)
    starts = np.cumsum(lens) - lens
    order = np.argsort(ids, kind="stable")
    return ids[order], vals, starts[order], lens[order]


def flat_sets_get(fs: FlatSets, doc_id: int) -> np.ndarray:
    """One doc's sorted-unique shingle set (tests/debug helper)."""
    ids, vals, starts, lens = fs
    i = int(np.searchsorted(ids, doc_id))
    if i >= ids.shape[0] or ids[i] != doc_id:
        raise KeyError(doc_id)
    return vals[starts[i] : starts[i] + lens[i]]


def flat_pair_jaccard(
    fs: FlatSets, lefts: np.ndarray, rights: np.ndarray
) -> np.ndarray:
    """Exact Jaccard for each (left, right) pair of docs in ``fs``.

    Per-pair set intersection runs in numpy's C ``intersect1d`` on the
    pre-sorted unique segments; the python loop only slices views."""
    ids, vals, starts, lens = fs
    li = np.searchsorted(ids, lefts)
    ri = np.searchsorted(ids, rights)
    if lefts.shape[0] and not (
        np.array_equal(ids[li], lefts) and np.array_equal(ids[ri], rights)
    ):
        missing = np.union1d(lefts[ids[li] != lefts], rights[ids[ri] != rights])
        raise KeyError(f"pair docs missing from gathered sets: {missing[:5]}")
    out = np.empty(lefts.shape[0], dtype=np.float64)
    for j in range(lefts.shape[0]):
        a_i, b_i = li[j], ri[j]
        a = vals[starts[a_i] : starts[a_i] + lens[a_i]]
        b = vals[starts[b_i] : starts[b_i] + lens[b_i]]
        inter = np.intersect1d(a, b, assume_unique=True).shape[0]
        union = a.shape[0] + b.shape[0] - inter
        out[j] = inter / union if union else 1.0
    return out


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


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


@ray.remote
def _filt_sig_block(block: pa.Table, keys: np.ndarray, num_perms: int):
    if block.num_rows == 0:
        # zero-row blocks pass through map_batches unmapped and may
        # lack the sig columns entirely
        return (
            np.empty(0, np.int64),
            np.empty((0, num_perms), np.uint64),
        )
    mask = _membership(keys, block["doc_id"].to_numpy())
    sub = block.filter(pa.array(mask))
    ids = np.asarray(sub["doc_id"]).astype(np.int64, copy=False)
    mat = sigs_to_numpy(sub["sig"], num_perms)
    order = np.argsort(ids)  # sorted chunks: consumers binary-search
    return ids[order], mat[order]


def gather_sigs(
    sigs: ray.data.Dataset, ids: np.ndarray, cfg: DedupConfig
):
    """Membership-filter the sigs dataset to ``ids``; collect and
    broadcast as (sorted_keys, sig_matrix).

    Materialized sigs (the pipeline always materializes them) are
    filtered block-by-block with raw Ray tasks — distributed filtering
    with zero streaming-executor round-trips; a lazy input falls back to
    one map_batches scan. No shuffle either way."""
    keys_sorted = np.sort(ids.astype(np.int64))
    if isinstance(sigs, ray.data.dataset.MaterializedDataset):
        keys_ref = ray.put(keys_sorted)
        outs = ray.get(
            [
                _filt_sig_block.remote(r, keys_ref, cfg.num_perms)
                for r in sigs.to_arrow_refs()
            ]
        )
        key_chunks = [o[0] for o in outs if o[0].shape[0]]
        mat_chunks = [o[1] for o in outs if o[1].shape[0]]
    else:
        ids_ref = ray.put(keys_sorted)

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


def gather_sig_chunks(
    sigs: ray.data.Dataset, ids: np.ndarray, cfg: DedupConfig
) -> list:
    """Chunked form of ``gather_sigs``: per-block (sorted keys, sig
    rows) filter-task OUTPUT REFS, never assembled anywhere.

    The merged broadcast was the verify stage's serial term at campaign
    scale: ~1.2M pair docs x 128 perms = ~1.2 GB concatenated, argsorted
    and re-``ray.put`` ON THE DRIVER (~3-5 s in both scaling legs, r5
    campaign X's verify scaled 2.25x because of it). Keeping the
    per-block chunks in plasma costs the consumers one binary search
    per chunk instead of one global search — trivial next to the hash
    work — and the driver never touches a signature byte."""
    keys_sorted = np.sort(ids.astype(np.int64))
    if isinstance(sigs, ray.data.dataset.MaterializedDataset):
        keys_ref = ray.put(keys_sorted)
        return [
            _filt_sig_block.remote(r, keys_ref, cfg.num_perms)
            for r in sigs.to_arrow_refs()
        ]
    return [gather_sigs(sigs, ids, cfg)]


def _sig_rows_from_chunks(chunks, q: np.ndarray, num_perms: int) -> np.ndarray:
    """Gather signature rows for ids ``q`` from sorted (keys, mat)
    chunks — the worker-side half of the chunked broadcast."""
    out = np.zeros((q.shape[0], num_perms), np.uint64)
    if q.shape[0] == 0:
        return out
    for ck, cm in chunks:
        if ck.shape[0] == 0:
            continue
        pos = np.searchsorted(ck, q)
        np.clip(pos, 0, ck.shape[0] - 1, out=pos)
        hit = ck[pos] == q
        if hit.any():
            out[hit] = cm[pos[hit]]
    return out


_EMPTY_KEPT = pa.table(
    {
        "left_id": pa.array([], pa.int64()),
        "right_id": pa.array([], pa.int64()),
        "n_bands": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64()),
    }
)


def _decide_table(
    t: pa.Table, fs: FlatSets, threshold: float, hi: float
) -> pa.Table:
    """Confident pairs keep the estimate; borderline pairs get exact
    shingle Jaccard from the flat sets — one pass."""
    est_j = t["est_jaccard"].to_numpy()
    confident = est_j > hi
    jac = est_j.astype(np.float64).copy()
    if not confident.all():
        idx = np.flatnonzero(~confident)
        jac[idx] = flat_pair_jaccard(
            fs,
            t["left_id"].to_numpy()[idx],
            t["right_id"].to_numpy()[idx],
        )
    keep = confident | (jac >= threshold)
    method = np.where(confident, "est", "exact")
    out = pa.table(
        {
            "left_id": t["left_id"],
            "right_id": t["right_id"],
            "jaccard": pa.array(jac),
            "n_bands": t["n_bands"],
            "method": pa.array(method.tolist(), pa.string()),
        }
    )
    return out.filter(pa.array(keep))


@ray.remote(num_returns=2)
def _est_classify_block(
    block: pa.Table, num_perms: int, lo: float, hi: float, *sig_chunks
):
    """One pairs block -> (kept pairs with est_jaccard, borderline doc
    ids). The est+classify+borderline-scan pass of the distributed plan
    as a single raw task; ``sig_chunks`` are the per-block sorted
    (keys, matrix) tuples of the chunked broadcast (ObjectRef varargs,
    auto-dereferenced zero-copy from plasma)."""
    if block.num_rows == 0:
        return _EMPTY_KEPT, np.empty(0, np.int64)
    rows_l = _sig_rows_from_chunks(
        sig_chunks, block["left_id"].to_numpy(), num_perms
    )
    rows_r = _sig_rows_from_chunks(
        sig_chunks, block["right_id"].to_numpy(), num_perms
    )
    est = (rows_l == rows_r).mean(axis=1)
    keep = est >= lo
    kept = pa.table(
        {
            "left_id": block["left_id"],
            "right_id": block["right_id"],
            "n_bands": block["n_bands"],
            "est_jaccard": pa.array(est),
        }
    ).filter(pa.array(keep))
    bl = keep & (est <= hi)
    bl_ids = np.unique(
        np.concatenate(
            [
                block["left_id"].to_numpy()[bl],
                block["right_id"].to_numpy()[bl],
            ]
        )
    )
    return kept, bl_ids


def _segment_gather_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices selecting the segments (starts[i], lens[i]) in order."""
    total = int(lens.sum())
    base = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    return base + within


def _flat_for_ids(chunks, need_sorted: np.ndarray) -> FlatSets:
    """Task-local FlatSets for exactly ``need_sorted`` ids, selected out
    of per-block (ids, flat values, lengths) chunks — the worker-side
    half of the chunked shingle-set broadcast."""
    id_c, val_c, len_c = [], [], []
    for ids, vals, lens in chunks:
        if ids.shape[0] == 0:
            continue
        m = _membership(need_sorted, ids)
        if not m.any():
            continue
        starts = np.cumsum(lens) - lens
        sel = np.flatnonzero(m)
        idx = _segment_gather_idx(starts[sel], lens[sel])
        id_c.append(ids[sel])
        val_c.append(vals[idx])
        len_c.append(lens[sel])
    return _flat_from_chunks(id_c, val_c, len_c)


@ray.remote
def _decide_block(
    kept: pa.Table, threshold: float, hi: float, *set_chunks
) -> pa.Table:
    """Decision pass over one kept block. ``set_chunks`` are per-block
    (ids, flat values, lengths) shingle gathers (ObjectRef varargs); the
    task assembles a local FlatSets for just ITS borderline doc ids, so
    the driver never concatenates a shingle byte."""
    est = kept["est_jaccard"].to_numpy() if kept.num_rows else None
    if est is not None and set_chunks and bool((est <= hi).any()):
        bl = est <= hi
        need = np.unique(
            np.concatenate(
                [
                    kept["left_id"].to_numpy()[bl],
                    kept["right_id"].to_numpy()[bl],
                ]
            )
        )
        fs = _flat_for_ids(set_chunks, need)
    else:
        fs = empty_flat_sets()
    return _decide_table(kept, fs, threshold, hi)


_EMPTY_SHINGLE_OUT = (
    np.empty(0, np.int64),
    np.empty(0, np.uint64),
    np.empty(0, np.int64),
)


def _shingle_table(block: pa.Table, keys: np.ndarray, k: int):
    """(ids, flat shingle values, lengths) of one text block's rows with
    doc_id in the sorted ``keys`` — the per-block kernel of the raw-task
    gather."""
    if block.num_rows == 0:
        return _EMPTY_SHINGLE_OUT
    d = block["doc_id"].to_numpy()
    mask = _membership(keys, d)
    if not mask.any():
        return _EMPTY_SHINGLE_OUT
    sub = block.filter(pa.array(mask))
    vals, lens = _unique_flat_from_texts(sub["text"], k)
    return (
        sub["doc_id"].to_numpy().astype(np.int64, copy=False),
        vals,
        lens,
    )


_shingle_block = ray.remote(_shingle_table)


@ray.remote
def _shingle_file(path: str, keys: np.ndarray, k: int):
    """Predicate-pushdown variant of the gather kernel (VERDICT r3 #6):
    reads a persisted docs Parquet file instead of a pinned block. The
    cheap ``doc_id`` column is read per row group first; only row groups
    that actually contain wanted ids pay the ``text`` column read — so a
    small borderline set touches a small fraction of the corpus bytes,
    and the corpus text is never resident in the object store at all."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    outs = []
    for rg in range(f.num_row_groups):
        ids = f.read_row_group(rg, columns=["doc_id"])["doc_id"].to_numpy()
        if _membership(keys, ids).any():
            outs.append(
                _shingle_table(
                    f.read_row_group(rg, columns=["doc_id", "text"]), keys, k
                )
            )
    if not outs:
        return _EMPTY_SHINGLE_OUT
    return (
        np.concatenate([o[0] for o in outs]),
        np.concatenate([o[1] for o in outs]),
        np.concatenate([o[2] for o in outs]),
    )


def gather_shingle_sets(
    reps: ray.data.Dataset,
    ids: np.ndarray,
    cfg: DedupConfig,
    *,
    source_refs: list | None = None,
    source_files: list[str] | None = None,
) -> FlatSets:
    """Shingle sets for an id set, as a FlatSets triple: broadcast-filter
    the reps, compute per-doc unique shingle hashes IN THE WORKERS
    (shingling is the expensive part — doing it on the driver serializes
    the pipeline), assemble the flat buffers on the driver.

    ``source_refs``: optional materialized text-block refs (doc_id +
    text columns; extra columns fine). When given, the gather runs as
    raw Ray tasks over those blocks — zero streaming executions and no
    re-execution of whatever lazy chain produced ``reps``.

    ``source_files``: optional persisted docs Parquet paths (the
    corpus-beyond-plasma text store). One raw task per file; row groups
    without wanted ids never pay the text read (``_shingle_file``)."""
    if source_files is not None:
        keys_ref = ray.put(np.sort(ids.astype(np.int64)))
        outs = ray.get(
            [
                _shingle_file.remote(p, keys_ref, cfg.shingle_k)
                for p in source_files
            ]
        )
        return _flat_from_chunks(
            [o[0] for o in outs if o[0].shape[0]],
            [o[1] for o in outs if o[0].shape[0]],
            [o[2] for o in outs if o[0].shape[0]],
        )
    if source_refs is not None:
        keys_ref = ray.put(np.sort(ids.astype(np.int64)))
        outs = ray.get(
            [
                _shingle_block.remote(r, keys_ref, cfg.shingle_k)
                for r in source_refs
            ]
        )
        return _flat_from_chunks(
            [o[0] for o in outs if o[0].shape[0]],
            [o[1] for o in outs if o[0].shape[0]],
            [o[2] for o in outs if o[0].shape[0]],
        )
    ids_ref = ray.put(np.sort(ids.astype(np.int64)))
    k = cfg.shingle_k

    def shingle(t: pa.Table) -> pa.Table:
        keys = ray.get(ids_ref)
        sub = t.filter(pa.array(_membership(keys, t["doc_id"].to_numpy())))
        vals, lens = _unique_flat_from_texts(sub["text"], k)
        return pa.table(
            {"doc_id": sub["doc_id"], "shingles": _list_array(vals, lens)}
        )

    id_chunks, val_chunks, len_chunks = [], [], []
    for b in reps.select_columns(["doc_id", "text"]).map_batches(
        shingle, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        col = b["shingles"].combine_chunks()
        id_chunks.append(np.asarray(b["doc_id"]))
        val_chunks.append(np.asarray(col.flatten(), dtype=np.uint64))
        len_chunks.append(
            pc.list_value_length(col).to_numpy().astype(np.int64)
        )
    return _flat_from_chunks(id_chunks, val_chunks, len_chunks)


def gather_shingle_chunks(
    reps: ray.data.Dataset,
    ids: np.ndarray,
    cfg: DedupConfig,
    *,
    source_refs: list | None = None,
    source_files: list[str] | None = None,
) -> list:
    """Chunked form of ``gather_shingle_sets``: the per-block
    (ids, flat values, lengths) gather-task REFS, never concatenated on
    the driver. Consumers (``_decide_block``) assemble a local FlatSets
    for exactly the ids they need. With neither source hint the lazy
    fallback still assembles once (executor scan), then ships the one
    normalized chunk."""
    keys_ref = ray.put(np.sort(ids.astype(np.int64)))
    if source_files is not None:
        return [
            _shingle_file.remote(p, keys_ref, cfg.shingle_k)
            for p in source_files
        ]
    if source_refs is not None:
        return [
            _shingle_block.remote(r, keys_ref, cfg.shingle_k)
            for r in source_refs
        ]
    ids_s, vals, starts, lens = gather_shingle_sets(reps, ids, cfg)
    if ids_s.shape[0]:
        vals = vals[_segment_gather_idx(starts, lens)]
    return [ray.put((ids_s, vals, lens))]


def gather_sets_and_edges(
    docs_rep: ray.data.Dataset, ids: np.ndarray, cfg: DedupConfig
) -> tuple[FlatSets, np.ndarray, np.ndarray]:
    """ONE scan of the rep-annotated docs collecting (a) shingle sets of
    the representative docs in ``ids`` (for pair verification, as a
    FlatSets triple) and (b) every exact-dup edge (doc_id, rep_id) (for
    clustering) — fusing the two passes the verify and cluster stages
    would otherwise make."""
    ids_ref = ray.put(np.sort(ids.astype(np.int64)))
    k = cfg.shingle_k

    def pick(t: pa.Table) -> pa.Table:
        """Workers compute the shingle sets (the expensive part); the
        driver only assembles the flat buffers."""
        keys = ray.get(ids_ref)
        d = t["doc_id"].to_numpy()
        r = t["rep_id"].to_numpy()
        is_rep = d == r
        need_text = is_rep & _membership(keys, d)
        keep = need_text | ~is_rep
        vals, lens = _unique_flat_from_texts(
            t["text"].filter(pa.array(need_text)), k
        )
        kept_lens = np.zeros(int(keep.sum()), dtype=np.int64)
        kept_lens[need_text[keep]] = lens  # filter preserves row order
        return pa.table(
            {
                "doc_id": pa.array(d[keep]),
                "rep_id": pa.array(r[keep]),
                "shingles": _list_array(vals, kept_lens),
            }
        )

    id_chunks, val_chunks, len_chunks = [], [], []
    edge_l, edge_r = [], []
    for b in docs_rep.select_columns(["doc_id", "rep_id", "text"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        d = np.asarray(b["doc_id"])
        r = np.asarray(b["rep_id"])
        col = b["shingles"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy().astype(np.int64)
        has = lens > 0
        if has.any():
            id_chunks.append(d[has])
            val_chunks.append(np.asarray(col.flatten(), dtype=np.uint64))
            len_chunks.append(lens[has])
        ne = d != r
        edge_l.append(d[ne])
        edge_r.append(r[ne])
    el = np.concatenate(edge_l) if edge_l else np.empty(0, np.int64)
    er = np.concatenate(edge_r) if edge_r else np.empty(0, np.int64)
    return _flat_from_chunks(id_chunks, val_chunks, len_chunks), el, er


def verify_stage(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    reps: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    num_partitions: int = 32,
    pair_ids: np.ndarray | None = None,
    sets_flat: FlatSets | None = None,
    allow_small_path: bool = True,
    text_source_refs: list | None = None,
    text_source_files: list[str] | None = None,
) -> ray.data.Dataset:
    """candidate pairs -> confirmed pairs (left_id, right_id, jaccard,
    n_bands, method).

    ``pair_ids`` / ``sets_flat``: optional pre-collected inputs (the
    pipeline fuses their gathering with other scans).
    ``allow_small_path=False`` forces the distributed est+borderline
    plan regardless of size (scaling benchmarks; real clusters).
    ``text_source_refs``: optional materialized (doc_id, text, ...)
    block refs; shingle-set gathers then run as raw tasks over them
    instead of re-executing the ``reps`` chain.
    ``text_source_files``: optional persisted docs Parquet paths (the
    corpus-beyond-plasma text store, VERDICT r3 #6); gathers become
    row-group-pruned Parquet reads and the corpus text never occupies
    the object store.
    """
    if pair_ids is None:
        pair_ids = collect_pair_ids(pairs)

    if allow_small_path and pair_ids.shape[0] <= _EXACT_ALL_LIMIT:
        # small-pairs fast path: shingle sets for ALL pair docs in one
        # scan, then every candidate pair is exact-verified — strictly
        # more accurate than the estimate, with no borderline round-trip
        # and no sig gather. Pairs are driver-bounded here (they arrived
        # via the pairs fast path), so the decision itself runs inline.
        sets = (
            sets_flat
            if sets_flat is not None
            else gather_shingle_sets(
                reps, pair_ids, cfg, source_refs=text_source_refs,
                source_files=text_source_files
            )
        )
        lefts_c, rights_c, nb_c = [], [], []
        for b in pairs.select_columns(
            ["left_id", "right_id", "n_bands"]
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            lefts_c.append(np.asarray(b["left_id"]))
            rights_c.append(np.asarray(b["right_id"]))
            nb_c.append(np.asarray(b["n_bands"]))
        lefts = np.concatenate(lefts_c) if lefts_c else np.empty(0, np.int64)
        rights = np.concatenate(rights_c) if rights_c else np.empty(0, np.int64)
        nb = np.concatenate(nb_c) if nb_c else np.empty(0, np.int64)
        jac = flat_pair_jaccard(sets, lefts, rights)
        keep = jac >= cfg.threshold
        return ray.data.from_arrow(
            pa.table(
                {
                    "left_id": pa.array(lefts[keep]),
                    "right_id": pa.array(rights[keep]),
                    "jaccard": pa.array(jac[keep]),
                    "n_bands": pa.array(nb[keep]),
                    "method": pa.array(
                        ["exact"] * int(keep.sum()), pa.string()
                    ),
                }
            )
        )

    # ---- distributed plan: ONE estimate+classify pass, then (only if
    # borderline pairs exist) one shingle-set scan + a decision pass.
    # Round-1's version materialized est, borderline and the union
    # separately (3 extra executor barriers on the serial floor); the
    # broadcast branch now runs BOTH passes as raw task rounds over the
    # pinned pair blocks — zero streaming executions in this stage.
    #
    # The confident-accept boundary is max(exact_hi, threshold): accepting
    # on the estimate alone is only sound when the estimate is ABOVE the
    # threshold (with threshold > exact_hi, e.g. the threshold=1.0
    # equivalence query, a pair with true J just under the threshold could
    # otherwise be confirmed on a high estimate and never exact-verified).
    hi = max(cfg.exact_hi, cfg.threshold)

    def classify(t: pa.Table) -> pa.Table:
        """Pairs annotated with est_jaccard; rejects (< exact_lo)
        dropped in place so only keepers hit the object store."""
        return t.filter(
            pc.greater_equal(t["est_jaccard"], cfg.exact_lo)
        )

    if pair_ids.shape[0] <= _BROADCAST_LIMIT:
        # pairs are tiny relative to the corpus: pin them (no-op when the
        # pipeline already did) and run est+classify+borderline-id
        # extraction as one task per block, the exact-Jaccard decision as
        # a second round over the kept blocks.
        if not isinstance(pairs, ray.data.dataset.MaterializedDataset):
            pairs = pairs.materialize()
        sig_chunks = gather_sig_chunks(sigs, pair_ids, cfg)
        outs = [
            _est_classify_block.remote(
                r, cfg.num_perms, cfg.exact_lo, hi, *sig_chunks
            )
            for r in pairs.to_arrow_refs()
        ]
        bl_arrays = ray.get([o[1] for o in outs])
        bl_ids = (
            np.unique(np.concatenate(bl_arrays))
            if bl_arrays and sum(a.shape[0] for a in bl_arrays)
            else np.empty(0, np.int64)
        )
        if bl_ids.shape[0] == 0:
            set_chunks: list = []
        else:
            set_chunks = gather_shingle_chunks(
                reps, bl_ids, cfg, source_refs=text_source_refs,
                source_files=text_source_files,
            )
        final_refs = [
            _decide_block.remote(o[0], cfg.threshold, hi, *set_chunks)
            for o in outs
        ]
        return ray.data.from_arrow_refs(final_refs)

    # beyond the broadcast limit (the 10^12-doc regime): two streaming
    # hash joins attach the signatures, then classify/decide as
    # executor passes (pairs are no longer pinnable driver-side).
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
    )
    kept = est.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # pairs-scale; the ONLY barrier this stage adds

    # borderline doc ids straight off the materialized table (no re-execution)
    bl_chunks = []
    for b in kept.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        sel = b.filter(pc.less_equal(b["est_jaccard"], hi))
        bl_chunks.append(np.asarray(sel["left_id"]))
        bl_chunks.append(np.asarray(sel["right_id"]))
    bl_ids = (
        np.unique(np.concatenate(bl_chunks))
        if bl_chunks and sum(c.shape[0] for c in bl_chunks)
        else np.empty(0, np.int64)
    )

    cols = ["left_id", "right_id", "jaccard", "n_bands", "method"]

    def decide(t: pa.Table, *, sets_ref) -> pa.Table:
        return _decide_table(t, ray.get(sets_ref), cfg.threshold, hi)

    if bl_ids.shape[0] == 0:
        sets_ref = ray.put(empty_flat_sets())
    else:
        sets_ref = ray.put(
            gather_shingle_sets(
                reps, bl_ids, cfg, source_refs=text_source_refs,
                source_files=text_source_files
            )
        )
    return kept.map_batches(
        decide,
        fn_kwargs={"sets_ref": sets_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(cols)
