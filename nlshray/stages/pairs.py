"""Candidate-pair generation — THE central wide step (SURVEY.md A1/J1).

The reference builds a ``dict[code -> row ids]`` inverted index on one
GPU (``/root/reference/nlsh/indexer.py:6-24``) and probes it per query
(``indexer.py:62-88``). At 10^12 docs the index cannot be a data
structure; here band rows are co-located by ``band_hash`` and pairs are
emitted within each bucket.

Two physical plans, auto-selected by a size hint:

* **driver-merge fast path** (band rows bounded): per-batch partial
  (band_hash, count) uniques stream to the driver — the 'pre-aggregate
  inside map_batches' pattern with a driver-side final combine; hot rows
  (buckets with >= 2 docs — a small minority) are membership-filtered in
  one more scan and pair emission + cross-band dedup run as one numpy
  pass. Zero shuffles.
* **task-shuffle path**: a manual three-round map/shuffle/reduce built
  from raw Ray tasks over the (materialized) source blocks —
  (A) per block, compute band rows and split them by ``band_hash % P``;
  (B) per partition, lexsort its complete buckets and emit pairs in
  place (every row of a given band_hash lands in ONE partition, so
  there are no block-boundary runs to stitch);
  (C) per pair-hash partition, merge and cross-band-dedup into the
  final (left, right, n_bands) blocks.
  This is the same M x R object traffic as Ray's sort-based shuffle but
  with zero streaming-executor executions, no sampling pass, and no
  boundary approximations. (An earlier revision used a global SORT +
  per-block run detection with driver-stitched block edges; the
  task shuffle emits byte-identical pairs with ~3 fewer executor
  round-trips per job.)

Skew handling in both (SURVEY.md §7.4.1 — the reference only *logs*
bucket-size std, ``nlsh/trainers/base.py:89-90``): buckets larger than
``cfg.group_cap`` emit star edges around the min doc_id instead of
O(n^2) pairs — connectivity (hence clustering) is preserved; forgone
pair emissions are counted in ``PairStats``, never silent. The exact-dup
pre-pass has already collapsed identical pages, so giant buckets are
rare by construction.

Output: canonical (left_id < right_id) pairs with ``n_bands`` (how many
bands collided — a collision-strength signal).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.functions.nputil import isin_sorted, lexsort2
from nlshray.hashing import splitmix64

# hot-key sets larger than this fall back to a hash join instead of a
# driver broadcast (~8 bytes/key -> 64 MB at the limit)
_BROADCAST_LIMIT = 8_000_000
# band-row counts up to this use the driver-merge fast path
# (16 B/row -> ~500 MB transient at the limit)
_DRIVER_MERGE_LIMIT = 30_000_000
# below this, ALL band rows come to the driver in ONE scan (~64 MB)
_SINGLE_SCAN_LIMIT = 4_000_000


@dataclass
class PairStats:
    n_buckets_hot: int = 0          # buckets with >= 2 docs
    max_bucket: int = 0
    n_capped_buckets: int = 0       # buckets over group_cap (star-edged)
    pairs_forgone: int = 0          # C(n,2)-(n-1) summed over capped buckets


def _empty_pairs() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "n_bands": pa.array([], pa.int64()),
            }
        )
    )


def _membership_filter(batch: pa.Table, *, keys_ref) -> pa.Table:
    keys = ray.get(keys_ref)  # sorted int64 array, local-store cached
    mask = isin_sorted(keys, batch["band_hash"].to_numpy())
    return batch.filter(pa.array(mask))


def _over_cap_pairs(
    ids: np.ndarray, cap: int, policy: str
) -> tuple[np.ndarray, np.ndarray]:
    """Skew-capped emission for a bucket of n > cap members (sorted ids).

    ``star``: min-id hub, O(n) edges. ``salt``: split members into
    ceil(n/cap) deterministic salted sub-buckets (splitmix of doc_id —
    seed-free, identical on every worker), full pairs within each
    sub-bucket, plus hub links between sub-bucket minima so the bucket
    stays one component (the 'salt hot keys' pattern, SURVEY.md §4).
    """
    n = ids.shape[0]
    if policy == "star":
        return np.full(n - 1, ids[0]), ids[1:]

    k = -(-n // cap)  # ceil
    slot = (splitmix64(ids.astype(np.uint64)) % np.uint64(k)).astype(np.int64)
    lefts, rights = [], []
    minima = []
    for s in range(k):
        sub = np.sort(ids[slot == s])
        if sub.shape[0] == 0:
            continue
        minima.append(sub[0])
        if sub.shape[0] >= 2:
            iu, ju = np.triu_indices(sub.shape[0], 1)
            lefts.append(sub[iu])
            rights.append(sub[ju])
    minima = np.sort(np.array(minima, dtype=ids.dtype))
    if minima.shape[0] >= 2:
        lefts.append(np.full(minima.shape[0] - 1, minima[0]))
        rights.append(minima[1:])
    if not lefts:
        return np.empty(0, ids.dtype), np.empty(0, ids.dtype)
    return np.concatenate(lefts), np.concatenate(rights)


def _fill_stats(
    stats: PairStats, sizes: np.ndarray, cap: int, policy: str = "star"
) -> None:
    if sizes.shape[0] == 0:
        return
    stats.max_bucket = int(sizes.max())
    over = sizes[sizes > cap].astype(np.int64)
    stats.n_capped_buckets = int(over.shape[0])
    full = over * (over - 1) // 2
    if policy == "salt":
        # approx emitted: k sub-buckets of ~n/k members + k-1 hub links
        k = -(-over // cap)
        sub = -(-over // k)
        emitted = k * (sub * (sub - 1) // 2) + (k - 1)
    else:
        emitted = over - 1
    stats.pairs_forgone = int(np.maximum(full - emitted, 0).sum())


def _emit_bucket_pairs(
    bh: np.ndarray, ids: np.ndarray, cap: int, policy: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pairs + hot-bucket sizes from a COMPLETE set of band rows (every
    row of each present band_hash): lexsort, vectorized run detection,
    per-bucket emission with the skew cap. Python touches only buckets
    with >= 2 rows (a small minority)."""
    if bh.shape[0] == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    order = lexsort2(ids, bh)
    bh_s, ids_s = bh[order], ids[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(np.diff(bh_s)) + 1, [bh_s.shape[0]]]
    )
    lens = np.diff(starts)
    lefts, rights, sizes = [], [], []
    for j in np.flatnonzero(lens >= 2):
        bucket = np.unique(ids_s[starts[j] : starts[j + 1]])
        n = bucket.shape[0]
        if n < 2:
            continue
        sizes.append(n)
        if n <= cap:
            iu, ju = np.triu_indices(n, 1)
            lefts.append(bucket[iu])
            rights.append(bucket[ju])
        else:
            l, r = _over_cap_pairs(bucket, cap, policy)
            lefts.append(l)
            rights.append(r)
    if not lefts:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    return (
        np.concatenate(lefts),
        np.concatenate(rights),
        np.asarray(sizes, dtype=np.int64),
    )


def _dedup_pair_arrays(
    lefts: list[np.ndarray], rights: list[np.ndarray]
) -> pa.Table:
    """Cross-band dedup of pair chunks -> (left_id, right_id, n_bands)."""
    rec = np.empty(
        sum(x.shape[0] for x in lefts), dtype=[("l", "<i8"), ("r", "<i8")]
    )
    rec["l"] = np.concatenate(lefts) if lefts else np.empty(0, np.int64)
    rec["r"] = np.concatenate(rights) if rights else np.empty(0, np.int64)
    uniq, n_bands = np.unique(rec, return_counts=True)
    return pa.table(
        {
            "left_id": pa.array(uniq["l"]),
            "right_id": pa.array(uniq["r"]),
            "n_bands": pa.array(n_bands.astype(np.int64)),
        }
    )


def _count_partial(batch: pa.Table) -> pa.Table:
    keys, counts = np.unique(batch["band_hash"].to_numpy(), return_counts=True)
    return pa.table(
        {"band_hash": pa.array(keys), "bucket_n": pa.array(counts.astype(np.int64))}
    )


def _pairs_fast_path(
    bands: ray.data.Dataset,
    cfg,
    stats: PairStats,
    *,
    single_scan: bool,
) -> tuple[ray.data.Dataset, PairStats] | None:
    """Zero-shuffle plan; returns None if the hot set exceeds broadcast.

    ``single_scan``: collect ALL (band_hash, doc_id) rows in one pass
    (16 B/row — for modest band tables); otherwise two passes: partial
    counts first, then only hot rows cross the wire.
    """
    if single_scan:
        bh_chunks, id_chunks = [], []
        for b in bands.select_columns(["band_hash", "doc_id"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            bh_chunks.append(np.asarray(b["band_hash"]))
            id_chunks.append(np.asarray(b["doc_id"]))
        if not bh_chunks:
            return _empty_pairs(), stats
        bh = np.concatenate(bh_chunks)
        ids = np.concatenate(id_chunks)
    else:
        # pass 1: partial counts -> driver merge
        key_chunks, cnt_chunks = [], []
        for b in bands.map_batches(
            _count_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            key_chunks.append(np.asarray(b["band_hash"]))
            cnt_chunks.append(np.asarray(b["bucket_n"]))
        if not key_chunks:
            return _empty_pairs(), stats
        keys = np.concatenate(key_chunks)
        cnts = np.concatenate(cnt_chunks)
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        bounds = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate([[0], bounds])
        totals = np.add.reduceat(cnts, starts)
        uniq_keys = keys[starts]

        hot_mask = totals >= 2
        hot_keys = uniq_keys[hot_mask]
        if hot_keys.shape[0] == 0:
            stats.n_buckets_hot = 0
            return _empty_pairs(), stats
        if hot_keys.shape[0] > _BROADCAST_LIMIT:
            return None

        # pass 2: membership filter, collect hot rows, emit + dedup on driver
        keys_ref = ray.put(hot_keys)  # already sorted
        bh_chunks, id_chunks = [], []
        for b in bands.map_batches(
            _membership_filter,
            fn_kwargs={"keys_ref": keys_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            bh_chunks.append(np.asarray(b["band_hash"]))
            id_chunks.append(np.asarray(b["doc_id"]))
        bh = np.concatenate(bh_chunks)
        ids = np.concatenate(id_chunks)

    cap = cfg.group_cap
    policy = getattr(cfg, "skew_policy", "star")
    lefts, rights, sizes = _emit_bucket_pairs(bh, ids, cap, policy)
    stats.n_buckets_hot = int(sizes.shape[0])
    _fill_stats(stats, sizes, cap, policy)
    if lefts.shape[0] == 0:
        return _empty_pairs(), stats
    return ray.data.from_arrow(_dedup_pair_arrays([lefts], [rights])), stats


# ---------------------------------------------------------------------
# task-shuffle path: raw Ray tasks, three rounds, zero executions
# ---------------------------------------------------------------------


def _band_cols(block: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    return (
        block["band_hash"].to_numpy().astype(np.int64, copy=False),
        block["doc_id"].to_numpy().astype(np.int64, copy=False),
    )


@ray.remote
def _shard_rows(block: pa.Table, source_fn, P: int):
    """Round A: (band_hash, doc_id) rows of one block, split into P
    hash partitions. ``source_fn(block) -> (band_hash, doc_id)`` lets
    callers fold their banding kernel into this round (no separate
    band-map execution)."""
    if block.num_rows == 0:
        # zero-row blocks pass through map_batches unmapped (wrong or
        # missing columns) — emit empty partitions
        e = np.empty(0, np.int64)
        out = [(e, e)] * P
        return out[0] if P == 1 else tuple(out)
    bh, ids = (source_fn or _band_cols)(block)
    part = (bh % P).astype(np.int64)  # band hashes are 63-bit non-negative
    order = np.argsort(part, kind="stable")
    bh_s, ids_s, part_s = bh[order], ids[order], part[order]
    cuts = np.searchsorted(part_s, np.arange(1, P))
    bh_parts = np.split(bh_s, cuts)
    id_parts = np.split(ids_s, cuts)
    out = [(b, i) for b, i in zip(bh_parts, id_parts)]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _bucket_pairs_part(cap: int, policy: str, P2: int, *chunks):
    """Round B: one band-hash partition's COMPLETE buckets -> pairs +
    hot sizes; pairs pre-split by a pair-key hash for round C."""
    bh = np.concatenate([c[0] for c in chunks]) if chunks else np.empty(0, np.int64)
    ids = np.concatenate([c[1] for c in chunks]) if chunks else np.empty(0, np.int64)
    lefts, rights, sizes = _emit_bucket_pairs(bh, ids, cap, policy)
    key = splitmix64(
        (lefts.astype(np.uint64) << np.uint64(32)) ^ rights.astype(np.uint64)
    )
    part = (key % np.uint64(P2)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    l_s, r_s, part_s = lefts[order], rights[order], part[order]
    cuts = np.searchsorted(part_s, np.arange(1, P2))
    l_parts = np.split(l_s, cuts)
    r_parts = np.split(r_s, cuts)
    out = [sizes] + [(l, r) for l, r in zip(l_parts, r_parts)]
    return out[0] if P2 == 0 else tuple(out)


@ray.remote
def _dedup_pairs_part(*chunks) -> pa.Table:
    """Round C: merge one pair-key partition across all B outputs and
    cross-band-dedup it (each canonical pair lives in exactly one
    round-C partition, so the dedup is exact)."""
    return _dedup_pair_arrays([c[0] for c in chunks], [c[1] for c in chunks])


def _pairs_task_shuffle(
    source_refs: list,
    source_fn,
    cfg,
    stats: PairStats,
    *,
    num_partitions: int,
) -> tuple[ray.data.Dataset, PairStats]:
    """The scale plan: manual map/shuffle/reduce over block refs."""
    P = max(1, num_partitions)
    P2 = max(1, num_partitions)
    cap = cfg.group_cap
    policy = getattr(cfg, "skew_policy", "star")
    if not source_refs:
        return _empty_pairs(), stats

    a_out = [
        _shard_rows.options(num_returns=P).remote(r, source_fn, P)
        for r in source_refs
    ]
    if P == 1:
        a_out = [[r] for r in a_out]
    b_out = [
        _bucket_pairs_part.options(num_returns=P2 + 1).remote(
            cap, policy, P2, *[a_out[b][p] for b in range(len(a_out))]
        )
        for p in range(P)
    ]
    c_refs = [
        _dedup_pairs_part.remote(*[b_out[p][1 + q] for p in range(P)])
        for q in range(P2)
    ]
    sizes = np.concatenate(ray.get([b_out[p][0] for p in range(P)]))
    stats.n_buckets_hot = int(sizes.shape[0])
    _fill_stats(stats, sizes, cap, policy)
    return ray.data.from_arrow_refs(c_refs), stats


def candidate_pairs_stage(
    bands: ray.data.Dataset,
    cfg,
    *,
    num_partitions: int = 32,
    n_band_rows: int | None = None,
    source_refs: list | None = None,
    source_fn=None,
) -> tuple[ray.data.Dataset, PairStats]:
    """bands -> deduplicated canonical candidate pairs + skew stats.

    ``n_band_rows``: caller's size hint (n_reps * bands); selects the
    driver-merge fast path when bounded.
    ``source_refs`` / ``source_fn``: optional materialized source blocks
    + a per-block kernel producing (band_hash, doc_id) — lets the scale
    plan run entirely as raw tasks with banding folded into round A
    (``bands`` is then only used by the fast path).
    """
    stats = PairStats()

    if n_band_rows is not None and n_band_rows <= _DRIVER_MERGE_LIMIT:
        out = _pairs_fast_path(
            bands, cfg, stats, single_scan=n_band_rows <= _SINGLE_SCAN_LIMIT
        )
        if out is not None:
            return out

    if source_refs is None:
        # no materialized source handed in: one execution produces the
        # band-row blocks, then the task shuffle takes over
        source_refs = bands.select_columns(
            ["band_hash", "doc_id"]
        ).to_arrow_refs()
        source_fn = None
    return _pairs_task_shuffle(
        source_refs, source_fn, cfg, stats, num_partitions=num_partitions
    )
