"""Candidate-pair generation — THE central wide step (SURVEY.md A1/J1).

The reference builds a ``dict[code -> row ids]`` inverted index on one
GPU (``/root/reference/nlsh/indexer.py:6-24``) and probes it per query
(``indexer.py:62-88``). At 10^12 docs the index cannot be a data
structure; here band rows group on ``band_hash`` and pairs are emitted
within each bucket.

Two physical plans, auto-selected by a size hint:

* **driver-merge fast path** (band rows bounded): per-batch partial
  (band_hash, count) uniques stream to the driver — the 'pre-aggregate
  inside map_batches' pattern with a driver-side final combine; hot rows
  (buckets with >= 2 docs — a small minority) are membership-filtered in
  one more scan and pair emission + cross-band dedup run as one numpy
  pass. Zero shuffles.
* **distributed path**: global SORT on band_hash -> vectorized per-block
  equal-key-run detection emitting pairs in place (runs touching block
  edges are stitched on the driver — a few rows per block) -> one small
  groupby for cross-band dedup. A groupby-aggregate over band rows is
  pathological in Ray when nearly all keys are distinct (~70 s for 11M
  rows/10.9M groups vs 1.9 s for the sort), so the sort IS the shuffle.

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
from ray.data.aggregate import Count

from nlshray.functions.nputil import isin_sorted

# hot-key sets larger than this fall back to a hash join instead of a
# driver broadcast (~8 bytes/key -> 64 MB at the limit)
_BROADCAST_LIMIT = 8_000_000
# band-row counts up to this use the driver-merge fast path
# (16 B/row -> ~500 MB transient at the limit)
_DRIVER_MERGE_LIMIT = 30_000_000
# below this, ALL band rows come to the driver in ONE scan (~64 MB)
_SINGLE_SCAN_LIMIT = 4_000_000
# distributed-path pair rows up to this stitch on the driver (16 B/row
# -> ~500 MB at the limit); beyond it the cross-band dedup is a groupby
_PAIR_STITCH_LIMIT = 30_000_000

# tagged-row kinds emitted by the distributed path's per-block scan
PAIR, BOUNDARY, HOTSIZE, BSIZE = 0, 1, 2, 3


@ray.remote
def _tagged_meta(t: pa.Table):
    """Small (boundary/stat) rows + the pair-row count of one tagged
    block — everything the driver stitch needs except the pairs."""
    if t.num_rows == 0 or "kind" not in t.column_names:
        return None
    kind = np.asarray(t["kind"])
    a = np.asarray(t["a"])
    b = np.asarray(t["b"])
    bm = kind == BOUNDARY
    sm = kind == BSIZE
    return (
        a[bm],
        b[bm],
        a[sm],
        b[sm],
        a[kind == HOTSIZE],
        int((kind == PAIR).sum()),
    )


@ray.remote
def _tagged_pairs(t: pa.Table):
    """The (left, right) pair rows of one tagged block."""
    if t.num_rows == 0 or "kind" not in t.column_names:
        return None
    sel = t.filter(pa.compute.equal(t["kind"], PAIR))
    return np.asarray(sel["a"]), np.asarray(sel["b"])


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
    from nlshray.hashing import splitmix64

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
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        bounds = np.flatnonzero(np.diff(bh)) + 1
        all_starts = np.concatenate([[0], bounds, [bh.shape[0]]])
        sizes = np.diff(all_starts)
        stats.n_buckets_hot = int((sizes >= 2).sum())
        _fill_stats(stats, sizes[sizes >= 2], cfg.group_cap,
                    getattr(cfg, "skew_policy", "star"))
        # keep only hot runs for the emission loop below
        keep_mask = np.repeat(sizes >= 2, sizes)
        bh, ids = bh[keep_mask], ids[keep_mask]
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
        hot_sizes = totals[hot_mask]
        stats.n_buckets_hot = int(hot_keys.shape[0])
        _fill_stats(stats, hot_sizes, cfg.group_cap, getattr(cfg, "skew_policy", "star"))
        if hot_keys.shape[0] == 0:
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
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
    bounds = np.flatnonzero(np.diff(bh)) + 1
    starts = np.concatenate([[0], bounds, [bh.shape[0]]])

    lefts, rights = [], []
    cap = cfg.group_cap
    policy = getattr(cfg, "skew_policy", "star")
    for s, e in zip(starts[:-1], starts[1:]):
        bucket = np.unique(ids[s:e])
        n = bucket.shape[0]
        if n < 2:
            continue
        if n <= cap:
            iu, ju = np.triu_indices(n, 1)
            lefts.append(bucket[iu])
            rights.append(bucket[ju])
        else:
            l, r = _over_cap_pairs(bucket, cap, policy)
            lefts.append(l)
            rights.append(r)
    if not lefts:
        return _empty_pairs(), stats
    rec = np.empty(sum(x.shape[0] for x in lefts), dtype=[("l", "<i8"), ("r", "<i8")])
    rec["l"] = np.concatenate(lefts)
    rec["r"] = np.concatenate(rights)
    uniq, n_bands = np.unique(rec, return_counts=True)
    deduped = ray.data.from_arrow(
        pa.table(
            {
                "left_id": pa.array(uniq["l"]),
                "right_id": pa.array(uniq["r"]),
                "n_bands": pa.array(n_bands.astype(np.int64)),
            }
        )
    )
    return deduped, stats


def candidate_pairs_stage(
    bands: ray.data.Dataset,
    cfg,
    *,
    num_partitions: int = 32,
    n_band_rows: int | None = None,
) -> tuple[ray.data.Dataset, PairStats]:
    """bands -> deduplicated canonical candidate pairs + skew stats.

    ``n_band_rows``: caller's size hint (n_reps * bands); selects the
    driver-merge fast path when bounded.
    """
    stats = PairStats()

    if n_band_rows is not None and n_band_rows <= _DRIVER_MERGE_LIMIT:
        out = _pairs_fast_path(
            bands, cfg, stats, single_scan=n_band_rows <= _SINGLE_SCAN_LIMIT
        )
        if out is not None:
            return out

    # ----- distributed path: sort + vectorized run detection -----
    # A groupby-aggregate over band rows is pathological in Ray when
    # nearly every key is distinct (measured: 60-88 s for 11M rows /
    # 10.9M groups at any partition count or shuffle strategy, vs 1.9 s
    # for the equivalent SORT). So: one global sort on band_hash, then a
    # per-block scan finds equal-key runs vectorized. Runs touching a
    # block edge (which may continue in the neighbor block) ship their
    # raw rows to the driver — a few rows per block — and are stitched
    # and emitted there. No per-group python, no hot-key broadcast, no
    # scale ceiling beyond the sort itself.
    policy = getattr(cfg, "skew_policy", "star")
    cap = cfg.group_cap
    sorted_bands = bands.select_columns(["band_hash", "doc_id"]).sort("band_hash")

    def emit(block: pa.Table) -> pa.Table:
        bh = block["band_hash"].to_numpy()
        ids = block["doc_id"].to_numpy()
        n = bh.shape[0]
        kinds, a_out, b_out = [], [], []

        def boundary_emit(s: int, e: int) -> None:
            """Ship a block-edge run CAPPED: at most cap+1 smallest
            unique ids + one (hash, local_unique_count) BSIZE row; ids
            beyond the cap get local star edges to the shipped minimum,
            so connectivity survives while driver traffic stays O(cap)
            per block edge even for a hot key filling whole blocks
            (VERDICT r1 #4 / ADVICE). (band_hash, doc_id) rows are
            unique corpus-wide, so summing per-block unique counts on
            the driver reconstructs the exact bucket size for stats."""
            u = np.unique(ids[s:e])
            bh_val = bh[s]
            if u.shape[0] > cap + 1:
                ship, rest = u[: cap + 1], u[cap + 1 :]
                kinds.append(np.full(rest.shape[0], PAIR, np.int8))
                a_out.append(np.full(rest.shape[0], ship[0]))
                b_out.append(rest)
            else:
                ship = u
            kinds.append(np.full(ship.shape[0], BOUNDARY, np.int8))
            a_out.append(np.full(ship.shape[0], bh_val))
            b_out.append(ship)
            kinds.append(np.array([BSIZE], np.int8))
            a_out.append(np.array([bh_val], np.int64))
            b_out.append(np.array([u.shape[0]], np.int64))

        if n:
            bounds = np.flatnonzero(np.diff(bh)) + 1
            starts = np.concatenate([[0], bounds, [n]])
            lens = np.diff(starts)
            n_runs = lens.shape[0]
            boundary_emit(starts[0], starts[1])
            if n_runs > 1:
                boundary_emit(starts[-2], starts[-1])
            # interior runs with >= 2 rows: emit pairs vectorized
            # (python touches only DUPLICATE runs, never the n_runs
            # singleton majority)
            interior = np.flatnonzero(lens >= 2)
            interior = interior[(interior != 0) & (interior != n_runs - 1)]
            for j in interior:
                s, e = starts[j], starts[j + 1]
                bucket = np.unique(ids[s:e])
                m = bucket.shape[0]
                if m < 2:
                    continue
                if m <= cap:
                    iu, ju = np.triu_indices(m, 1)
                    l, r = bucket[iu], bucket[ju]
                else:
                    l, r = _over_cap_pairs(bucket, cap, policy)
                kinds.append(np.full(l.shape[0], PAIR, np.int8))
                a_out.append(l)
                b_out.append(r)
                kinds.append(np.array([HOTSIZE], np.int8))
                a_out.append(np.array([m], np.int64))
                b_out.append(np.array([0], np.int64))
        if not kinds:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds)),
                "a": pa.array(np.concatenate(a_out)),
                "b": pa.array(np.concatenate(b_out)),
            }
        )

    tagged = sorted_bands.map_batches(
        emit, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    # driver: stitch boundary runs, fold hot sizes into stats. Raw Ray
    # tasks strip each tagged block down to its (small) boundary/stat
    # rows IN PLACE — pair rows, the bulk, never cross to the driver in
    # this round (round 2 below fetches them only when driver-bounded).
    refs = tagged.to_arrow_refs()
    metas = ray.get([_tagged_meta.remote(r) for r in refs])
    bnd_bh, bnd_ids, sizes, bsz_bh, bsz_n = [], [], [], [], []
    n_pair_rows = 0
    for m in metas:
        if m is None:
            continue  # empty sort partitions pass through un-mapped
        bnd_bh.append(m[0])
        bnd_ids.append(m[1])
        bsz_bh.append(m[2])
        bsz_n.append(m[3])
        sizes.append(m[4])
        n_pair_rows += m[5]
    extra_pairs: list[tuple[np.ndarray, np.ndarray]] = []
    if bnd_bh:
        # exact stitched-bucket sizes: sum the per-block unique counts
        szh = np.concatenate(bsz_bh)
        szn = np.concatenate(bsz_n)
        so = np.argsort(szh, kind="stable")
        szh, szn = szh[so], szn[so]
        sz_starts = (
            np.concatenate([[0], np.flatnonzero(np.diff(szh)) + 1])
            if szh.shape[0]
            else np.empty(0, np.int64)
        )
        tot = np.add.reduceat(szn, sz_starts) if szh.shape[0] else szn
        size_of = dict(zip(szh[sz_starts].tolist(), tot.tolist()))

        bh = np.concatenate(bnd_bh)
        ids = np.concatenate(bnd_ids)
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(bh)) + 1, [bh.shape[0]]]
        ) if bh.shape[0] else np.array([0, 0])
        for s, e in zip(starts[:-1], starts[1:]):
            bucket = np.unique(ids[s:e])
            m = size_of.get(int(bh[s]), bucket.shape[0])
            if m < 2:
                continue
            sizes.append(np.array([m], np.int64))
            if m <= cap:
                # m <= cap implies every member was shipped (per-block
                # caps are cap+1 > m), so these are the full exact pairs
                iu, ju = np.triu_indices(bucket.shape[0], 1)
                extra_pairs.append((bucket[iu], bucket[ju]))
            else:
                extra_pairs.append(_over_cap_pairs(bucket, cap, policy))
    all_sizes = (
        np.concatenate(sizes) if sizes else np.empty(0, np.int64)
    )
    stats.n_buckets_hot = int(all_sizes.shape[0])
    _fill_stats(stats, all_sizes, cap, policy)

    n_extra = sum(p[0].shape[0] for p in extra_pairs)
    if n_pair_rows + n_extra <= _PAIR_STITCH_LIMIT:
        # round 2: the pair rows are driver-bounded (16 B/row) — fetch
        # them with raw tasks and do the cross-band dedup as ONE
        # np.unique instead of a groupby shuffle execution (the pairs
        # here are a tiny fraction of band rows; a full groupby spends
        # its whole wall on executor + shuffle fixed costs)
        parts = ray.get([_tagged_pairs.remote(r) for r in refs])
        lefts = [p[0] for p in parts if p is not None] + [
            p[0] for p in extra_pairs
        ]
        rights = [p[1] for p in parts if p is not None] + [
            p[1] for p in extra_pairs
        ]
        if not lefts:
            return _empty_pairs(), stats
        rec = np.empty(
            sum(x.shape[0] for x in lefts), dtype=[("l", "<i8"), ("r", "<i8")]
        )
        rec["l"] = np.concatenate(lefts)
        rec["r"] = np.concatenate(rights)
        uniq, n_bands = np.unique(rec, return_counts=True)
        return (
            ray.data.from_arrow(
                pa.table(
                    {
                        "left_id": pa.array(uniq["l"]),
                        "right_id": pa.array(uniq["r"]),
                        "n_bands": pa.array(n_bands.astype(np.int64)),
                    }
                )
            ),
            stats,
        )

    # pair rows exceed the driver bound: distributed cross-band dedup
    def _pair_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "kind" not in t.column_names:
            return pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                }
            )
        sel = t.filter(pa.compute.equal(t["kind"], PAIR))
        return pa.table({"left_id": sel["a"], "right_id": sel["b"]})

    pairs_ds = tagged.map_batches(
        _pair_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    if extra_pairs:
        pairs_ds = pairs_ds.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "left_id": pa.array(
                            np.concatenate([p[0] for p in extra_pairs])
                        ),
                        "right_id": pa.array(
                            np.concatenate([p[1] for p in extra_pairs])
                        ),
                    }
                )
            )
        )
    deduped = (
        pairs_ds.groupby(["left_id", "right_id"], num_partitions=num_partitions)
        .aggregate(Count(alias_name="n_bands"))
    )
    return deduped, stats
