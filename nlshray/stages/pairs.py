"""Candidate-pair generation — THE central shuffle (SURVEY.md A1/J1).

The reference builds a ``dict[code -> row ids]`` inverted index on one
GPU (``/root/reference/nlsh/indexer.py:6-24``) and probes it per query
(``indexer.py:62-88``). At 10^12 docs the index cannot be a data
structure; here the group *is* the bucket: band rows shuffle on
``band_hash`` and pairs are emitted within each group.

Skew handling (SURVEY.md §7.4.1 — the reference only *logs* bucket-size
std, ``nlsh/trainers/base.py:89-90``; we must handle it):

* a vectorized ``Count`` pre-pass finds buckets with >= 2 docs; singleton
  buckets (the overwhelming majority) never enter the pair shuffle —
  the hot-key set is broadcast (``ray.put``) and bands are filtered by a
  ``searchsorted`` membership test per batch, or hash-joined against the
  hot-key table when the hot set is too large to broadcast;
* buckets larger than ``cfg.group_cap`` emit star edges around the min
  doc_id instead of O(n^2) pairs — connectivity (and thus clustering) is
  preserved; forgone pair emissions are counted and reported, never
  silent (the exact-dup pre-pass has already collapsed identical pages,
  so giant buckets are rare by construction).

Output: canonical (left_id < right_id) pairs, deduplicated across bands
by a second vectorized groupby-Count whose count doubles as the
``n_bands`` collision-strength signal.
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


@dataclass
class PairStats:
    n_buckets_hot: int = 0          # buckets with >= 2 docs
    max_bucket: int = 0
    n_capped_buckets: int = 0       # buckets over group_cap (star-edged)
    pairs_forgone: int = 0          # C(n,2)-(n-1) summed over capped buckets


def _membership_filter(batch: pa.Table, *, keys_ref) -> pa.Table:
    keys = ray.get(keys_ref)  # sorted int64 array, local-store cached
    mask = isin_sorted(keys, batch["band_hash"].to_numpy())
    return batch.filter(pa.array(mask))


def _emit_pairs(group: dict[str, np.ndarray], *, cap: int) -> dict[str, np.ndarray]:
    ids = np.unique(group["doc_id"])
    n = ids.shape[0]
    empty = {"left_id": np.empty(0, np.int64), "right_id": np.empty(0, np.int64)}
    if n < 2:
        return empty
    if n <= cap:
        iu, ju = np.triu_indices(n, 1)
        return {"left_id": ids[iu], "right_id": ids[ju]}
    # star edges: min-id hub keeps the bucket connected at O(n) pairs
    return {"left_id": np.full(n - 1, ids[0]), "right_id": ids[1:]}


def candidate_pairs_stage(
    bands: ray.data.Dataset,
    cfg,
    *,
    num_partitions: int = 32,
) -> tuple[ray.data.Dataset, PairStats]:
    """bands -> deduplicated canonical candidate pairs + skew stats."""
    counts = bands.groupby("band_hash").aggregate(Count(alias_name="bucket_n"))
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["bucket_n"], 2)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()   # hot buckets only: small (dup docs, not the corpus)

    n_hot = hot.count()
    stats = PairStats(n_buckets_hot=n_hot)

    if n_hot == 0:
        empty = ray.data.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                    "n_bands": pa.array([], pa.int64()),
                }
            )
        )
        return empty, stats

    if n_hot <= _BROADCAST_LIMIT:
        hot_tbl = hot.to_arrow_refs()
        keys = np.sort(
            np.concatenate(
                [np.asarray(ray.get(r)["band_hash"]) for r in hot_tbl]
            )
        )
        sizes_all = np.concatenate(
            [np.asarray(ray.get(r)["bucket_n"]) for r in hot_tbl]
        )
        stats.max_bucket = int(sizes_all.max())
        over = sizes_all[sizes_all > cfg.group_cap].astype(np.int64)
        stats.n_capped_buckets = int(over.shape[0])
        stats.pairs_forgone = int((over * (over - 1) // 2 - (over - 1)).sum())
        keys_ref = ray.put(keys)
        hot_bands = bands.map_batches(
            _membership_filter,
            fn_kwargs={"keys_ref": keys_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        # scale path: hash join against the hot-key table
        hot_bands = bands.join(
            hot.select_columns(["band_hash"]),
            join_type="inner",
            num_partitions=num_partitions,
            on=("band_hash",),
        )

    raw_pairs = hot_bands.groupby("band_hash").map_groups(
        _emit_pairs,
        fn_kwargs={"cap": cfg.group_cap},
        batch_format="numpy",
    )
    deduped = (
        raw_pairs.groupby(["left_id", "right_id"])
        .aggregate(Count(alias_name="n_bands"))
    )
    return deduped, stats
