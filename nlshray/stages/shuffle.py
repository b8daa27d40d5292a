"""Seeded epoch shuffle with a materialized global order (T3 at scale).

The reference reshuffles training rows per epoch with a seeded RNG
(`/root/reference/nlsh/trainers/base.py` epoch loop); at corpus scale
the same semantics is a deterministic hash order: sort by
``z = splitmix64(id ^ seed_mix(seed)) & mask63`` (tie: id) — a pure
function of (id, seed), so epoch E's order is identical at any
parallelism and any resume point, and a different ``seed`` per epoch
gives independent orders.

The global rank is attached with the driver-stitched block-offset
pattern (same shape as the exact-dup run detection,
``stages/exact.py``): a sorted Dataset's blocks are already in global
order, so one metadata round collects per-block row counts, a cumsum
gives each block's start offset, and one tiny task per block adds
``offset + arange`` — no second shuffle, and the driver only ever
sees O(blocks) integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from nlshray.hashing import _seed_mix, splitmix64

_MASK63 = np.uint64((1 << 63) - 1)


@ray.remote
def _block_rows(b: pa.Table) -> int:
    return b.num_rows


@ray.remote
def _attach_rank(b: pa.Table, id_col: str, offset: int) -> pa.Table:
    if id_col not in b.column_names:  # empty blocks carry a bare schema
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "epoch_rank": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            id_col: b[id_col],
            "epoch_rank": pa.array(
                offset + np.arange(b.num_rows, dtype=np.int64)
            ),
        }
    )


def epoch_shuffle_rank(
    ds: rd.Dataset, *, id_col: str = "doc_id", seed: int = 0
) -> rd.Dataset:
    """(id, epoch_rank) — the seed's global shuffle order. Feed the
    output to a rank-range read (``epoch_rank BETWEEN a AND b``) to
    stream one worker's shard of the epoch."""
    mix = _seed_mix(seed)

    def key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (splitmix64(ids ^ mix) & _MASK63).astype(np.int64)
        return pa.table({id_col: t[id_col], "z": pa.array(z)})

    keyed = (
        ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["z", id_col])
        .materialize()
    )
    refs = keyed.to_arrow_refs()
    if not refs:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "epoch_rank": pa.array([], pa.int64()),
                }
            )
        )
    counts = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return rd.from_arrow_refs(
        [
            _attach_rank.remote(r, id_col, int(o))
            for r, o in zip(refs, offsets)
        ]
    )
