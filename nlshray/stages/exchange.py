"""Two-round raw-task hash exchange over Arrow tables.

Ray Data's string-key ``groupby().aggregate()`` walks every tiny hash
group through Python (measured 25 s for a 5k-token vocabulary at 50k
pages); for combiner-bounded partial tables the same exchange is two
ordinary task rounds that never leave vectorized kernels:

  round A — one task per input block: build a block-local PARTIAL
    table (the combiner: ``value_counts`` etc.), hash its key column
    and split into P shards by ``hash % P``. Only partial rows move;
    corpus text never does.
  round B — one task per shard: concat the shard's partials from every
    block and merge with an exact kernel (Arrow C++ ``group_by`` sums
    by default, or any caller-supplied reducer). After the merge a
    shard holds the COMPLETE global rows for its keys, so key-local
    pruning (``min_count`` and the like) inside ``merge_fn`` is exact.

At cluster scale both rounds are plain Ray tasks: round A runs where
its input block lives, round B pulls only its own shard from each
block (P x B small objects) — the classic map-side-combine exchange.
``stages/lm.py`` keeps a specialized ndarray-tuple variant of this
plan for the open-vocabulary bigram regime (hundreds of millions of
keys), where Arrow table overhead per shard matters.

Used by `stages/bpe.py:word_type_counts`,
`stages/classifier.py:token_class_counts` and
`stages/cdc.py:cdc_chunk_dedup`.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray


@ray.remote
def _exchange_shard(
    block: pa.Table,
    partial_fn: Callable[[pa.Table], pa.Table],
    key_hash_fn: Callable[[pa.Table], np.ndarray],
    P: int,
):
    """Round A: block -> partial table -> P hash shards."""
    t = partial_fn(block)
    if len(t) == 0:
        empty = t.slice(0, 0)
        return empty if P == 1 else tuple(empty for _ in range(P))
    h = key_hash_fn(t)
    part = (h % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    out = [t.take(order[bounds[p] : bounds[p + 1]]) for p in range(P)]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _exchange_merge(
    merge_fn: Callable[[pa.Table], pa.Table], *shards: pa.Table
) -> pa.Table:
    """Round B: exact merge of one shard's partials from every block."""
    return merge_fn(pa.concat_tables(shards))


def hash_exchange(
    refs: list,
    partial_fn: Callable[[pa.Table], pa.Table],
    key_hash_fn: Callable[[pa.Table], np.ndarray],
    merge_fn: Callable[[pa.Table], pa.Table],
    nparts: int,
) -> list:
    """Run the exchange over materialized block refs.

    Returns one merged-table ObjectRef per shard ([] for no input);
    feed them to ``ray.data.from_arrow_refs`` to continue as a Dataset
    or ``ray.get`` them when the result is driver-small.
    """
    P = max(1, int(nparts))
    a_out = [
        _exchange_shard.options(num_returns=P).remote(
            r, partial_fn, key_hash_fn, P
        )
        for r in refs
    ]
    if P == 1:
        a_out = [[r] for r in a_out]
    return [
        _exchange_merge.remote(merge_fn, *[a_out[b][p] for b in range(len(a_out))])
        for p in range(P)
    ]


def _identity_table(t: pa.Table) -> pa.Table:
    """Round-A pass-through for exchanging already-partial tables."""
    return t


def grouped_sum_merge(key: str, sums: list[str]) -> Callable[[pa.Table], pa.Table]:
    """Standard round-B reducer: Arrow C++ group_by(key).sum(sums),
    column names preserved."""

    def merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select([key, *sums])
        g = pa.TableGroupBy(t, key).aggregate([(c, "sum") for c in sums])
        return g.rename_columns([key, *sums])

    return merge


def utf8_key_hash(key: str) -> Callable[[pa.Table], np.ndarray]:
    """Round-A key hasher for string key columns (vectorized 64-bit)."""

    def keyh(t: pa.Table) -> np.ndarray:
        from nlshray.hashing import hash_utf8_array

        return hash_utf8_array(t[key])

    return keyh


def int64_key_hash(key: str) -> Callable[[pa.Table], np.ndarray]:
    """Round-A key hasher for int64 key columns (bit-pattern view)."""

    def keyh(t: pa.Table) -> np.ndarray:
        return t[key].to_numpy(zero_copy_only=False).view(np.uint64)

    return keyh
