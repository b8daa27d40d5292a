"""Incremental exact dedup — filter a NEW corpus against a SEEN corpus.

The operator a continuously-crawled training-data pipeline runs daily:
the index holds up to 10^12 already-seen pages; today's crawl must keep
only novel text. (The reference has no analog — it indexes a static
corpus once, ``/root/reference/nlsh/indexer.py:27-60``; this is the
"build index -> probe with NEW data" half of that lifecycle re-expressed
for text dedup.) Two physical plans:

* **broadcast** (seen hash set bounded): per-batch unique
  (text_hash, text_hash2) partials stream to the driver, are
  pair-deduplicated once and broadcast (``ray.put``); the new corpus
  streams through one membership filter. Zero shuffles, and only 16 B
  per distinct seen text ever leaves a worker.
* **bloom** (the 10^12 regime): per-block partial Bloom bitmaps are
  OR-merged on the driver and broadcast (~2 GB for 10^9 keys at 16
  bits/key — OR-merge is associative, so a real cluster can tree-merge).
  Bloom NEGATIVES are definitely novel and never shuffle. Bloom
  POSITIVES (true dups + ~0.04% false positives) get an exact two-round
  raw-task hash-partition membership check; only the FALSE positives'
  doc ids (tiny: fp_rate x |new|) come back to the driver and are
  broadcast for the final pass. New-corpus text never enters a shuffle
  in either plan.

Dual-hash guard as in ``exact_stage``: a new doc is dropped only when
BOTH independent-multiplier hashes match a seen pair (~2^-126
residual) — a single-hash collision costs a kept duplicate
(recall-safe), never a lost novel document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.functions.nputil import lexsort2
from nlshray.stages.exact import _add_text_hash

# seen pair sets up to this size use the broadcast plan (16 B/pair ->
# ~800 MB at the limit); beyond it the bloom + partition-check plan runs
_BROADCAST_LIMIT = 50_000_000


def _unique_pairs(h: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lexicographically sorted unique (h, h2) pairs."""
    if h.shape[0] == 0:
        return h.astype(np.int64), h2.astype(np.int64)
    order = lexsort2(h2, h)
    h, h2 = h[order], h2[order]
    keep = np.concatenate([[True], (np.diff(h) != 0) | (np.diff(h2) != 0)])
    return h[keep], h2[keep]


def _hash_pair_partial(t: pa.Table) -> pa.Table:
    """Per-batch partial: unique (text_hash, text_hash2) pairs — the
    'pre-aggregate inside map_batches' pattern; cross-batch dedup
    happens at the driver merge (broadcast plan) or inside the bloom
    (idempotent OR)."""
    hashed = _add_text_hash(t)
    h, h2 = _unique_pairs(
        hashed["text_hash"].to_numpy(), hashed["text_hash2"].to_numpy()
    )
    return pa.table(
        {"text_hash": pa.array(h, pa.int64()), "text_hash2": pa.array(h2, pa.int64())}
    )


def _pair_membership(
    qh: np.ndarray, qh2: np.ndarray, H: np.ndarray, H2: np.ndarray
) -> np.ndarray:
    """Vectorized membership of query pairs in the sorted pair set.

    Duplicate text_hash runs in ``H`` exist only under a genuine 63-bit
    collision, so the per-row fallback loop is ~never taken."""
    out = np.zeros(qh.shape[0], dtype=bool)
    if H.shape[0] == 0 or qh.shape[0] == 0:
        return out
    lo = np.searchsorted(H, qh, "left")
    hi = np.searchsorted(H, qh, "right")
    one = (hi - lo) == 1
    out[one] = H2[lo[one]] == qh2[one]
    for i in np.flatnonzero((hi - lo) > 1):
        out[i] = bool((H2[lo[i] : hi[i]] == qh2[i]).any())
    return out


# ---------------------------------------------------------------------
# Bloom filter: packed uint64 words, Kirsch-Mitzenmacher double hashing
# idx_i = (h + i * h2) mod m over the two independent 63-bit hashes.
# ---------------------------------------------------------------------


def _bloom_params(n_keys: int, bits_per_key: int = 16) -> tuple[int, int]:
    """(m_bits [power of two], k hash probes) for ``n_keys`` keys."""
    m = 1 << max(10, int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    k = min(16, max(1, int(round(0.693 * m / max(n_keys, 1)))))
    return m, k


def _bloom_indices(h: np.ndarray, h2: np.ndarray, m_mask: np.uint64, i: int):
    with np.errstate(over="ignore"):
        return (
            h.astype(np.uint64) + np.uint64(i) * (h2.astype(np.uint64) | np.uint64(1))
        ) & m_mask


def _bloom_set(words: np.ndarray, h: np.ndarray, h2: np.ndarray, k: int) -> None:
    m_mask = np.uint64(words.shape[0] * 64 - 1)
    for i in range(k):
        idx = _bloom_indices(h, h2, m_mask, i)
        np.bitwise_or.at(
            words, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63))
        )


def _bloom_test(words: np.ndarray, h: np.ndarray, h2: np.ndarray, k: int) -> np.ndarray:
    """True where the pair MAY be present (all k bits set)."""
    m_mask = np.uint64(words.shape[0] * 64 - 1)
    maybe = np.ones(h.shape[0], dtype=bool)
    for i in range(k):
        idx = _bloom_indices(h[maybe], h2[maybe], m_mask, i)
        bit = (
            words[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63))
        ) & np.uint64(1)
        cur = np.flatnonzero(maybe)
        maybe[cur[bit == 0]] = False
        if not maybe.any():
            break
    return maybe


@ray.remote
def _bloom_of_block(block: pa.Table, n_words: int, k: int) -> np.ndarray:
    words = np.zeros(n_words, dtype=np.uint64)
    if block.num_rows:
        _bloom_set(
            words,
            block["text_hash"].to_numpy(),
            block["text_hash2"].to_numpy(),
            k,
        )
    return words


def _split_by_hash(h: np.ndarray, cols: list[np.ndarray], P: int):
    """Partition aligned columns by ``h % P`` (63-bit hashes: non-negative)."""
    part = (h % P).astype(np.int64)
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(1, P))
    return [np.split(c[order], cuts) for c in cols]


@ray.remote
def _shard_seen_pairs(block: pa.Table, P: int):
    if block.num_rows == 0:
        e = np.empty(0, np.int64)
        out = [(e, e)] * P
        return out[0] if P == 1 else tuple(out)
    h = block["text_hash"].to_numpy()
    h2 = block["text_hash2"].to_numpy()
    hs, h2s = _split_by_hash(h, [h, h2], P)
    out = [(hs[p], h2s[p]) for p in range(P)]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _shard_new_positives(block: pa.Table, words_ref, k: int, P: int):
    """Bloom-positive (hash, hash2, doc_id) rows of one NEW block,
    split by hash partition. ``words_ref`` is the broadcast bitmap
    (ObjectRef argument, auto-dereferenced zero-copy)."""
    if block.num_rows == 0:
        e = np.empty(0, np.int64)
        out = [(e, e, e)] * P
        return out[0] if P == 1 else tuple(out)
    hashed = _add_text_hash(block.select(["doc_id", "text"]))
    h = hashed["text_hash"].to_numpy()
    h2 = hashed["text_hash2"].to_numpy()
    d = hashed["doc_id"].to_numpy()
    pos = _bloom_test(words_ref, h, h2, k)
    h, h2, d = h[pos], h2[pos], d[pos]
    hs, h2s, ds = _split_by_hash(h, [h, h2, d], P)
    out = [(hs[p], h2s[p], ds[p]) for p in range(P)]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _novel_positive_ids(n_seen_parts: int, *parts) -> tuple[np.ndarray, int]:
    """Round B: one hash partition's exact membership check — returns
    (doc ids of bloom FALSE positives — novel despite a positive — and
    the partition's total bloom-positive count, for fp-rate accounting).
    ``parts`` = the partition's seen shards followed by its new shards
    (flat varargs so Ray auto-dereferences the shard refs in-task)."""
    seen_parts, new_parts = parts[:n_seen_parts], parts[n_seen_parts:]
    H = np.concatenate([p[0] for p in seen_parts])
    H2 = np.concatenate([p[1] for p in seen_parts])
    H, H2 = _unique_pairs(H, H2)
    qh = np.concatenate([p[0] for p in new_parts])
    qh2 = np.concatenate([p[1] for p in new_parts])
    qd = np.concatenate([p[2] for p in new_parts])
    if qh.shape[0] == 0:
        return np.empty(0, np.int64), 0
    fps = qd[~_pair_membership(qh, qh2, H, H2)].astype(np.int64)
    return fps, int(qh.shape[0])


def novel_docs(
    new: ray.data.Dataset,
    seen: ray.data.Dataset,
    *,
    broadcast_limit: int = _BROADCAST_LIMIT,
    bits_per_key: int = 16,
    num_partitions: int = 32,
    force_bloom: bool = False,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Rows of ``new`` whose ``text`` does not appear in ``seen``.

    Plan selection: broadcast while the seen pair set is bounded
    (``force_bloom=True`` exercises the scale plan at any size).

    ``stats_out``: optional dict filled with plan accounting — for the
    bloom plan: seen-set size, filter geometry (m_bits, k), total
    bloom positives among the new docs and how many of those were FALSE
    positives (rescued by the exact partition check), i.e. the measured
    fp rate the 10^12-regime plan pays.
    """
    seen_pairs = (
        seen.select_columns(["text"])
        .map_batches(
            _hash_pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()
    )
    n_seen = seen_pairs.count()

    if stats_out is not None:
        stats_out["n_seen_pairs"] = n_seen

    if not force_bloom and n_seen <= broadcast_limit:
        if stats_out is not None:
            stats_out["plan"] = "broadcast"
        hc, h2c = [], []
        for b in seen_pairs.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            hc.append(np.asarray(b["text_hash"]))
            h2c.append(np.asarray(b["text_hash2"]))
        H, H2 = _unique_pairs(
            np.concatenate(hc) if hc else np.empty(0, np.int64),
            np.concatenate(h2c) if h2c else np.empty(0, np.int64),
        )
        pairs_ref = ray.put((H, H2))

        def filt(t: pa.Table) -> pa.Table:
            HH, HH2 = ray.get(pairs_ref)
            hashed = _add_text_hash(t)
            hit = _pair_membership(
                hashed["text_hash"].to_numpy(),
                hashed["text_hash2"].to_numpy(),
                HH,
                HH2,
            )
            return t.filter(pa.array(~hit))

        return new.map_batches(
            filt, batch_format="pyarrow", zero_copy_batch=True
        )

    # ---- bloom plan ----
    m_bits, k = _bloom_params(n_seen, bits_per_key)
    n_words = m_bits >> 6
    seen_refs = seen_pairs.to_arrow_refs()
    words = np.zeros(n_words, dtype=np.uint64)
    for part in ray.get(
        [_bloom_of_block.remote(r, n_words, k) for r in seen_refs]
    ):
        np.bitwise_or(words, part, out=words)
    words_ref = ray.put(words)

    if not isinstance(new, ray.data.dataset.MaterializedDataset):
        new = new.materialize()
    new_refs = new.to_arrow_refs()
    P = num_partitions
    seen_shards = [
        _shard_seen_pairs.options(num_returns=P).remote(r, P)
        for r in seen_refs
    ]
    new_shards = [
        _shard_new_positives.options(num_returns=P).remote(r, words_ref, k, P)
        for r in new_refs
    ]
    if P == 1:
        seen_shards = [[r] for r in seen_shards]
        new_shards = [[r] for r in new_shards]
    novel_parts = ray.get(
        [
            _novel_positive_ids.remote(
                len(seen_shards),
                *[s[p] for s in seen_shards],
                *[s[p] for s in new_shards],
            )
            for p in range(P)
        ]
    )
    novel_ids = (
        np.unique(np.concatenate([o[0] for o in novel_parts]))
        if novel_parts
        else np.empty(0, np.int64)
    )
    if stats_out is not None:
        stats_out.update(
            plan="bloom",
            m_bits=m_bits,
            k=k,
            n_bloom_positives=sum(o[1] for o in novel_parts),
            n_false_positives=int(novel_ids.shape[0]),
        )
    ids_ref = ray.put(novel_ids)

    def final(t: pa.Table) -> pa.Table:
        keys = ray.get(ids_ref)
        hashed = _add_text_hash(t)
        pos = _bloom_test(
            ray.get(words_ref),
            hashed["text_hash"].to_numpy(),
            hashed["text_hash2"].to_numpy(),
            k,
        )
        ids = t["doc_id"].to_numpy()
        idx = np.searchsorted(keys, ids)
        idx = np.minimum(idx, max(keys.shape[0] - 1, 0))
        fp = keys[idx] == ids if keys.shape[0] else np.zeros(ids.shape[0], bool)
        return t.filter(pa.array(~pos | fp))

    return new.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
