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
    seen: ray.data.Dataset | None = None,
    *,
    seen_pairs: ray.data.Dataset | None = None,
    broadcast_limit: int = _BROADCAST_LIMIT,
    bits_per_key: int = 16,
    num_partitions: int = 32,
    force_bloom: bool = False,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Rows of ``new`` whose ``text`` does not appear in ``seen``.

    Plan selection: broadcast while the seen pair set is bounded
    (``force_bloom=True`` exercises the scale plan at any size).

    ``seen_pairs``: optional precomputed (text_hash, text_hash2) table
    (unique per block — ``_hash_pair_partial`` output, e.g. reloaded
    from a persisted seen index) used INSTEAD of hashing ``seen`` —
    the daily-run path where the seen corpus's text is never re-read.

    ``stats_out``: optional dict filled with plan accounting — for the
    bloom plan: seen-set size, filter geometry (m_bits, k), total
    bloom positives among the new docs and how many of those were FALSE
    positives (rescued by the exact partition check), i.e. the measured
    fp rate the 10^12-regime plan pays.
    """
    if seen_pairs is None:
        if seen is None:
            raise ValueError("need either seen or seen_pairs")
        seen_pairs = seen.select_columns(["text"]).map_batches(
            _hash_pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    if not isinstance(seen_pairs, ray.data.dataset.MaterializedDataset):
        seen_pairs = seen_pairs.materialize()
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


# ---------------------------------------------------------------------
# Incremental NEAR-dup: filter a NEW corpus against a SEEN corpus at
# shingle-Jaccard >= threshold (the cross-snapshot MinHash/LSH probe a
# daily crawl runs after the exact filter above). The seen side plays
# the reference's static index role (/root/reference/nlsh/indexer.py:
# 27-60 builds hash buckets once, queries probe them); here the "index"
# is the seen reps' band rows, co-partitioned with the new side's by
# band-hash — candidates are NEW x SEEN bucket collisions only (never
# seen x seen: the seen corpus was already deduped when it was built).
# ---------------------------------------------------------------------


def _emit_cross_pairs(
    bh_n: np.ndarray,
    id_n: np.ndarray,
    bh_s: np.ndarray,
    id_s: np.ndarray,
    cap: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """new x seen pairs from one partition's COMPLETE tagged band rows.

    Python touches only buckets present on BOTH sides (a small
    minority). Skew cap: each side's bucket membership is truncated to
    its ``cap`` smallest rep ids (deterministic) with forgone-pair
    accounting — mirrors ``pairs._emit_bucket_pairs``.

    Returns (lefts[new], rights[seen], hot bucket sizes, pairs_forgone).
    """
    e = np.empty(0, np.int64)
    if bh_n.shape[0] == 0 or bh_s.shape[0] == 0:
        return e, e, e, 0
    on = lexsort2(id_n, bh_n)
    bh_n, id_n = bh_n[on], id_n[on]
    os_ = lexsort2(id_s, bh_s)
    bh_s, id_s = bh_s[os_], id_s[os_]
    kn = bh_n[np.concatenate([[True], np.diff(bh_n) != 0])]
    ks = bh_s[np.concatenate([[True], np.diff(bh_s) != 0])]
    common = np.intersect1d(kn, ks)
    if common.shape[0] == 0:
        return e, e, e, 0
    lo_n = np.searchsorted(bh_n, common, "left")
    hi_n = np.searchsorted(bh_n, common, "right")
    lo_s = np.searchsorted(bh_s, common, "left")
    hi_s = np.searchsorted(bh_s, common, "right")
    cn, cs = hi_n - lo_n, hi_s - lo_s
    # vectorized fast path: 1x1 buckets (the overwhelmingly common case
    # — within a bucket each doc appears once, a band row is unique per
    # (band, doc)); Python touches only multi-member buckets
    single = (cn == 1) & (cs == 1)
    lefts = [id_n[lo_n[single]]]
    rights = [id_s[lo_s[single]]]
    sizes: list = []
    forgone = 0
    for j in np.flatnonzero(~single):
        a = id_n[lo_n[j] : hi_n[j]]
        b = id_s[lo_s[j] : hi_s[j]]
        sizes.append(a.shape[0] + b.shape[0])
        if a.shape[0] > cap or b.shape[0] > cap:
            forgone += int(a.shape[0]) * int(b.shape[0]) - min(
                int(a.shape[0]), cap
            ) * min(int(b.shape[0]), cap)
            a, b = a[:cap], b[:cap]
        lefts.append(np.repeat(a, b.shape[0]))
        rights.append(np.tile(b, a.shape[0]))
    return (
        np.concatenate(lefts),
        np.concatenate(rights),
        np.asarray(sizes, dtype=np.int64),
        forgone,
    )


@ray.remote
def _cross_pairs_part(n_new_chunks: int, cap: int, P2: int, *chunks):
    """Round B (cross-side): one band-hash partition -> new x seen
    candidate pairs, pre-split by pair-key hash for the round-C dedup
    (same output shape as ``pairs._bucket_pairs_part``)."""
    from nlshray.hashing import splitmix64

    new_chunks = chunks[:n_new_chunks]
    seen_chunks = chunks[n_new_chunks:]
    e = np.empty(0, np.int64)
    bh_n = np.concatenate([c[0] for c in new_chunks]) if new_chunks else e
    id_n = np.concatenate([c[1] for c in new_chunks]) if new_chunks else e
    bh_s = np.concatenate([c[0] for c in seen_chunks]) if seen_chunks else e
    id_s = np.concatenate([c[1] for c in seen_chunks]) if seen_chunks else e
    lefts, rights, sizes, forgone = _emit_cross_pairs(
        bh_n, id_n, bh_s, id_s, cap
    )
    key = splitmix64(
        (lefts.astype(np.uint64) << np.uint64(32)) ^ rights.astype(np.uint64)
    )
    part = (key % np.uint64(P2)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    l_s, r_s, part_s = lefts[order], rights[order], part[order]
    cuts = np.searchsorted(part_s, np.arange(1, P2))
    l_parts = np.split(l_s, cuts)
    r_parts = np.split(r_s, cuts)
    out = [(sizes, forgone)] + [(l, r) for l, r in zip(l_parts, r_parts)]
    return tuple(out)


def cross_candidate_pairs(
    sigs_new: ray.data.Dataset,
    sigs_seen: ray.data.Dataset,
    cfg,
    *,
    num_partitions: int = 32,
):
    """NEW x SEEN LSH candidate pairs (left_id=new rep, right_id=seen
    rep, n_bands) as a raw-task shuffle: round A shards each side's
    band rows by band-hash (banding folded in, as in the flagship's
    scale plan), round B emits cross pairs per partition, round C
    cross-band-dedups per pair-key partition. Only 18-byte band rows
    and 16-byte pairs ever move."""
    from functools import partial

    from nlshray.stages.band import band_rows_of_block
    from nlshray.stages.pairs import (
        PairStats,
        _dedup_pairs_part,
        _empty_pairs,
        _fill_stats,
        _shard_rows,
    )

    stats = PairStats()
    P = P2 = max(1, num_partitions)
    source_fn = partial(
        band_rows_of_block,
        bands=cfg.bands,
        r=cfg.rows_per_band,
        num_perms=cfg.num_perms,
    )
    new_refs = sigs_new.to_arrow_refs()
    seen_refs = sigs_seen.to_arrow_refs()
    if not new_refs or not seen_refs:
        return _empty_pairs(), stats
    a_new = [
        _shard_rows.options(num_returns=P).remote(r, source_fn, P)
        for r in new_refs
    ]
    a_seen = [
        _shard_rows.options(num_returns=P).remote(r, source_fn, P)
        for r in seen_refs
    ]
    if P == 1:
        a_new = [[r] for r in a_new]
        a_seen = [[r] for r in a_seen]
    cap = cfg.group_cap
    b_out = [
        _cross_pairs_part.options(num_returns=P2 + 1).remote(
            len(a_new),
            cap,
            P2,
            *[a_new[i][p] for i in range(len(a_new))],
            *[a_seen[i][p] for i in range(len(a_seen))],
        )
        for p in range(P)
    ]
    c_refs = [
        _dedup_pairs_part.remote(*[b_out[p][1 + q] for p in range(P)])
        for q in range(P2)
    ]
    heads = ray.get([b_out[p][0] for p in range(P)])
    sizes = (
        np.concatenate([h[0] for h in heads])
        if heads
        else np.empty(0, np.int64)
    )
    stats.n_buckets_hot = int(sizes.shape[0])
    _fill_stats(stats, sizes, cap, "star")
    stats.pairs_forgone = sum(h[1] for h in heads)
    return ray.data.from_arrow_refs(c_refs), stats


def build_seen_index(
    seen: ray.data.Dataset,
    cfg=None,
    index_dir: str | None = None,
    *,
    num_partitions: int = 32,
) -> dict:
    """Persist the SEEN side of the incremental near-dup probe — the
    reference's build-index-once half of its lifecycle
    (``/root/reference/nlsh/indexer.py:27-60``) as three parquet tables
    under ``index_dir``:

    * ``seen_hashes/`` — per-block-unique (text_hash, text_hash2) pairs
      (the exact filter's input),
    * ``seen_reps/``   — (doc_id, text) of each unique text (verify's
      borderline gathers),
    * ``seen_sigs/``   — (doc_id, sig) MinHash signatures of the reps.

    A daily run then probes with ``novel_docs_near(new,
    seen_index_dir=...)`` and NEVER re-reads or re-signs the seen
    corpus. Growing the index after a run = appending the accepted novel
    docs' partials (all three tables are unioned-by-concatenation;
    per-block uniqueness is preserved by construction). Returns a
    manifest dict (also written as ``manifest.json``) whose
    ``config_hash`` guards against probing with a mismatched config."""
    import json as _json
    import os

    from nlshray.config import DedupConfig
    from nlshray.stages.exact import exact_stage, reps_only
    from nlshray.stages.sign import sign_stage

    cfg = cfg or DedupConfig()
    os.makedirs(index_dir, exist_ok=True)
    pairs = seen.select_columns(["text"]).map_batches(
        _hash_pair_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs.write_parquet(os.path.join(index_dir, "seen_hashes"))
    seen_rep = exact_stage(seen, num_partitions=num_partitions)
    reps = reps_only(seen_rep).select_columns(["doc_id", "text"])
    reps.write_parquet(os.path.join(index_dir, "seen_reps"))
    sigs = sign_stage(reps, cfg)
    sigs.write_parquet(os.path.join(index_dir, "seen_sigs"))
    manifest = {
        "config_hash": cfg.config_hash(),
        "n_seen_reps": sigs.count(),
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        _json.dump(manifest, f)
    return manifest


def _load_seen_index(index_dir: str, cfg) -> tuple:
    import json as _json
    import os

    from nlshray.sources.pages import read_parquet_clean

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = _json.load(f)
    if manifest["config_hash"] != cfg.config_hash():
        raise ValueError(
            "seen index was built with a different config "
            f"({manifest['config_hash']} != {cfg.config_hash()}); rebuild"
        )
    return (
        read_parquet_clean(os.path.join(index_dir, "seen_hashes")),
        read_parquet_clean(os.path.join(index_dir, "seen_reps")),
        read_parquet_clean(os.path.join(index_dir, "seen_sigs")),
    )


def novel_docs_near(
    new: ray.data.Dataset,
    seen: ray.data.Dataset | None = None,
    cfg=None,
    *,
    seen_index_dir: str | None = None,
    num_partitions: int = 32,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Rows of ``new`` with NO doc in ``seen`` at shingle-set Jaccard
    >= ``cfg.threshold`` (an exact text match counts as Jaccard 1.0).

    Plan: exact filter (``novel_docs``) -> per-side exact-dup collapse
    (sign only unique texts) -> MinHash sign both rep sets -> cross-side
    band-bucket candidates (``cross_candidate_pairs``) -> the flagship's
    ``verify_stage`` over the union (est + borderline-exact; symmetric
    in the pair, so orientation is irrelevant) -> matched NEW rep ids
    broadcast -> one filter pass. The matched-id broadcast is bounded by
    the number of near-dup NEW docs (not by |seen|); at 10^12-seen scale
    the seen side contributes only band rows to the shuffle and its text
    is touched only for verify's borderline gathers.

    ``seen_index_dir``: probe a persisted seen index
    (``build_seen_index``) instead of recomputing the seen side — the
    daily-run path: the seen corpus's text/hashes/signatures stream from
    parquet and are never recomputed.

    Requires ``doc_id`` unique ACROSS both inputs (snapshot-prefixed ids
    upstream; the two sides meet in one verify id-space).
    """
    from nlshray.config import DedupConfig
    from nlshray.stages.exact import exact_stage, reps_only
    from nlshray.stages.sign import sign_stage
    from nlshray.stages.verify import verify_stage

    cfg = cfg or DedupConfig()
    P = num_partitions
    if seen_index_dir is not None:
        seen_pairs, reps_s, sigs_s = _load_seen_index(seen_index_dir, cfg)
        sigs_s = sigs_s.materialize()
        new_x = novel_docs(
            new, seen_pairs=seen_pairs, num_partitions=P,
            stats_out=stats_out,
        ).materialize()
    else:
        if seen is None:
            raise ValueError("need either seen or seen_index_dir")
        new_x = novel_docs(
            new, seen, num_partitions=P, stats_out=stats_out
        ).materialize()
    if new_x.count() == 0:
        return new_x

    new_rep = exact_stage(new_x, num_partitions=P)
    reps_n = reps_only(new_rep).select_columns(["doc_id", "text"])
    sigs_n = sign_stage(reps_n, cfg).materialize()
    if seen_index_dir is None:
        seen_rep = exact_stage(seen, num_partitions=P)
        reps_s = reps_only(seen_rep).select_columns(["doc_id", "text"])
        sigs_s = sign_stage(reps_s, cfg).materialize()

    cand, pair_stats = cross_candidate_pairs(
        sigs_n, sigs_s, cfg, num_partitions=P
    )
    if not isinstance(cand, ray.data.dataset.MaterializedDataset):
        cand = cand.materialize()
    if stats_out is not None:
        stats_out["n_cross_candidates"] = cand.count()
        stats_out["pairs_forgone"] = pair_stats.pairs_forgone

    if cand.count() == 0:
        matched = np.empty(0, np.int64)
    else:
        confirmed = verify_stage(
            cand,
            sigs_n.union(sigs_s),
            reps_n.union(reps_s),
            cfg,
            num_partitions=P,
        )
        mc = []
        for b in confirmed.select_columns(["left_id"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            mc.append(np.asarray(b["left_id"]))
        matched = (
            np.unique(np.concatenate(mc)) if mc else np.empty(0, np.int64)
        )
    if stats_out is not None:
        stats_out["n_matched_new_reps"] = int(matched.shape[0])

    keep_cols = new.schema().names
    matched_ref = ray.put(matched)

    def filt(t: pa.Table) -> pa.Table:
        m = ray.get(matched_ref)
        rep = t["rep_id"].to_numpy()
        idx = np.searchsorted(m, rep)
        idx = np.minimum(idx, max(m.shape[0] - 1, 0))
        hit = m[idx] == rep if m.shape[0] else np.zeros(rep.shape[0], bool)
        return t.filter(pa.array(~hit)).select(keep_cols)

    return new_rep.map_batches(
        filt, batch_format="pyarrow", zero_copy_batch=True
    )
