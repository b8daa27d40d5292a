"""Grouped top-k and stratified sampling — combiner-style wide ops.

Neither needs a global sort or a groupby shuffle: a per-block partial
(top-k per group inside ``map_batches`` — the 'pre-aggregate inside
map_batches' pattern) leaves at most ``k x n_groups`` rows per block,
and a single coalesced final combine applies the same kernel once.
Correct because top-k is a semigroup: topk(A ∪ B) = topk(topk(A) ∪
topk(B)). At 10^12 docs with few strata this is two streaming passes
and zero all-to-all shuffles (contrast ``Dataset.sort`` which moves
every row).

Stratified sampling selects an exact per-group quota — the
``ceil(fraction x group_size)`` docs with the smallest
``splitmix64(doc_id ^ seed)`` — so the sample is a pure function of
(ids, seed, fraction): parallelism-independent, resumable, and
SQL-replayable (unlike ``Dataset.random_sample`` whose RNG stream is
block-dependent). Group sizes come from the same partial pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.hashing import _seed_mix, splitmix64


def _group_codes(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Dense integer codes for a (string) group column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    return np.asarray(enc.indices, dtype=np.int64)


def _rank_in_group(
    codes: np.ndarray, order_key: np.ndarray, tie: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted row order, rank within group) under
    (group, order_key ASC, tie ASC) — three stable argsorts."""
    o = np.argsort(tie, kind="stable")
    o = o[np.argsort(order_key[o], kind="stable")]
    o = o[np.argsort(codes[o], kind="stable")]
    c = codes[o]
    starts = (
        np.concatenate([[0], np.flatnonzero(np.diff(c)) + 1])
        if c.shape[0]
        else np.empty(0, np.int64)
    )
    rank = np.arange(c.shape[0], dtype=np.int64)
    if c.shape[0]:
        rank -= np.repeat(starts, np.diff(np.concatenate([starts, [c.shape[0]]])))
    return o, rank


def _topk_kernel(
    t: pa.Table,
    *,
    group_col: str,
    order_col: str,
    k: int,
    ascending: bool,
    tie_col: str,
) -> pa.Table:
    if t.num_rows == 0:
        return t
    codes = _group_codes(t[group_col])
    key = t[order_col].to_numpy().astype(np.float64)
    if not ascending:
        key = -key
    o, rank = _rank_in_group(codes, key, t[tie_col].to_numpy())
    keep_rows = o[rank < k]
    return t.take(pa.array(np.sort(keep_rows)))


def grouped_topk(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tie_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k rows per group under (order_col, tie_col) — deterministic."""
    kw = dict(
        group_col=group_col,
        order_col=order_col,
        k=k,
        ascending=ascending,
        tie_col=tie_col,
    )
    partial = ds.map_batches(
        _topk_kernel, fn_kwargs=kw, batch_format="pyarrow", zero_copy_batch=True
    )
    # partials are <= k x n_groups per block: coalesce and combine once
    return partial.repartition(1).map_batches(
        _topk_kernel, fn_kwargs=kw, batch_format="pyarrow", zero_copy_batch=True
    )


def _hash_order(ids: np.ndarray, seed: int) -> np.ndarray:
    # stays uint64: a float64 cast could collapse near-equal keys and
    # reorder vs the exact-integer order the SQL oracle uses
    return splitmix64(ids.astype(np.uint64) ^ _seed_mix(seed))


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    fraction: float,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exactly ``ceil(fraction x group_size)`` rows per group — the ones
    with the smallest ``splitmix64(id ^ seed)``.

    Pass 1 (tiny): per-block partial group counts -> driver combine ->
    per-group quotas. Pass 2: grouped top-quota by hash order (partial +
    one combine). Group count is assumed small (strata like language /
    domain / shard — the stratification use case).
    """

    def counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        codes = _group_codes(t[group_col])
        enc = t[group_col].combine_chunks().dictionary_encode()
        n = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {group_col: enc.dictionary, "n": pa.array(n.astype(np.int64))}
        )

    agg: dict[str, int] = {}
    for b in ds.select_columns([group_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for g, n in zip(b[group_col].to_pylist(), b["n"].to_pylist()):
            agg[g] = agg.get(g, 0) + int(n)
    quota = {g: int(np.ceil(fraction * n)) for g, n in agg.items()}

    def sample_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        codes = _group_codes(t[group_col])
        enc = t[group_col].combine_chunks().dictionary_encode()
        ks = np.array(
            [quota.get(g, 0) for g in enc.dictionary.to_pylist()], np.int64
        )
        key = _hash_order(t[id_col].to_numpy(), seed)
        o, rank = _rank_in_group(codes, key, t[id_col].to_numpy())
        keep_rows = o[rank < ks[codes[o]]]
        return t.take(pa.array(np.sort(keep_rows)))

    partial = ds.map_batches(
        sample_kernel, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.repartition(1).map_batches(
        sample_kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def capped_sample(
    ds: ray.data.Dataset,
    group_col: str,
    cap: int,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """At most ``cap`` rows per group — the ones with the smallest
    ``splitmix64(id ^ seed)`` (ties on id). The per-domain quota op of a
    web-corpus mixer ("no more than N pages from any one host").

    Unlike ``stratified_sample`` this needs NO counting pre-pass: the
    quota is a constant, so it is one grouped-top-k — per-block partials
    then a single combine, parallelism-independent and SQL-replayable."""

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_hkey", pa.array(_hash_order(t[id_col].to_numpy(), seed))
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(
        keyed, group_col, "_hkey", cap, ascending=True, tie_col=id_col
    )
    return out.drop_columns(["_hkey"])


def assign_splits(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    *,
    fractions: tuple[float, float] = (0.8, 0.1),
    seed: int = 42,
) -> ray.data.Dataset:
    """Deterministic train/valid/test assignment by hash threshold:
    split(id) = f(splitmix64(id ^ seed)) — a pure function of (id,
    seed, fractions), so the split is stable across reruns, resumes,
    corpus growth (a doc keeps its split when new docs arrive) and any
    parallelism. ``fractions`` are (train, valid); test gets the rest.
    The same contract as ``sampled_docs``'s hash-threshold sampling,
    extended to a partition of the corpus. Fractions summing to 1.0
    (a two-way split with no test bucket) are legal: a threshold at or
    above 2^64 compares as always-true instead of overflowing uint64."""
    t1 = int(fractions[0] * float(2**64))
    t2 = int((fractions[0] + fractions[1]) * float(2**64))
    mix = _seed_mix(seed)
    names = np.array(["train", "valid", "test"])

    def _below(z: np.ndarray, t: int) -> np.ndarray:
        if t >= 2**64:
            return np.ones(z.shape[0], bool)
        return z < np.uint64(max(t, 0))

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        z = splitmix64(ids ^ mix)
        idx = np.where(_below(z, t1), 0, np.where(_below(z, t2), 1, 2))
        return t.append_column("split", pa.array(names[idx], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: ray.data.Dataset,
    weight_col: str,
    k: int,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis
    A-ES (2006): each row's sort key is ``-ln(u)/w`` with ``u`` a
    (0,1] uniform DERIVED from ``splitmix64(id ^ seed)`` (top 53 bits,
    +1 so u is never 0); the ``k`` smallest keys are exactly a
    weight-proportional without-replacement sample. The key is a pure
    function of (id, seed, weight) — parallelism-independent,
    resumable, and SQL-replayable (the oracle recomputes the same
    splitmix chain in HUGEINT and the same ``-ln(((z>>11)+1)/2^53)/w``
    key; the mixture-building use case: sample docs proportional to
    quality/length for a training mix).

    Same two-phase plan as ``stratified_sample``: per-block partial
    top-k (at most k rows leave any block), one coalesced final
    combine — zero all-to-all shuffles. Weights must be positive;
    nonpositive-weight rows are excluded (they'd carry infinite keys).
    """

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t[id_col].to_numpy()
        z = splitmix64(ids.astype(np.uint64) ^ _seed_mix(seed))
        u = ((z >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        w = t[weight_col].to_numpy().astype(np.float64)
        key = np.where(w > 0, -np.log(u) / np.maximum(w, 1e-300), np.inf)
        order = np.lexsort((ids, key))
        order = order[np.isfinite(key[order])][:k]
        return t.take(pa.array(np.sort(order)))

    partial = ds.map_batches(
        kern, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.repartition(1).map_batches(
        kern, batch_format="pyarrow", zero_copy_batch=True
    )


def weighted_sample_grouped(
    ds: ray.data.Dataset,
    group_col: str,
    weight_col: str,
    k: int,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-group A-ES weighted sampling without replacement: within
    each group, the ``k`` rows with the smallest ``-ln(u)/w`` keys
    (u derived from ``splitmix64(id ^ seed)`` exactly as
    ``weighted_sample``) — the per-stratum mixture builder (e.g. k
    quality-weighted docs PER LANGUAGE). Same two-phase partial-top-k
    plan; keys are pure functions of (id, seed, weight), so the
    sample is parallelism-independent and SQL-replayable.
    Nonpositive-weight rows are excluded.
    """

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t[id_col].to_numpy()
        z = splitmix64(ids.astype(np.uint64) ^ _seed_mix(seed))
        u = ((z >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        w = t[weight_col].to_numpy().astype(np.float64)
        key = np.where(w > 0, -np.log(u) / np.maximum(w, 1e-300), np.inf)
        codes = _group_codes(t[group_col])
        o, rank = _rank_in_group(codes, key, ids)
        keep = o[(rank < k) & np.isfinite(key[o])]
        return t.take(pa.array(np.sort(keep)))

    partial = ds.map_batches(
        kern, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.repartition(1).map_batches(
        kern, batch_format="pyarrow", zero_copy_batch=True
    )
