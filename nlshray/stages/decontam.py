"""Benchmark decontamination: flag training docs that share a k-token
n-gram with a held-out evaluation set.

The standard pre-training hygiene pass (the "13-gram overlap" rule of
GPT-3 appendix C / PaLM §6; here parameterized ``k``): any document
containing a token n-gram that also occurs in an eval benchmark is
contaminated and must be dropped or flagged. Structurally this is the
same gather-then-probe shape as the engine's incremental dedup
(``nlshray/stages/incremental.py``): a SMALL reference side is indexed
once and broadcast; the BIG side streams through ``map_batches`` and
probes locally — no shuffle of the corpus, text never leaves its block.

Tokenization and hashing reuse the engine's one token definition
(``functions/shingles.py:43``) and 64-bit window fold
(``hashing.shingle_hashes``), so the SQL oracle can replay the whole
operator on the actual n-gram *strings* — a hash collision would fail
the oracle.

100-TB posture: the eval side is benchmark-sized (10^5..10^7 n-grams —
MMLU/GSM8K-scale), so a sorted uint64 array broadcast via ``ray.put``
(8 B/gram) is exact membership at ~80 MB for 10^7 grams; beyond that
the Bloom + exact-partition-check plan of ``incremental.py:96`` applies
unchanged. The corpus side is one streaming pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from nlshray.functions.shingles import batch_token_hashes, segmented_unique
from nlshray.hashing import _POLY, splitmix64


def batch_kgram_hashes(
    texts, k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """STRICT k-gram hashes per doc: docs with fewer than k tokens get
    zero grams (unlike ``batch_shingle_hashes``, which falls back to
    whole-doc shingles for MinHash recall — decontamination wants the
    literal benchmark-overlap semantics)."""
    th, counts = batch_token_hashes(texts, seed=seed)
    n_docs = counts.shape[0]
    out_lengths = np.maximum(counts - k + 1, 0).astype(np.int64)
    total = int(out_lengths.sum())
    if total == 0:
        return np.empty(0, np.uint64), out_lengths
    m = th.shape[0]
    W = m - k + 1
    acc = np.zeros(W, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            acc = acc * _POLY + th[i : W + i]
    wh = splitmix64(acc)
    # keep only windows fully inside one document (delta-mask over the
    # flat token array — same trick as batch_shingle_hashes' long branch)
    doc_ends = np.cumsum(counts)
    doc_starts = doc_ends - counts
    delta = np.zeros(W + 1, dtype=np.int64)
    long_mask = counts >= k
    ls = doc_starts[long_mask]
    np.add.at(delta, ls, 1)
    np.add.at(delta, ls + counts[long_mask] - k + 1, -1)
    valid = np.cumsum(delta[:-1]) > 0
    return wh[valid], out_lengths


def eval_ngram_set(eval_ds: rd.Dataset, k: int, seed: int = 0) -> np.ndarray:
    """Sorted-unique uint64 n-gram hashes of the (small) eval side.

    Per-block dedup inside ``map_batches``; the driver merges only the
    already-unique per-block arrays (benchmark-sized by contract — see
    module docstring for the >10^7-gram plan)."""

    def grams(t: pa.Table) -> pa.Table:
        flat, _ = batch_kgram_hashes(t["text"], k, seed=seed)
        return pa.table({"gram": pa.array(np.unique(flat))})

    parts = eval_ds.map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.array([r["gram"] for r in parts], dtype=np.uint64))


def decontam_stage(
    docs: rd.Dataset,
    eval_grams: np.ndarray,
    k: int,
    seed: int = 0,
    is_eval_fn=None,
) -> rd.Dataset:
    """Probe every doc's distinct k-grams against the broadcast eval set.

    Emits ``doc_id, is_eval, n_overlap, contaminated`` — ``n_overlap``
    counts DISTINCT overlapping grams (a doc repeating one leaked gram
    ten times is one overlap). ``is_eval_fn(doc_id_array) -> bool mask``
    marks the eval members themselves (never "contaminated")."""
    ev_ref = ray.put(np.ascontiguousarray(eval_grams, dtype=np.uint64))

    def probe(t: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        flat, lens = batch_kgram_hashes(t["text"], k, seed=seed)
        uflat, ulens = segmented_unique(flat, lens)
        if ev.size and uflat.size:
            idx = np.searchsorted(ev, uflat)
            hit = (idx < ev.size) & (ev[np.minimum(idx, ev.size - 1)] == uflat)
        else:
            hit = np.zeros(uflat.shape[0], dtype=bool)
        ends = np.cumsum(ulens)
        cs = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        n_overlap = cs[ends] - cs[ends - ulens]
        did = t["doc_id"].to_numpy()
        is_eval = (
            is_eval_fn(did)
            if is_eval_fn is not None
            else np.zeros(did.shape[0], dtype=bool)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "is_eval": pa.array(is_eval),
                "n_overlap": pa.array(n_overlap),
                "contaminated": pa.array((n_overlap > 0) & ~is_eval),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def _gram_nd_partial(t: pa.Table, k: int, seed: int) -> pa.Table:
    """Per-block distinct-doc count partial: (gram, nd) int64 rows."""
    flat, lens = batch_kgram_hashes(t["text"], k, seed=seed)
    uflat, _ = segmented_unique(flat, lens)
    g, c = np.unique(uflat, return_counts=True)
    return pa.table(
        {
            "gram": pa.array(g.view(np.int64)),
            "nd": pa.array(c.astype(np.int64)),
        }
    )


def _keep_dup_grams(t: pa.Table) -> np.ndarray:
    """Merge one shard's partials and keep grams with >= 2 distinct
    docs — returns the shard's dup grams as a uint64 array (tiny)."""
    if len(t) == 0:
        return np.empty(0, np.uint64)
    g = t["gram"].to_numpy(zero_copy_only=False).view(np.uint64)
    nd = t["nd"].to_numpy(zero_copy_only=False)
    order = np.argsort(g, kind="stable")
    sg, snd = g[order], nd[order]
    starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
    sums = np.add.reduceat(snd, starts)
    return sg[starts][sums >= 2]


def _gram_cnt_partial(t: pa.Table, k: int, seed: int) -> pa.Table:
    """Per-block OCCURRENCE count partial: (gram, cnt) int64 rows."""
    flat, _ = batch_kgram_hashes(t["text"], k, seed=seed)
    g, c = np.unique(flat, return_counts=True)
    return pa.table(
        {
            "gram": pa.array(g.view(np.int64)),
            "cnt": pa.array(c.astype(np.int64)),
        }
    )


def _keep_repeated_grams(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Merge one shard's partials; return (grams, counts) with global
    occurrence count >= 2 (hapaxes never leave the shard)."""
    if len(t) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    g = t["gram"].to_numpy(zero_copy_only=False).view(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(g, kind="stable")
    sg, sc = g[order], c[order]
    starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
    sums = np.add.reduceat(sc, starts)
    keep = sums >= 2
    return sg[starts][keep], sums[keep].astype(np.int64)


def dup_gram_sorted_ref(
    docs: rd.Dataset, *, k: int, num_partitions: int = 8, seed: int = 0
):
    """ObjectRef of the SORTED uint64 window-hash set occurring in >= 2
    distinct docs — the shared pass behind ``duplicate_span_stats`` and
    ``exact_substring_dedup``: (A) per-block distinct (doc, gram)
    partials, hash-exchanged on gram (`stages/exchange.py` — the same
    shuffle bound as the vocabulary op: gram cardinality); (B) each
    shard's complete global counts filtered to >= 2 distinct docs and
    broadcast once. 100-TB caveat:
    the dup-gram set is corpus-dependent — boilerplate-heavy corpora
    can make it too big to broadcast, in which case pass B becomes the
    hash-partitioned semi-join of ``incremental.py``'s scale plan;
    disclosed, not silent."""
    from functools import partial as fpartial

    from nlshray.stages.exchange import hash_exchange, int64_key_hash

    refs = docs.select_columns(["text"]).to_arrow_refs()
    if not refs:
        return ray.put(np.empty(0, np.uint64))
    # round B returns ONLY the dup grams (count >= 2 on complete global
    # counts per shard); the Dataset Aggregate this replaced walks each
    # of the ~23M mostly-distinct gram groups in Python — measured
    # 146 s at 50k pages vs ~4 s for these two task rounds
    b_out = hash_exchange(
        refs,
        fpartial(_gram_nd_partial, k=k, seed=seed),
        int64_key_hash("gram"),
        _keep_dup_grams,
        num_partitions,
    )
    shards = [s for s in ray.get(b_out) if s.size]
    dup_grams = np.concatenate(shards) if shards else np.empty(0, np.uint64)
    return ray.put(np.sort(dup_grams))


def duplicate_span_stats(
    docs: rd.Dataset, *, k: int = 8, num_partitions: int = 8, seed: int = 0
) -> rd.Dataset:
    """Per-doc INTRA-corpus duplicate-span signal (the C4-style
    repeated-span hygiene report): for each doc, how many of its
    distinct k-token spans also occur in at least one OTHER doc.

    Plan: the shared dup-gram broadcast (``dup_gram_sorted_ref``) plus
    one more streaming pass counting each doc's members. Output:
    (doc_id, n_spans, n_dup_spans) — all integers, so the SQL oracle
    needs no float rounding anywhere."""
    from nlshray.functions.nputil import isin_sorted, segment_ids

    dup_ref = dup_gram_sorted_ref(
        docs, k=k, num_partitions=num_partitions, seed=seed
    )

    def per_doc(t: pa.Table) -> pa.Table:
        dup_sorted = ray.get(dup_ref)
        flat, lens = batch_kgram_hashes(t["text"], k, seed=seed)
        uflat, ulens = segmented_unique(flat, lens)
        seg = segment_ids(ulens)
        hit = isin_sorted(dup_sorted, uflat)
        n_dup = np.bincount(seg[hit], minlength=ulens.shape[0])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pa.array(ulens.astype(np.int64)),
                "n_dup_spans": pa.array(n_dup.astype(np.int64)),
            }
        )

    return docs.map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )


def gram_frequency_stats(
    docs: rd.Dataset, *, k: int = 2, num_partitions: int = 8, seed: int = 0
) -> rd.Dataset:
    """Per-doc corpus-frequency signal (the integer-exact core of a
    CCNet-style LM quality filter): for each doc, its k-token-gram
    OCCURRENCES, the sum of each occurrence's global corpus frequency,
    and how many of its occurrences are corpus hapaxes (frequency 1).
    Low ``freq_sum / n_grams`` and high ``n_hapax`` flag gibberish /
    OCR noise; boilerplate shows up as the opposite tail.

    Plan mirrors ``duplicate_span_stats``: (A) per-block (gram, count)
    occurrence partials -> one gram-keyed groupby sum; (B) only grams
    with count >= 2 are broadcast (sorted uint64 + counts — hapaxes
    contribute exactly 1 to freq_sum, so they never ship), one more
    streaming pass reconstitutes per-doc sums. Same 100-TB caveat and
    escape hatch as duplicate_span_stats: a boilerplate-heavy corpus
    can outgrow the broadcast, at which point pass B becomes the
    hash-partitioned semi-join of ``incremental.py``'s scale plan.
    Output: (doc_id, n_grams, freq_sum, n_hapax) — all integers."""
    from functools import partial as fpartial

    from nlshray.functions.nputil import segment_ids
    from nlshray.stages.exchange import hash_exchange, int64_key_hash

    refs = docs.select_columns(["text"]).to_arrow_refs()
    shards = (
        [
            s
            for s in ray.get(
                hash_exchange(
                    refs,
                    fpartial(_gram_cnt_partial, k=k, seed=seed),
                    int64_key_hash("gram"),
                    _keep_repeated_grams,
                    num_partitions,
                )
            )
            if s[0].size
        ]
        if refs
        else []
    )
    if shards:
        g = np.concatenate([s[0] for s in shards])
        c = np.concatenate([s[1] for s in shards])
        order = np.argsort(g)
        rep_ref = ray.put((g[order], c[order]))
    else:
        rep_ref = ray.put((np.empty(0, np.uint64), np.empty(0, np.int64)))

    def per_doc(t: pa.Table) -> pa.Table:
        grams_sorted, cnts = ray.get(rep_ref)
        flat, lens = batch_kgram_hashes(t["text"], k, seed=seed)
        seg = segment_ids(lens)
        freq_extra = np.zeros(lens.shape[0], np.int64)
        hapax = lens.astype(np.int64).copy()
        if flat.size and grams_sorted.size:
            idx = np.searchsorted(grams_sorted, flat)
            idx_c = np.minimum(idx, grams_sorted.size - 1)
            found = grams_sorted[idx_c] == flat
            np.add.at(freq_extra, seg[found], cnts[idx_c[found]] - 1)
            np.subtract.at(hapax, seg[found], 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(lens.astype(np.int64)),
                "freq_sum": pa.array(lens.astype(np.int64) + freq_extra),
                "n_hapax": pa.array(hapax),
            }
        )

    return docs.map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )


def exact_substring_dedup(
    docs: rd.Dataset,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    seed: int = 0,
) -> rd.Dataset:
    """ExactSubstr-style rewrite (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): remove every token
    whose position is covered by a k-token window that also occurs in
    ANOTHER document — the rewrite companion to the
    ``duplicate_span_stats`` report. Operates on the token stream (the
    engine's one tokenizer); output text re-joins surviving tokens with
    single spaces, so byte-exact original spacing is not preserved —
    the semantics a training-data pipeline wants, documented rather
    than hidden.

    Plan: the shared dup-gram broadcast (``dup_gram_sorted_ref``), then
    one streaming rewrite pass per block: window-hash membership via
    sorted searchsorted, coverage expansion as a +1/-1 boundary scatter
    + cumsum over token positions (no per-window python), list rebuild
    + ``binary_join``. Document text never shuffles.

    Output: (id_col, clean_text, n_tokens, n_removed), docs with >= 1
    token (token-less docs have no rewrite to report — matches the SQL
    replay, whose unnest drops them)."""
    import pyarrow.compute as pc

    from nlshray.functions.nputil import isin_sorted, segmented_arange
    from nlshray.functions.shingles import _SPLIT_PATTERN

    dup_ref = dup_gram_sorted_ref(
        docs, k=k, num_partitions=num_partitions, seed=seed
    )
    kk = int(k)

    def rewrite(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        dup_sorted = ray.get(dup_ref)
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_all = toks.flatten()
        off_all = np.asarray(toks.offsets, dtype=np.int64)
        nonempty = pc.greater(pc.utf8_length(flat_all), 0).to_numpy(
            zero_copy_only=False
        )
        ne_cum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(nonempty, dtype=np.int64)]
        )
        counts = ne_cum[off_all[1:]] - ne_cum[off_all[:-1]]
        n_tok = int(counts.sum())
        if n_tok == 0:
            return empty
        flat_tok = flat_all.filter(pa.array(nonempty))
        # same tokenizer => window hashes align with these token positions
        wh, wlens = batch_kgram_hashes(arr, kk, seed=seed)
        tok_off = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(counts, dtype=np.int64)]
        )
        covered = np.zeros(n_tok, dtype=bool)
        if wh.shape[0]:
            hs = segmented_arange(tok_off[:-1], wlens)[
                isin_sorted(dup_sorted, wh)
            ]
            delta = np.zeros(n_tok + kk + 1, np.int64)
            np.add.at(delta, hs, 1)
            np.add.at(delta, hs + kk, -1)
            covered = np.cumsum(delta[:n_tok]) > 0
        keep = ~covered
        kept_cum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(keep, dtype=np.int64)]
        )
        new_ls = pa.ListArray.from_arrays(
            pa.array(kept_cum[tok_off], pa.int32()),
            flat_tok.filter(pa.array(keep)),
        )
        clean = pc.binary_join(new_ls, " ")
        n_removed = counts - (kept_cum[tok_off[1:]] - kept_cum[tok_off[:-1]])
        has = counts > 0
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().filter(pa.array(has))
                if isinstance(t[id_col], pa.ChunkedArray)
                else t[id_col].filter(pa.array(has)),
                "clean_text": clean.filter(pa.array(has)),
                "n_tokens": pa.array(counts[has], pa.int64()),
                "n_removed": pa.array(n_removed[has], pa.int64()),
            }
        )

    return docs.map_batches(
        rewrite, batch_format="pyarrow", zero_copy_batch=True
    )
