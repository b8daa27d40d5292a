"""TF-IDF keyword extraction — the two-pass broadcast-small-side shape.

Pass 1 (corpus statistics): document frequencies via per-block
combiner partials — each block emits (token, #distinct docs in block)
from one ``value_counts`` over its per-doc-distinct token set, so the
groupby shuffles at most (blocks x block-vocab) rows. N = total doc
count. The df table is vocabulary-sized; it is collected once,
``ray.put``, and looked up inside pass 2 by sorted-hash searchsorted —
no join shuffle. At 100 TB the vocabulary is the broadcast bound:
prune with ``min_df`` (rare tokens can't be top keywords of more than
a handful of docs each — but they CAN be the top of their own doc, so
pruning changes semantics; it is an explicit, disclosed knob, default
off).

Pass 2 (per-doc, embarrassingly parallel): tokenize, per-(doc, token)
counts, score tf * (ln((N+1)/(df+1)) + 1) (the smoothed idf), keep the
top-k per doc under (rounded score DESC, token ASC). Rounding is part
of the ORDER KEY, not just the output, so the cross-engine float
boundary sits in the same place for the SQL oracle's ranking.

Reference parity: none — the reference has no text surface at all;
this is the keyword/feature-extraction member of the webtext
extension set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from nlshray.functions.nputil import segment_ids
from nlshray.hashing import hash_utf8_array


def _doc_tokens(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """(flat token array, segment id per token) for a text column."""
    from nlshray.functions.shingles import _SPLIT_PATTERN

    arr = t["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = np.asarray(
        pc.list_value_length(toks).cast(pa.int64()).fill_null(0)
    )
    flat = toks.flatten()
    seg = segment_ids(lens)
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    return flat.filter(pa.array(keep)), seg[keep]


def _df_partial(t: pa.Table) -> pa.Table:
    """One block's (tok, df) distinct-doc partial + the "" sentinel row
    carrying the block's doc count."""
    flat, seg = _doc_tokens(t)
    enc = flat.dictionary_encode()
    codes = np.asarray(enc.indices, np.int64)
    # distinct (doc, token) pairs in this block
    pair = seg * max(len(enc.dictionary), 1) + codes
    uniq = np.unique(pair)
    vc = np.bincount(
        (uniq % max(len(enc.dictionary), 1)).astype(np.int64),
        minlength=len(enc.dictionary),
    )
    toks = enc.dictionary.to_pylist() + [""]
    dfs = vc.astype(np.int64).tolist() + [t.num_rows]
    return pa.table(
        {"tok": pa.array(toks, pa.string()),
         "df": pa.array(dfs, pa.int64())}
    )


def doc_frequencies(
    docs: rd.Dataset, *, num_partitions: int = 8, with_doc_count: bool = False
):
    """(tok, df) over the corpus: per-block distinct-doc partials, one
    small groupby over block vocabularies. With ``with_doc_count``,
    also returns the total doc count N carried through the SAME pass
    as a sentinel row (tok "" cannot occur — empty tokens are filtered
    at tokenization), so callers don't pay a separate count() scan."""
    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        utf8_key_hash,
    )

    refs = docs.to_arrow_refs()
    blocks = (
        [
            b
            for b in ray.get(
                hash_exchange(
                    refs,
                    _df_partial,
                    utf8_key_hash("tok"),
                    grouped_sum_merge("tok", ["df"]),
                    num_partitions,
                )
            )
            if len(b)
        ]
        if refs
        else []
    )
    merged = (
        pa.concat_tables(blocks)
        if blocks
        else pa.table({"tok": pa.array([], pa.string()),
                       "df": pa.array([], pa.int64())})
    )
    sentinel = pc.equal(merged["tok"], "")
    n_docs = int(
        pc.sum(pc.if_else(sentinel, merged["df"], 0)).as_py() or 0
    )
    tbl = merged.filter(pc.invert(sentinel))
    return (tbl, n_docs) if with_doc_count else tbl


def tfidf_topk(
    docs: rd.Dataset, *, k: int = 3, round_nd: int = 6,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Top-k keywords per doc by smoothed tf-idf. ``docs`` needs
    (doc_id, text); returns (doc_id, tok, tf, score)."""
    df_tbl, n_docs = doc_frequencies(
        docs, num_partitions=num_partitions, with_doc_count=True
    )
    h = hash_utf8_array(df_tbl["tok"])
    order = np.argsort(h)
    df_ref = ray.put(
        (h[order], df_tbl["df"].to_numpy()[order].astype(np.float64))
    )
    p = 10.0 ** round_nd

    def score(t: pa.Table) -> pa.Table:
        from nlshray.stages.topk import _rank_in_group

        sorted_h, sorted_df = ray.get(df_ref)
        flat, seg = _doc_tokens(t)
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        v = max(len(enc.dictionary), 1)
        pair = seg * v + codes
        uniq, tf = np.unique(pair, return_counts=True)
        useg, ucode = uniq // v, uniq % v
        dict_h = hash_utf8_array(enc.dictionary)
        pos = np.searchsorted(sorted_h, dict_h)
        pos = np.clip(pos, 0, max(len(sorted_h) - 1, 0))
        df = sorted_df[pos] if len(sorted_h) else np.ones(v)
        idf = np.log((np.float64(n_docs) + 1.0) / (df + 1.0)) + 1.0
        sc = np.round(tf * idf[ucode] * p) / p
        toks = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False))
        order, rank = _rank_in_group(useg, -sc, toks[ucode])
        keep = order[rank < k]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[useg[keep]], pa.int64()),
                "tok": pa.array(toks[ucode[keep]], pa.string()),
                "tf": pa.array(tf[keep].astype(np.int64)),
                "score": pa.array(sc[keep], pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_cosine_pairs(
    docs: rd.Dataset,
    threshold: float,
    *,
    round_nd: int = 6,
    num_partitions: int = 8,
) -> rd.Dataset:
    """All doc pairs with tf-idf COSINE >= threshold — the
    lexical-vector member of the dedup family (token-set Jaccard =
    `ngram_jaccard_pairs`, embedding cosine = `embedding_dup_pairs`;
    tf-idf cosine sits between: word-choice overlap weighted by
    corpus rarity, the classic news-wire near-dup detector).

    Brute member, same broadcast shape as `ngram_jaccard_pairs`: the
    per-doc sparse vectors (token hash, smoothed tf-idf weight) are
    collected once, a CSC postings structure + per-doc norms are
    broadcast via one ``ray.put``, and each batch doc accumulates its
    dot products against ALL docs with one gather + ``bincount`` (no
    Python inner loop over postings). Pairs are emitted from the
    smaller-id side only. At corpus scale route through LSH banding +
    exact verify exactly as `ngram_jaccard_pairs` does above its
    brute limit — the broadcast side here is O(total distinct
    (doc, token) pairs).

    The threshold compares the ROUNDED cosine (``round_nd`` places) on
    both engines, so the SQL replay's float boundary sits in the same
    place.
    """
    df_tbl, n_docs = doc_frequencies(
        docs, num_partitions=num_partitions, with_doc_count=True
    )
    h = hash_utf8_array(df_tbl["tok"])
    order = np.argsort(h)
    sorted_h = h[order]
    sorted_df = df_tbl["df"].to_numpy()[order].astype(np.float64)

    # collect per-doc sparse vectors (the brute broadcast side)
    def vectors(t: pa.Table) -> pa.Table:
        flat, seg = _doc_tokens(t)
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        v = max(len(enc.dictionary), 1)
        pair = seg * v + codes
        uniq, tf = np.unique(pair, return_counts=True)
        useg, ucode = uniq // v, uniq % v
        dict_h = hash_utf8_array(enc.dictionary)
        pos = np.clip(
            np.searchsorted(sorted_h, dict_h), 0, max(len(sorted_h) - 1, 0)
        )
        df = sorted_df[pos] if len(sorted_h) else np.ones(v)
        idf = np.log((np.float64(n_docs) + 1.0) / (df + 1.0)) + 1.0
        w = tf * idf[ucode]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[useg], pa.int64()),
                "th": pa.array(dict_h[ucode].view(np.int64), pa.int64()),
                "w": pa.array(w, pa.float64()),
            }
        )

    vec = pa.concat_tables(
        [
            b
            for b in ray.get(
                docs.map_batches(
                    vectors, batch_format="pyarrow", zero_copy_batch=True
                ).to_arrow_refs()
            )
            if b.num_columns
        ]
    )
    d = vec["doc_id"].to_numpy(zero_copy_only=False)
    th = vec["th"].to_numpy(zero_copy_only=False).view(np.uint64)
    w = vec["w"].to_numpy(zero_copy_only=False)
    all_ids, dcode = np.unique(d, return_inverse=True)
    n = len(all_ids)
    norms = np.sqrt(np.bincount(dcode, weights=w * w, minlength=n))
    # CSC postings: token-sorted (doc code, weight) + token index
    o = np.argsort(th, kind="stable")
    th_s, dcode_s, w_s = th[o], dcode[o], w[o]
    tok_u, tok_start = np.unique(th_s, return_index=True)
    tok_end = np.r_[tok_start[1:], th_s.size]
    csc_ref = ray.put(
        (tok_u, tok_start, tok_end, dcode_s, w_s, norms, all_ids)
    )
    p = 10.0 ** round_nd
    thr = float(threshold)

    def pairs(t: pa.Table) -> pa.Table:
        tok_u, tok_start, tok_end, dcode_s, w_s, norms, all_ids = ray.get(
            csc_ref
        )
        n = len(all_ids)
        flat, seg = _doc_tokens(t)
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        v = max(len(enc.dictionary), 1)
        pair = seg * v + codes
        uniq, tf = np.unique(pair, return_counts=True)
        useg, ucode = uniq // v, uniq % v
        dict_h = hash_utf8_array(enc.dictionary)
        pos = np.clip(
            np.searchsorted(sorted_h, dict_h), 0, max(len(sorted_h) - 1, 0)
        )
        df = sorted_df[pos] if len(sorted_h) else np.ones(v)
        idf = np.log((np.float64(n_docs) + 1.0) / (df + 1.0)) + 1.0
        wq = tf * idf[ucode]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        L, R, C = [], [], []
        for s in range(t.num_rows):
            m = useg == s
            qh, qw = dict_h[ucode[m]], wq[m]
            tpos = np.searchsorted(tok_u, qh)
            tpos = np.clip(tpos, 0, max(len(tok_u) - 1, 0))
            hit = (len(tok_u) > 0) & (tok_u[tpos] == qh)
            tpos, qw_h = tpos[hit], qw[hit]
            st, en = tok_start[tpos], tok_end[tpos]
            lens = en - st
            gather = _ranges(st, lens)
            rows = dcode_s[gather]
            vals = w_s[gather] * np.repeat(qw_h, lens)
            dots = np.bincount(rows, weights=vals, minlength=n)
            me = ids[s]
            nq = np.sqrt(float((qw * qw).sum()))
            cos = np.round(dots / np.maximum(norms * nq, 1e-300) * p) / p
            sel = (cos >= thr) & (all_ids > me)
            L.append(np.full(int(sel.sum()), me, np.int64))
            R.append(all_ids[sel])
            C.append(cos[sel])
        return pa.table(
            {
                "left_id": pa.array(
                    np.concatenate(L) if L else np.empty(0, np.int64)
                ),
                "right_id": pa.array(
                    np.concatenate(R) if R else np.empty(0, np.int64)
                ),
                "cosine": pa.array(
                    np.concatenate(C) if C else np.empty(0, np.float64)
                ),
            }
        )

    return docs.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )


def _ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [s, s+len) index ranges, fully vectorized: ones
    with a corrective jump at each range boundary, then cumsum."""
    nz = lens > 0
    starts, lens = starts[nz], lens[nz]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out = np.ones(total, np.int64)
    out[0] = starts[0]
    ends = np.cumsum(lens)
    # first cell of range i+1 sits at ends[i]; its value must jump from
    # the previous range's last value (starts[i] + lens[i] - 1)
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)
