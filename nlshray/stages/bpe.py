"""Byte-pair-encoding tokenizer: distributed training prep + encoding.

The scale split is the standard one (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units";
SentencePiece/HF tokenizers do the same): BPE learning never touches
the corpus directly — it runs over the corpus-wide WORD-TYPE frequency
table, which is vocabulary-bounded (~1e7-1e8 rows after a min-count
prune at 100 TB), not corpus-bounded. So:

  1. ``word_type_counts`` — distributed: per-block Arrow
     ``value_counts`` partials -> one groupby-sum shuffle over word
     types -> exact global ``min_count`` prune (the filter runs on
     complete global counts, same argument as the LM model prune in
     ``stages/lm.py``). Only (word, count) rows ever shuffle; text
     stays in place.
  2. ``fit_bpe`` — driver-side classic merge loop over the small type
     table. Deterministic: best pair = highest total count, ties broken
     by lexicographically smallest (left, right).
  3. ``BpeEncoder`` — distributed again: merge ranks broadcast once via
     ``ray.put``, applied per batch through a per-actor word->tokens
     cache (word types repeat massively, so encode cost is O(distinct
     types per actor), not O(tokens)).

Reference parity: the reference tokenizes with a fixed vocabulary
loaded once per worker (/root/reference/nlsh/data.py dataset loaders);
this module adds the *training* of such a vocabulary as a first-class
distributed op, which the reference leaves to offline tools.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from nlshray.functions.shingles import _SPLIT_PATTERN

EOW = "</w>"  # end-of-word symbol; cannot collide with [0-9a-z_]+ words
MAX_WORD_LEN = 64


def _split_words(arr: pa.Array) -> pa.Array:
    """Lowercase + split on the repo-wide token pattern; drop empties
    and over-long junk (URLs, base64 runs) exactly like the SQL oracle."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def _keep_mask(flat: pa.Array) -> pa.Array:
    n = pc.utf8_length(flat)
    return pc.and_(pc.greater(n, 0), pc.less_equal(n, MAX_WORD_LEN))


def _wtc_partial(t: pa.Table) -> pa.Table:
    flat = _split_words(t["text"]).flatten()
    flat = flat.filter(_keep_mask(flat))
    vc = pc.value_counts(flat)
    return pa.table(
        {"word": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
    )


def word_type_counts(docs: rd.Dataset, min_count: int = 1, nparts: int = 8) -> rd.Dataset:
    """Corpus word-type frequency table: (word, n), n >= min_count.

    Two-round hash exchange (`stages/exchange.py`): each block
    pre-counts in Arrow's C++ value_counts kernel, so at most
    (blocks x block-vocab) partial rows move; round B's Arrow group_by
    holds the COMPLETE global count for its keys, making the
    min_count prune inside the merge exact.
    """
    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        utf8_key_hash,
    )

    base = grouped_sum_merge("word", ["n"])

    def merge(t: pa.Table) -> pa.Table:
        out = base(t)
        if min_count > 1 and len(out):
            out = out.filter(pc.greater_equal(out["n"], min_count))
        return out

    refs = docs.select_columns(["text"]).to_arrow_refs()
    if not refs:
        return rd.from_items([])
    return rd.from_arrow_refs(
        hash_exchange(refs, _wtc_partial, utf8_key_hash("word"), merge, nparts)
    )


def fit_bpe(
    words: list[str], counts: list[int], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-type frequency table.

    Each word is a symbol sequence ``[c0, c1, ..., ck, EOW]``; per
    iteration the adjacent pair with the highest total (type-weighted)
    count is merged everywhere. Deterministic tie-break: count DESC,
    then (left, right) ASC. Stops early when no pair occurs >= 2 times.
    """
    import heapq

    seqs: list[list[str]] = [list(w) + [EOW] for w in words]
    freqs = list(counts)

    # pair -> total count; pair -> set of word indices containing it
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    # lazy max-heap of (-count, pair): stale entries are validated
    # against pair_count on pop (and re-pushed corrected after a
    # decrement), so selection is exact — count DESC, pair ASC —
    # without the O(pairs) scan per merge the dict argmax would cost.
    heap: list[tuple[int, tuple[str, str]]] = []

    def add_word(i: int, sign: int) -> None:
        s, f = seqs[i], freqs[i] * sign
        for a, b in zip(s, s[1:]):
            p = (a, b)
            n = pair_count.get(p, 0) + f
            pair_count[p] = n
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)
                if n >= 2:
                    heapq.heappush(heap, (-n, p))

    for i in range(len(seqs)):
        add_word(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        while heap:
            negn, p = heapq.heappop(heap)
            cur = pair_count.get(p, 0)
            if cur < 2:
                continue
            if cur == -negn:
                best = p
                break
            heapq.heappush(heap, (-cur, p))
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in sorted(pair_words.get(best, ())):
            s = seqs[i]
            if len(s) < 2:
                continue
            add_word(i, -1)
            out: list[str] = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = out
            add_word(i, +1)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the standard BPE
    inference rule: always apply the earliest-learned applicable merge)."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_j, best_r = -1, None
        for j in range(len(s) - 1):
            r = ranks.get((s[j], s[j + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_j, best_r = j, r
        if best_r is None:
            break
        a, b = s[best_j], s[best_j + 1]
        merged = a + b
        out: list[str] = []
        j = 0
        while j < len(s):
            if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                out.append(merged)
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    return s


class BpeEncoder:
    """Actor-pool stage: per-doc BPE token counts with a trained vocab.

    ``__init__`` resolves the broadcast merge list ONCE per actor and
    builds the rank dict; ``__call__`` deduplicates the batch's words
    in 64-bit HASH space (one vectorized ``hash_utf8_array`` + one
    ``np.unique`` — no Python string per occurrence), encodes only the
    cache-missing DISTINCT words, and segment-sums token lengths back
    to documents. A 64-bit collision between distinct word types would
    miscount one word — the `stages/lm.py` hash-space argument; the
    roundtrip/parallelism pytest gates would catch a systematic one.
    """

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if isinstance(merges_ref, ray.ObjectRef) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict[int, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        from nlshray.hashing import hash_utf8_array

        toks = _split_words(t["text"])
        flat = toks.flatten()
        keep = _keep_mask(flat)
        # per-doc word counts honoring the keep mask
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        kept = keep.to_numpy(zero_copy_only=False)
        ck = np.concatenate([[0], np.cumsum(kept.astype(np.int64))])
        per_doc_kept = ck[offs[1:]] - ck[offs[:-1]]
        kept_arr = flat.filter(keep)
        if len(kept_arr):
            hh = hash_utf8_array(kept_arr)
            uniq, first, inv = np.unique(hh, return_index=True, return_inverse=True)
            miss = [i for i, h in enumerate(uniq) if int(h) not in self.cache]
            if miss:
                strs = kept_arr.take(
                    pa.array(first[miss], pa.int64())
                ).to_pylist()
                for i, s in zip(miss, strs):
                    self.cache[int(uniq[i])] = len(encode_word(s, self.ranks))
            lens = np.fromiter(
                (self.cache[int(h)] for h in uniq), dtype=np.int64, count=len(uniq)
            )
            tok_per_word = lens[inv]
        else:
            tok_per_word = np.zeros(0, np.int64)
        ends = np.cumsum(per_doc_kept)
        starts = ends - per_doc_kept
        csum = np.concatenate([[0], np.cumsum(tok_per_word)])
        n_bpe = csum[ends] - csum[starts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(per_doc_kept, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )


def fit_bpe_from_dataset(
    docs: rd.Dataset, num_merges: int, min_count: int = 2, nparts: int = 8
) -> list[tuple[str, str]]:
    """Distributed count pass + driver merge loop. The collected table
    is the pruned TYPE table (vocabulary-bounded), never the corpus."""
    wt = word_type_counts(docs, min_count=min_count, nparts=nparts).to_arrow_refs()
    t = pa.concat_tables([ray.get(r) for r in wt])
    # deterministic driver order (groupby partition order is not)
    order = pc.sort_indices(
        t, sort_keys=[("n", "descending"), ("word", "ascending")]
    )
    t = t.take(order)
    return fit_bpe(
        t["word"].to_pylist(), t["n"].to_pylist(), num_merges=num_merges
    )
