"""Trained Naive-Bayes quality classifier (CCNet-style reference-vs-
crawl filter) — model TRAINING and SCORING both distributed, both
bit-exactly SQL-replayable.

The shape follows the classic learned quality filter of web-corpus
pipelines (CCNet / GPT-3 data work: score every crawled doc by how
much it resembles a trusted reference slice): label docs by a
deterministic provenance rule (``source IN pos_sources``), fit a
multinomial Naive Bayes over unigrams, score every doc by the summed
per-token log-odds plus the class prior.

Scale plan:
  1. TRAIN — token-class count table: per-block Arrow ``value_counts``
     partials split by label, merged by a raw two-round task shuffle
     in token-hash space with an Arrow C++ group_by per shard (the
     ``stages/lm.py`` plan shape; Ray Data's string-key Aggregate
     operator measured 25 s at 50k pages for a 5k vocab, these rounds
     ~3 s). Each shard holds COMPLETE global counts for its tokens.
     Corpus text never shuffles.
  2. MODEL — per-token integer micro-nat weight
     ``round((ln((n_pos+1)/(T1+V)) - ln((n_neg+1)/(T0+V))) * 1e6)``,
     computed once per vocab entry. Integer weights make every
     per-document sum order-independent (the exactness trick proven by
     ``stages/lm.py``), so training + scoring replay bit-exactly in
     DuckDB regardless of parallelism.
  3. SCORE — weight dict broadcast once via ``ray.put``; each batch
     looks up only its DISTINCT tokens (np.unique; types << tokens)
     and segment-sums int64 weights back to documents. Streaming, no
     shuffle.

Reference parity: the reference scores documents with a model loaded
once per worker (/root/reference/nlsh/models.py apply path); this adds
the supervised-classifier member of that family with a fully oracled
training loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

MICRO = 1_000_000


def _split_tokens(arr: pa.Array) -> pa.ListArray:
    from nlshray.functions.shingles import _SPLIT_PATTERN

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def token_class_counts(
    docs: rd.Dataset, pos_sources: tuple[str, ...], nparts: int = 8
) -> rd.Dataset:
    """(tok, n_pos, n_neg) occurrence counts by label.

    Two-round hash exchange (`stages/exchange.py` — Ray Data's
    string-key Aggregate measured 25 s at 50k pages for a 5k vocab,
    these rounds ~3 s): round A value_counts per class per block +
    hash-shard, round B one Arrow C++ group_by per shard. Only
    (tok, n_pos, n_neg) partial rows move."""
    from functools import partial as fpartial

    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        utf8_key_hash,
    )

    refs = docs.select_columns(["text", "source"]).to_arrow_refs()
    if not refs:
        return rd.from_items([])
    b_out = hash_exchange(
        refs,
        fpartial(_tcc_partial, pos=set(pos_sources)),
        utf8_key_hash("tok"),
        grouped_sum_merge("tok", ["n_pos", "n_neg"]),
        nparts,
    )
    return rd.from_arrow_refs(b_out)


def _tcc_partial(t: pa.Table, pos: set[str]) -> pa.Table:
    lab = pc.is_in(t["source"], value_set=pa.array(sorted(pos), pa.string()))
    if isinstance(lab, pa.ChunkedArray):
        lab = lab.combine_chunks()
    toks = _split_tokens(t["text"])
    out = []
    for want, name in ((True, "n_pos"), (False, "n_neg")):
        sel = toks.filter(pc.equal(lab, want))
        flat = sel.flatten() if len(sel) else pa.array([], pa.string())
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        vc = pc.value_counts(flat)
        out.append(
            pa.table(
                {
                    "tok": vc.field("values"),
                    "n_pos": vc.field("counts").cast(pa.int64())
                    if want
                    else pa.array(np.zeros(len(vc), np.int64)),
                    "n_neg": pa.array(np.zeros(len(vc), np.int64))
                    if want
                    else vc.field("counts").cast(pa.int64()),
                }
            )
        )
    return pa.concat_tables(out)


def fit_nb_model(
    docs: rd.Dataset, pos_sources: tuple[str, ...], nparts: int = 8
) -> tuple[dict[str, int], int]:
    """Returns (token -> micro-nat log-odds weight, prior_micro)."""
    cc = token_class_counts(docs, pos_sources, nparts=nparts)
    t = pa.concat_tables([ray.get(r) for r in cc.to_arrow_refs()])
    n_pos = t["n_pos"].to_numpy()
    n_neg = t["n_neg"].to_numpy()
    t1, t0, v = int(n_pos.sum()), int(n_neg.sum()), len(t)
    w = np.round(
        (np.log((n_pos + 1) / float(t1 + v)) - np.log((n_neg + 1) / float(t0 + v)))
        * MICRO
    ).astype(np.int64)
    pos = set(pos_sources)

    def docpart(b: pa.Table) -> pa.Table:
        lab = pc.is_in(b["source"], value_set=pa.array(sorted(pos), pa.string()))
        npos = int(pc.sum(pc.cast(lab, pa.int64())).as_py() or 0)
        return pa.table({"p": pa.array([npos], pa.int64()), "n": pa.array([len(b) - npos], pa.int64())})

    # Ray Data passes EMPTY input blocks through map_batches unchanged
    # (original schema) — drop any block missing the partial's columns
    dc_tabs = [
        t
        for t in ray.get(
            docs.map_batches(
                docpart, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if "p" in t.schema.names
    ]
    dc = (
        pa.concat_tables(dc_tabs)
        if dc_tabs
        else pa.table({"p": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    )
    d1 = int(pc.sum(dc["p"]).as_py() or 0)
    d0 = int(pc.sum(dc["n"]).as_py() or 0)
    prior = int(np.round(np.log(max(d1, 1) / float(max(d0, 1))) * MICRO))
    return dict(zip(t["tok"].to_pylist(), w.tolist())), prior


class NbScorer:
    """Actor-pool scoring stage: per-doc integer NB score. Weights are
    re-keyed ONCE per actor to 64-bit token hashes (sorted array +
    searchsorted lookup), so the per-batch path never materializes a
    Python string per occurrence — the same hash-space argument as
    `stages/lm.py` (a 64-bit collision inside the vocab would fail the
    SQL oracle loudly; the constructor raises on one instead)."""

    def __init__(self, model_ref, pos_sources: tuple[str, ...]):
        from nlshray.hashing import hash_utf8_array

        model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        weights, self.prior = model
        self.pos = set(pos_sources)
        toks = list(weights)
        if toks:
            hv = hash_utf8_array(pa.array(toks, pa.string()))
            w = np.fromiter((weights[t] for t in toks), np.int64, count=len(toks))
            order = np.argsort(hv)
            self.keys, self.wvals = hv[order], w[order]
            if len(self.keys) > 1 and (self.keys[1:] == self.keys[:-1]).any():
                raise ValueError("64-bit token-hash collision inside NB vocab")
        else:
            self.keys = np.empty(0, np.uint64)
            self.wvals = np.empty(0, np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        from nlshray.hashing import hash_utf8_array

        toks = _split_tokens(t["text"])
        flat = toks.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        kept = keep.to_numpy(zero_copy_only=False)
        ck = np.concatenate([[0], np.cumsum(kept.astype(np.int64))])
        per_doc = ck[offs[1:]] - ck[offs[:-1]]
        kept_arr = flat.filter(keep)
        if len(kept_arr) and len(self.keys):
            hh = hash_utf8_array(kept_arr)
            pos = np.searchsorted(self.keys, hh)
            pos_c = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos_c] == hh
            occ_w = np.where(hit, self.wvals[pos_c], np.int64(0))
        else:
            occ_w = np.zeros(len(kept_arr), np.int64)
        ends = np.cumsum(per_doc)
        csum = np.concatenate([[0], np.cumsum(occ_w)])
        score = csum[ends] - csum[ends - per_doc] + self.prior
        lab = pc.cast(
            pc.is_in(t["source"], value_set=pa.array(sorted(self.pos), pa.string())),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "label": lab,
                "n_tokens": pa.array(per_doc, pa.int64()),
                "nb_micro": pa.array(score, pa.int64()),
                "pred": pa.array((score > 0).astype(np.int64)),
            }
        )


def nb_quality_scores(
    docs: rd.Dataset, pos_sources: tuple[str, ...], nparts: int = 8
) -> rd.Dataset:
    """Full train-then-score pipeline over one corpus (two passes)."""
    model = fit_nb_model(docs, pos_sources, nparts=nparts)
    ref = ray.put(model)
    return docs.map_batches(
        NbScorer,
        fn_constructor_args=(ref, pos_sources),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
