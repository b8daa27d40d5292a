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
     partials split by label, ONE vocabulary-bounded groupby-sum
     (same envelope as ``stages/bpe.py:word_type_counts``; prune with
     ``min_count`` after the groupby where it is exact on complete
     global counts). Corpus text never shuffles.
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
from ray.data.aggregate import Sum

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
    """(tok, n_pos, n_neg) occurrence counts by label — combiner-style."""
    pos = set(pos_sources)

    def partial(t: pa.Table) -> pa.Table:
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

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok", num_partitions=nparts)
        .aggregate(Sum("n_pos", alias_name="n_pos"), Sum("n_neg", alias_name="n_neg"))
    )


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

    dc = pa.concat_tables(
        [
            ray.get(r)
            for r in docs.map_batches(
                docpart, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ]
    )
    d1 = int(pc.sum(dc["p"]).as_py() or 0)
    d0 = int(pc.sum(dc["n"]).as_py() or 0)
    prior = int(np.round(np.log(max(d1, 1) / float(max(d0, 1))) * MICRO))
    return dict(zip(t["tok"].to_pylist(), w.tolist())), prior


class NbScorer:
    """Actor-pool scoring stage: per-doc integer NB score. Weights
    resolved ONCE per actor; per-batch lookups touch distinct tokens
    only (np.unique) and segment-sum int64 weights back to docs."""

    def __init__(self, model_ref, pos_sources: tuple[str, ...]):
        model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        self.weights, self.prior = model
        self.pos = set(pos_sources)

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = _split_tokens(t["text"])
        flat = toks.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        kept = keep.to_numpy(zero_copy_only=False)
        ck = np.concatenate([[0], np.cumsum(kept.astype(np.int64))])
        per_doc = ck[offs[1:]] - ck[offs[:-1]]
        words = flat.filter(keep).to_pylist()
        if words:
            uniq, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
            uw = np.fromiter(
                (self.weights.get(w, 0) for w in uniq), dtype=np.int64, count=len(uniq)
            )
            occ_w = uw[inv]
        else:
            occ_w = np.zeros(0, np.int64)
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
