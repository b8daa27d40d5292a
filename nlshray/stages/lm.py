"""Corpus bigram language model: distributed fit + perplexity scoring.

CCNet's headline quality signal (Wenzek et al. 2020 §4.3 scores web
pages by the perplexity of a language model and keeps the low-
perplexity tier; the reference repo's corpus ops stop at hashing, so
this is an (ours) extension the way `stages/textstats.py` is): fit a
maximum-likelihood BIGRAM model on the corpus itself, then score every
document by its negative log-likelihood under that model. Low
perplexity = the document looks like the corpus; high perplexity =
outlier (boilerplate, noise, wrong language).

Two streaming passes, zero driver-side row loops:

1. **Fit (combiner)** — each block tokenizes (same ``[0-9a-z_]+``
   tokenizer as the vocab/decontam/heavy-hitter operators), forms
   within-doc adjacent token pairs vectorized (one Arrow slice + one
   boolean mask, no per-row work), ``value_counts`` the joined
   ``t1\\x1ft2`` keys, and emits the block's partial counts — at most
   (block-vocab)^2 rows but in practice the block's distinct-bigram
   count. A bounded ``groupby(bg).sum`` merges them; the merged table
   is the model and is collected to the driver. CLOSED-VOCABULARY
   ASSUMPTION, documented: the model table is O(distinct bigrams). On
   an open web vocabulary, prune the merged table with a min-count
   threshold before broadcasting (rare bigrams contribute the most
   noise to the estimate anyway); the scoring pass then needs a
   backoff cost for unseen bigrams — both are one-line changes here.
2. **Score** — the driver derives, ONCE: the sorted 64-bit token-hash
   vocabulary (collision-checked; a collision would fail the SQL
   oracle exactly as in ``repetition_stats``), per-prefix totals
   ``c1(t1) = sum_t2 c12``, and a sorted array of bigram codes
   ``id(t1)*V + id(t2)`` with the per-bigram INTEGER cost
   ``round(-ln(c12/c1) * 1e6)`` (micro-nats). The three arrays are
   broadcast with one ``ray.put``; every block factorizes its tokens
   by ``searchsorted``, gathers per-bigram integer costs, and
   ``bincount``-sums them per document.

Integer micro-nat costs are the exactness trick: each unique bigram's
cost is rounded to an int ONCE, so the per-document sum is an integer
sum — order-independent, parallelism-independent, and bit-replayable
by DuckDB's ``SUM(CAST(round(-ln(...)*1e6) AS BIGINT))`` no matter
what order either engine visits rows in. The float ``ppl`` column is
then a pure function of two integers (``exp(nll/1e6/n)``), identical
on both sides.

Scoring the training corpus with its own MLE model guarantees every
scored bigram exists in the model (no smoothing needed); ``score``
also accepts a DIFFERENT corpus plus an ``unseen_cost`` backoff for
the train-on-clean / score-the-crawl deployment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from nlshray.hashing import hash_utf8_array

_SPLIT_PATTERN = r"[^0-9a-z_]+"
_SEP = "\x1f"  # never appears inside a [0-9a-z_]+ token
MICRO = 1_000_000


def _block_token_stream(t: pa.Table, text_col: str):
    """(flat tokens, doc index per token, doc_id column or None).

    Vectorized: one regex split, one repeat, one mask — empty tokens
    are dropped from the flat stream and the doc index together so
    adjacency stays correct.
    """
    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    doc_idx = np.repeat(
        np.arange(len(toks), dtype=np.int64),
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
    )
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        flat = flat.filter(keep)
        doc_idx = doc_idx[keep_np]
    return flat, doc_idx


def fit_bigram_counts(
    docs: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 8,
    min_count: int = 1,
) -> pa.Table:
    """Merged corpus bigram counts as a small ``(t1, t2, c12)`` table.

    The per-block partial is a ``value_counts`` over joined
    ``t1\\x1ft2`` keys (the separator is internal only — the SQL
    oracle joins on the two token columns, which this splits back
    into). ``min_count`` prunes the merged model for open-vocabulary
    corpora.
    """

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_idx = _block_token_stream(t, text_col)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bg": pa.array([], pa.string()), "c12": pa.array([], pa.int64())}
            )
        same_doc = doc_idx[:-1] == doc_idx[1:]
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1), _SEP
        )
        joined = joined.filter(pa.array(same_doc))
        vc = pc.value_counts(joined)
        return pa.table(
            {
                "bg": vc.field("values"),
                "c12": vc.field("counts").cast(pa.int64()),
            }
        )

    merged = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bg", num_partitions=num_partitions)
        .aggregate(Sum("c12", alias_name="c12"))
        .take_all()  # the model itself — O(distinct bigrams), the ONLY collect
    )
    bgs = pa.array([r["bg"] for r in merged], pa.string())
    c12 = pa.array([r["c12"] for r in merged], pa.int64())
    if min_count > 1:
        keep = pc.greater_equal(c12, min_count)
        bgs, c12 = bgs.filter(keep), c12.filter(keep)
    parts = pc.split_pattern(bgs, _SEP)
    t1, t2 = pc.list_element(parts, 0), pc.list_element(parts, 1)
    return pa.table({"t1": t1, "t2": t2, "c12": c12})


def build_cost_model(counts: pa.Table, seed: int = 0):
    """(sorted vocab hashes, sorted bigram codes, int64 micro-nat costs,
    V) derived once on the driver from the merged counts table."""
    t1h = hash_utf8_array(counts["t1"], seed=seed)
    t2h = hash_utf8_array(counts["t2"], seed=seed)
    vocab = np.unique(np.concatenate([t1h, t2h]))
    if len(np.unique(vocab)) != len(vocab):  # pragma: no cover
        raise RuntimeError("token hash collision")
    V = np.int64(len(vocab))
    id1 = np.searchsorted(vocab, t1h).astype(np.int64)
    id2 = np.searchsorted(vocab, t2h).astype(np.int64)
    c12 = counts["c12"].to_numpy(zero_copy_only=False).astype(np.int64)
    # prefix totals c1 over the model's OWN rows (= unigram count of t1
    # as a bigram prefix; matches the SQL replay's SUM(c12) GROUP BY t1)
    c1 = np.bincount(id1, weights=c12, minlength=int(V))
    codes = id1 * V + id2
    order = np.argsort(codes)
    codes = codes[order]
    if len(codes) and (codes[1:] == codes[:-1]).any():  # pragma: no cover
        raise RuntimeError("bigram code collision")
    cost = np.round(-np.log(c12 / c1[id1]) * MICRO).astype(np.int64)[order]
    return vocab, codes, cost, V


def score_perplexity(
    docs: ray.data.Dataset,
    counts: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    unseen_cost: int | None = None,
    carry_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Per-document (doc_id, n_bigrams, nll_micro, ppl) under the
    bigram model in ``counts``. ``carry_cols`` ride along filtered to
    the surviving rows (e.g. ``lang`` for per-language tiering) — the
    score is a pure function of the same batch, so no join is needed.

    ``unseen_cost`` (micro-nats) is the backoff charged for bigrams
    absent from the model — required when scoring a corpus the model
    was not fit on; ``None`` asserts every bigram is known (the
    self-scoring case, where absence would be a kernel bug). Documents
    with fewer than two tokens produce no bigrams and are dropped,
    exactly as the SQL replay's inner join drops them.
    """
    model_ref = ray.put(build_cost_model(counts, seed=seed))

    def score(t: pa.Table) -> pa.Table:
        vocab, codes, cost, V = ray.get(model_ref)
        flat, doc_idx = _block_token_stream(t, text_col)
        n = len(flat)
        n_docs = t.num_rows
        if n < 2:
            nll = np.zeros(n_docs, dtype=np.int64)
            nbg = np.zeros(n_docs, dtype=np.int64)
        else:
            h = hash_utf8_array(flat, seed=seed)
            ids = np.searchsorted(vocab, h)
            known = (ids < len(vocab)) & (vocab[np.minimum(ids, len(vocab) - 1)] == h)
            same_doc = doc_idx[:-1] == doc_idx[1:]
            pair_known = known[:-1] & known[1:]
            code = np.where(
                pair_known[: n - 1] & same_doc,
                ids[:-1] * V + ids[1:],
                np.int64(-1),
            )
            sel = same_doc
            code, bg_doc = code[sel], doc_idx[:-1][sel]
            pos = np.searchsorted(codes, code)
            pos_c = np.minimum(pos, max(len(codes) - 1, 0))
            hit = (len(codes) > 0) & (codes[pos_c] == code)
            if unseen_cost is None:
                if not hit.all():
                    raise RuntimeError(
                        "bigram absent from model; pass unseen_cost for "
                        "cross-corpus scoring"
                    )
                c = cost[pos_c]
            else:
                c = np.where(hit, cost[pos_c], np.int64(unseen_cost))
            nll = np.bincount(bg_doc, weights=c, minlength=n_docs).astype(
                np.int64
            )
            nbg = np.bincount(bg_doc, minlength=n_docs).astype(np.int64)
        keep = nbg > 0
        ppl = np.round(
            np.exp(nll[keep] / MICRO / np.maximum(nbg[keep], 1)), 6
        )
        keep_mask = pa.array(keep)
        cols = {id_col: t[id_col].combine_chunks().filter(keep_mask)
                if isinstance(t[id_col], pa.ChunkedArray)
                else t[id_col].filter(keep_mask)}
        for c in carry_cols:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[c] = arr.filter(keep_mask)
        cols["n_bigrams"] = pa.array(nbg[keep], pa.int64())
        cols["nll_micro"] = pa.array(nll[keep], pa.int64())
        cols["ppl"] = pa.array(ppl, pa.float64())
        return pa.table(cols)

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def perplexity_tiers(
    scores: ray.data.Dataset,
    group_col: str = "lang",
    ppl_col: str = "ppl",
    q_head: float = 0.33,
    q_mid: float = 0.66,
) -> ray.data.Dataset:
    """CCNet's deliverable (Wenzek et al. 2020 §4.3): split each
    language's documents into head/middle/tail tiers by perplexity.

    ``scores`` is a per-doc scores dataset (small scalar columns — a
    few dozen bytes/doc, so materializing it is cheap at any corpus
    scale; the CORPUS is never materialized). Thresholds are EXACT
    per-group quantiles via :func:`grouped_quantiles_float`'s
    two-pass straddling-bucket plan (ceil(q*n)-rank rule, replayed
    explicitly in the SQL oracle with ROW_NUMBER rather than relying
    on any engine's quantile convention). The tiny threshold table
    rides into the tier map as a closure; tier assignment is a
    vectorized dictionary-encode + two compares.
    """
    from nlshray.stages.quantiles import grouped_quantiles_float

    scores = scores.materialize()
    thr = grouped_quantiles_float(scores, group_col, ppl_col, [q_head, q_mid])
    qh = f"q_{int(round(q_head * 100))}"
    qm = f"q_{int(round(q_mid * 100))}"
    th = {
        g: (h, m)
        for g, h, m in zip(
            thr[group_col].to_pylist(),
            thr[qh].to_pylist(),
            thr[qm].to_pylist(),
        )
    }

    def tier_fn(t: pa.Table) -> pa.Table:
        enc = t[group_col]
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = pc.dictionary_encode(enc)
        dic = enc.dictionary.to_pylist()  # group cardinality, not rows
        th_h = np.array([th[g][0] for g in dic], np.float64)
        th_m = np.array([th[g][1] for g in dic], np.float64)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        ppl = t[ppl_col].to_numpy(zero_copy_only=False)
        tier = np.where(
            ppl <= th_h[idx],
            "head",
            np.where(ppl <= th_m[idx], "middle", "tail"),
        )
        return t.append_column("tier", pa.array(tier, pa.string()))

    return scores.map_batches(
        tier_fn, batch_format="pyarrow", zero_copy_batch=True
    )


def lm_perplexity(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int = 8,
    carry_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Self-scored corpus perplexity: fit on ``docs``, score ``docs``."""
    counts = fit_bigram_counts(
        docs, text_col=text_col, num_partitions=num_partitions
    )
    return score_perplexity(
        docs,
        counts,
        text_col=text_col,
        id_col=id_col,
        seed=seed,
        carry_cols=carry_cols,
    )
