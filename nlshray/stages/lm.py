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
   tokenizer as the vocab/decontam/heavy-hitter operators), HASHES its
   tokens once, forms within-doc adjacent PAIR HASHES vectorized, and
   run-length-counts the sorted pair hashes — token strings never
   leave the block, so the merge moves three int64 columns
   (the string version spent 90 s in the shuffle at 50k web pages;
   this spends seconds). A raw two-round task shuffle merges partials
   (round B prunes with ``min_count`` on complete global counts);
   the merged table is the model and is collected to the driver.
   MODEL-FITS-ON-DRIVER ASSUMPTION, documented: the model table is
   O(distinct bigrams over min_count) — 7.3M rows / ~170 MB unpruned
   at 50k pages; 467M raw -> 36M rows with min_count=3 at 3.2M pages
   (measured, BASELINE.md). On an open web vocabulary always prune
   (rare bigrams contribute the most noise to the estimate anyway)
   and score with a backoff cost for unseen bigrams.
2. **Score** — the driver derives, ONCE: per-prefix totals
   ``c1(h1) = sum_h2 c12`` and a sorted array of pair hashes with the
   per-bigram INTEGER cost ``round(-ln(c12/c1) * 1e6)`` (micro-nats).
   Both arrays are broadcast with one ``ray.put``; every block hashes
   its tokens, ``searchsorted``s its pair hashes, gathers integer
   costs, and ``bincount``-sums them per document. Hash space is safe
   for the same reason ``repetition_stats`` documents: a 64-bit
   collision would change counts and FAIL the string-space SQL
   oracle, which stays bit-green.

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

from nlshray.hashing import hash_utf8_array

_SPLIT_PATTERN = r"[^0-9a-z_]+"
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
    seed: int = 0,
    group_col: str | None = None,
) -> pa.Table:
    """Merged corpus bigram counts as a ``(bh, h1, c12)`` table — all
    64-bit HASH space, no strings. ``group_col`` fits one CONDITIONAL
    model per group value in the same single pass (the group hash is
    mixed into both keys — see ``_block_pair_keys``).

    Token strings never leave their block: each round-A task hashes
    its tokens once (``hash_utf8_array``), forms within-doc pair
    hashes ``bh = splitmix64(h1 * FNV ^ h2)``, run-length-counts the
    SORTED pair hashes, and shards the partial by ``bh % P``; round B
    merges each shard with one numpy sort + ``reduceat``. Only int64
    triples ever move. ``h1`` rides along as the run head (constant
    per ``bh`` modulo hash collision — a collision would make the
    string-space SQL oracle fail, the same argument
    ``repetition_stats`` documents). ``min_count`` prunes the merged
    model for open-vocabulary corpora (prefix totals are then taken
    over the pruned rows — document that choice if you prune).
    """

    # raw two-round task shuffle (same plan shape as
    # ``stages/pairs._pairs_task_shuffle``): Dataset.groupby.aggregate
    # walks its 7.3M groups in Python (measured 90 s at 50k web pages);
    # these two numpy rounds do the identical merge in ~2 s.
    P = max(1, num_partitions)
    cols = [text_col] if group_col is None else [text_col, group_col]
    refs = docs.select_columns(cols).to_arrow_refs()
    if not refs:
        return _empty_counts()
    a_out = [
        _lm_shard.options(num_returns=P).remote(
            r, text_col, seed, P, group_col
        )
        for r in refs
    ]
    if P == 1:
        a_out = [[r] for r in a_out]
    b_out = [
        _lm_merge.remote(min_count, *[a_out[b][p] for b in range(len(a_out))])
        for p in range(P)
    ]
    return pa.concat_tables(ray.get(b_out))


def _empty_counts() -> pa.Table:
    return pa.table(
        {
            "bh": pa.array([], pa.int64()),
            "h1": pa.array([], pa.int64()),
            "c12": pa.array([], pa.int64()),
        }
    )


def _block_pair_keys(
    t: pa.Table, text_col: str, seed: int, group_col: str | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One block's per-bigram (bh, h1, bigram-doc-index) — uint64 keys.

    With ``group_col``, the group's hash is mixed into BOTH keys, so
    one pass fits/scores a separate conditional model per group
    (CCNet's per-language LM) with zero structural change: ``(g, t1,
    t2)`` and ``(g, t1)`` become single 64-bit keys.
    """
    flat, doc_idx = _block_token_stream(t, text_col)
    n = len(flat)
    e = np.empty(0, np.uint64)
    if n < 2:
        return e, e, np.empty(0, np.int64)
    h = hash_utf8_array(flat, seed=seed)
    same_doc = doc_idx[:-1] == doc_idx[1:]
    h1, h2 = h[:-1][same_doc], h[1:][same_doc]
    bg_doc = doc_idx[:-1][same_doc]
    if h1.size == 0:
        return e, e, np.empty(0, np.int64)
    if group_col is not None:
        gcol = t[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        gh_doc = hash_utf8_array(gcol, seed=seed ^ 0x9E37)
        gh = gh_doc[bg_doc]
        h1 = _pair_hash(gh, h1)
    bh = _pair_hash(h1, h2)
    return bh, h1, bg_doc


def _block_pair_counts(
    t: pa.Table, text_col: str, seed: int, group_col: str | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One block's (bh, h1, c12) partial — uint64/uint64/int64."""
    bh, h1, _ = _block_pair_keys(t, text_col, seed, group_col)
    e = np.empty(0, np.uint64)
    if bh.size == 0:
        return e, e, np.empty(0, np.int64)
    order = np.argsort(bh, kind="stable")
    sb = bh[order]
    starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    counts = np.diff(np.r_[starts, sb.size]).astype(np.int64)
    return sb[starts], h1[order][starts], counts


@ray.remote
def _lm_shard(
    block: pa.Table, text_col: str, seed: int, P: int, group_col=None
):
    """Round A: one block's partial counts, split into P hash
    partitions by ``bh % P``."""
    bh, h1, c12 = _block_pair_counts(block, text_col, seed, group_col)
    part = (bh % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(1, P))
    out = [
        (b, u, c)
        for b, u, c in zip(
            np.split(bh[order], cuts),
            np.split(h1[order], cuts),
            np.split(c12[order], cuts),
        )
    ]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _lm_merge(min_count: int, *chunks) -> pa.Table:
    """Round B: sum one bh-partition's counts across all blocks
    (numpy sort + reduceat; h1 is constant per bh modulo collision —
    a collision would fail the string-space SQL oracle).

    ``min_count`` pruning happens HERE, not on the driver: after the
    merge this partition holds the COMPLETE global count for each of
    its keys, so partition-local pruning is exact — and it is what
    makes the open-vocabulary regime work at all (3.2M synthetic web
    pages produced 467M distinct bigrams, an 11 GB unprunable model;
    hapax bigrams are the overwhelming majority and carry the least
    signal)."""
    if not chunks:
        return _empty_counts()
    bh = np.concatenate([c[0] for c in chunks])
    h1 = np.concatenate([c[1] for c in chunks])
    c12 = np.concatenate([c[2] for c in chunks])
    if bh.size == 0:
        return _empty_counts()
    order = np.argsort(bh, kind="stable")
    sb, sh, sc = bh[order], h1[order], c12[order]
    starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    sums = np.add.reduceat(sc, starts)
    ub, uh = sb[starts], sh[starts]
    if min_count > 1:
        keep = sums >= min_count
        ub, uh, sums = ub[keep], uh[keep], sums[keep]
    return pa.table(
        {
            "bh": pa.array(ub.view(np.int64), pa.int64()),
            "h1": pa.array(uh.view(np.int64), pa.int64()),
            "c12": pa.array(sums.astype(np.int64), pa.int64()),
        }
    )


_PAIR_MULT = np.uint64(0x100000001B3)  # FNV-64 prime


def _pair_hash(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit combine of two token hashes."""
    from nlshray.hashing import splitmix64

    return splitmix64((h1 * _PAIR_MULT) ^ h2)


def build_cost_model(counts: pa.Table):
    """(sorted bigram pair-hashes, int64 micro-nat costs) derived once
    on the driver from the merged counts table."""
    bh = counts["bh"].to_numpy(zero_copy_only=False).view(np.uint64)
    h1 = counts["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
    c12 = counts["c12"].to_numpy(zero_copy_only=False).astype(np.int64)
    # prefix totals c1 over the model's OWN rows (= unigram count of t1
    # as a bigram prefix; matches the SQL replay's SUM(c12) GROUP BY t1)
    _, inv = np.unique(h1, return_inverse=True)
    c1 = np.bincount(inv, weights=c12)
    codes = bh.copy()
    order = np.argsort(codes)
    codes = codes[order]
    if len(codes) and (codes[1:] == codes[:-1]).any():  # pragma: no cover
        raise RuntimeError("bigram pair-hash collision")
    cost = np.round(-np.log(c12 / c1[inv]) * MICRO).astype(np.int64)[order]
    return codes, cost


def score_perplexity(
    docs: ray.data.Dataset,
    counts: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    unseen_cost: int | None = None,
    carry_cols: tuple[str, ...] = (),
    group_col: str | None = None,
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
    model_ref = ray.put(build_cost_model(counts))

    def score(t: pa.Table) -> pa.Table:
        codes, cost = ray.get(model_ref)
        code, _h1, bg_doc = _block_pair_keys(t, text_col, seed, group_col)
        n_docs = t.num_rows
        if code.size == 0:
            nll = np.zeros(n_docs, dtype=np.int64)
            nbg = np.zeros(n_docs, dtype=np.int64)
        else:
            if len(codes):
                pos = np.searchsorted(codes, code)
                pos_c = np.minimum(pos, len(codes) - 1)
                hit = codes[pos_c] == code
            else:  # empty model: every bigram is a miss
                pos_c = np.zeros(code.shape[0], np.int64)
                cost = np.zeros(1, np.int64)
                hit = np.zeros(code.shape[0], np.bool_)
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
    group_col: str | None = None,
) -> ray.data.Dataset:
    """Self-scored corpus perplexity: fit on ``docs``, score ``docs``.
    With ``group_col``, fit/score one conditional model per group
    (CCNet's per-language LM) in the same two passes."""
    counts = fit_bigram_counts(
        docs,
        text_col=text_col,
        num_partitions=num_partitions,
        seed=seed,
        group_col=group_col,
    )
    return score_perplexity(
        docs,
        counts,
        text_col=text_col,
        id_col=id_col,
        seed=seed,
        carry_cols=carry_cols,
        group_col=group_col,
    )


def merge_bigram_counts(*tables: pa.Table) -> pa.Table:
    """Merge any number of fitted count tables by key — bigram counts
    form a commutative monoid, so daily-crawl increments compose:
    ``fit(A + B) == merge(fit(A), fit(B))`` exactly (same sort +
    reduceat kernel as the distributed merge round). Enables
    incremental model maintenance without refitting the full corpus;
    re-apply ``min_count`` pruning AFTER merging if pruned inputs are
    used (a bigram below threshold in each increment can clear it in
    the union — prune-then-merge undercounts, documented)."""
    tbls = [t for t in tables if t.num_rows]
    if not tbls:
        return _empty_counts()
    cat = pa.concat_tables(tbls)
    bh = cat["bh"].to_numpy(zero_copy_only=False).view(np.uint64)
    h1 = cat["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
    c12 = cat["c12"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bh, kind="stable")
    sb, sh, sc = bh[order], h1[order], c12[order]
    starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    sums = np.add.reduceat(sc, starts)
    return pa.table(
        {
            "bh": pa.array(sb[starts].view(np.int64), pa.int64()),
            "h1": pa.array(sh[starts].view(np.int64), pa.int64()),
            "c12": pa.array(sums.astype(np.int64), pa.int64()),
        }
    )
