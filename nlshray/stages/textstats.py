"""Text-analysis stages: language-ID, quality scoring, token counts,
fingerprints — actor-pool ``map_batches`` over the documents table.

The stateful-class shape follows ST1 (SURVEY.md §2.3): profiles/regexes
are built once per actor in ``__init__``; batches stream through
``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.functions.textstats import batch_textstats


class TextAnalyzer:
    """Per-doc quality features + language guess + fingerprint.

    One vectorized kernel per batch (Arrow RE2 counts + segmented
    numpy); bit-identical to the scalar ``quality_features`` /
    ``detect_lang`` / ``doc_fingerprint`` reference functions (tested)."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = batch_textstats(batch["text"])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_chars": pa.array(f["n_chars"], pa.int64()),
                "n_tokens": pa.array(f["n_tokens"], pa.int64()),
                "n_ws_tokens": pa.array(f["n_ws_tokens"], pa.int64()),
                "n_pieces": pa.array(f["n_pieces"], pa.int64()),
                "mean_token_len": pa.array(f["mean_token_len"], pa.float64()),
                "punct_ratio": pa.array(f["punct_ratio"], pa.float64()),
                "stop_ratio": pa.array(f["stop_ratio"], pa.float64()),
                "digit_ratio": pa.array(f["digit_ratio"], pa.float64()),
                "quality": pa.array(f["quality"], pa.float64()),
                "lang_guess": pa.array(f["lang_guess"].tolist(), pa.string()),
                "fingerprint": pa.array(f["fingerprint"], pa.int64()),
            }
        )


def textstats_stage(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    batch_size: int = 1024,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return docs.select_columns([id_col, "text"]).map_batches(
        TextAnalyzer,
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def token_repetition_arrays(texts) -> dict[str, np.ndarray]:
    """Gopher-style repetition signals per document, fully vectorized
    (public rules: Rae et al. 2021 §A1.1 "repetitious" filters —
    duplicate-token and top-1-gram fractions flag boilerplate/spam).

    Returns per-doc ``n_tokens``, ``n_distinct_tokens``,
    ``max_token_count`` (count of the most frequent token) and the two
    derived fractions. Token identity rides on the 64-bit token hash
    (same collision stance as the MinHash oracle chain: the SQL oracle
    compares actual token strings, so a collision would be caught).
    One sort per batch: token hashes arrive doc-grouped, so a stable
    within-doc ordering by hash turns distinct/max-count into run-length
    scans (no python per doc).
    """
    from nlshray.functions.shingles import batch_token_hashes
    from nlshray.hashing import splitmix64

    flat, counts = batch_token_hashes(texts)
    n_docs = counts.shape[0]
    n_tok = counts.astype(np.int64, copy=False)
    n_distinct, max_run = _segmented_value_stats(flat, n_tok, n_docs)

    # order-preserving bigram hashes: positions i, i+1 within one doc
    from nlshray.functions.nputil import segment_ids

    n_bg = np.maximum(n_tok - 1, 0)
    if flat.shape[0]:
        doc = segment_ids(n_tok)
        valid = np.flatnonzero(doc[:-1] == doc[1:]) if flat.shape[0] > 1 else (
            np.empty(0, np.int64)
        )
        bg = splitmix64(
            flat[valid] ^ splitmix64(flat[valid + 1] ^ _BIGRAM_SALT)
        )
    else:
        bg = np.empty(0, np.uint64)
    bg_distinct, bg_max = _segmented_value_stats(bg, n_bg, n_docs)

    denom = np.maximum(n_tok, 1).astype(np.float64)
    has = n_tok > 0
    denom_bg = np.maximum(n_bg, 1).astype(np.float64)
    has_bg = n_bg > 0
    return {
        "n_tokens": n_tok,
        "n_distinct_tokens": n_distinct,
        "max_token_count": max_run,
        "dup_token_frac": np.where(has, 1.0 - n_distinct / denom, 0.0),
        "top_token_frac": np.where(has, max_run / denom, 0.0),
        "n_bigrams": n_bg,
        "n_distinct_bigrams": bg_distinct,
        "dup_bigram_frac": np.where(
            has_bg, 1.0 - bg_distinct / denom_bg, 0.0
        ),
        "top_bigram_frac": np.where(has_bg, bg_max / denom_bg, 0.0),
    }


_BIGRAM_SALT = np.uint64(0xA24BAED4963EE407)


def _segmented_value_stats(
    vals: np.ndarray, seg_lens: np.ndarray, n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """(per-segment distinct count, per-segment max multiplicity) of a
    doc-grouped flat value array — one stable sort, then run-length
    scans (no python per doc)."""
    from nlshray.functions.nputil import lexsort2, segment_ids

    n_distinct = np.zeros(n_docs, np.int64)
    max_run = np.zeros(n_docs, np.int64)
    if vals.shape[0]:
        doc = segment_ids(seg_lens.astype(np.int64, copy=False))
        order = lexsort2(vals, doc)
        hs, ds = vals[order], doc[order]
        newrun = np.empty(hs.shape[0], np.bool_)
        newrun[0] = True
        newrun[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
        run_starts = np.flatnonzero(newrun)
        run_doc = ds[run_starts]
        run_len = np.diff(np.append(run_starts, hs.shape[0]))
        n_distinct = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
        doc_first = np.flatnonzero(
            np.append(True, run_doc[1:] != run_doc[:-1])
        )
        max_run[run_doc[doc_first]] = np.maximum.reduceat(run_len, doc_first)
    return n_distinct, max_run


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rule_arrays(texts) -> dict[str, np.ndarray]:
    """Per-doc signals for the published Gopher quality rules (Rae et
    al. 2021, "Scaling Language Models", Appendix A1.1), adapted to the
    engine's canonical ``[0-9a-z_]+`` tokenizer (word := token):

    - ``n_words`` in [50, 100_000]
    - mean word length in [3, 10]
    - fraction of words containing an alphabetic character >= 0.80
    - >= 2 occurrences of the Gopher stop-word list (the, be, to, of,
      and, that, have, with — the paper requires two of these words;
      occurrences rather than distinct members so the signal is graded)
    - symbol-to-word ratio (``#`` or ``...``) <= 0.10

    Returns ONLY the five non-repetition signals above (``n_words``,
    ``mean_word_len``, ``frac_alpha_words``, ``n_stop_hits``,
    ``symbol_ratio``). The paper's repetition gates (most-common-token
    fraction <= 0.20, most-common-bigram fraction <= 0.18 — the
    token-level analog of its top-n-gram character fractions) are NOT
    computed here: ``gopher_quality_filter`` combines this dict with
    ``token_repetition_arrays`` (same single-sort kernel the
    ``repetition_stats`` oracle pins) at the call site.

    One pass of Arrow kernels over the batch (split / utf8_length /
    match_substring_regex / is_in), segment-summed back per doc. The
    reference has no quality filter (it consumes pre-cleaned GloVe
    vectors, /root/reference/nlsh/data.py:23-49); this is the hygiene
    stage a web corpus needs before doc-level signatures.
    """
    import pyarrow.compute as pc

    from nlshray.functions.shingles import _SPLIT_PATTERN

    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0
    per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    per_doc = per_doc.astype(np.int64)
    ends = np.cumsum(per_doc)

    def seg_sum(vals: np.ndarray) -> np.ndarray:
        cs = np.concatenate([[0], np.cumsum(vals.astype(np.int64))])
        return cs[ends] - cs[ends - per_doc]

    n_words = seg_sum(keep)
    sum_len = seg_sum(np.where(keep, lens, 0))
    alpha = pc.match_substring_regex(flat, "[a-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha = seg_sum(alpha & keep)
    stop = pc.is_in(
        flat, value_set=pa.array(list(GOPHER_STOPWORDS), pa.string())
    ).to_numpy(zero_copy_only=False)
    n_stop = seg_sum(stop & keep)
    n_sym = (
        pc.count_substring(arr, "#").to_numpy(zero_copy_only=False).astype(np.int64)
        + pc.count_substring(arr, "...")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    denom = np.maximum(n_words, 1).astype(np.float64)
    has = n_words > 0
    return {
        "n_words": n_words,
        "mean_word_len": np.where(has, sum_len / denom, 0.0),
        "frac_alpha_words": np.where(has, n_alpha / denom, 0.0),
        "n_stop_hits": n_stop,
        "symbol_ratio": n_sym / denom,
    }
