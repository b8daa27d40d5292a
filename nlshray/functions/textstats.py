"""Text-analysis kernels for training-data curation.

Beyond the reference's scope (it processes dense vectors only), these are
the standard web-text quality operators a 100 TB pipeline needs; all are
pure functions over the text bytes, deterministic, vectorized per batch.
"""

from __future__ import annotations

import re

import numpy as np

from nlshray.hashing import splitmix64

# ASCII character classes throughout — matching the batch kernel's RE2
# definitions EXACTLY (RE2's fast scan is ASCII-classed; a Unicode \w
# here would change semantics between the scalar and batch paths on
# non-ASCII text). Non-ASCII word chars count as punctuation/separators
# in both paths; tested on de/fr text.
_WS_RE = re.compile(r"\S+", re.ASCII)
_TOKEN_RE = re.compile(r"[0-9a-z_]+")
# BPE-ish word/punct pieces: word chars | single non-word-non-space
_PIECE_RE = re.compile(r"[0-9a-zA-Z_]+|[^0-9a-zA-Z_\s]", re.ASCII)
_PUNCT_RE = re.compile(r"[^0-9a-zA-Z_\s]", re.ASCII)
_DIGIT_RE = re.compile(r"[0-9]")

# compact stopword profiles for the n-gram/stopword language heuristic
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is that it for was on are with as his they at be "
        "this have from or had by not but what all were when we there can".split()
    ),
    "de": frozenset(
        "der die und das ist nicht ein eine mit von auf für den dem des im "
        "sich als auch es an werden aus er hat dass sie nach wird bei um".split()
    ),
    "fr": frozenset(
        "le la les et de des en un une est pour que dans qui sur pas au aux "
        "avec ne se ce cette son ses mais ou par plus il elle nous vous".split()
    ),
}


def whitespace_token_count(text: str) -> int:
    """Tokens by whitespace split: count of ``\\S+`` runs (ASCII \\s,
    the exact definition the batch RE2 kernel counts)."""
    return len(_WS_RE.findall(text))


def piece_token_count(text: str) -> int:
    """BPE-ish piece count: words plus standalone punctuation."""
    return len(_PIECE_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Length/punctuation/stopword features + a composite quality score.

    Score in [0,1]; heuristics follow common web-text curation practice
    (length window, moderate punctuation, English-stopword presence,
    limited digit fraction).
    """
    n_chars = len(text)
    toks = _TOKEN_RE.findall(text.lower())
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    stop = _LANG_STOPWORDS["en"]
    stop_ratio = (
        sum(1 for t in toks if t in stop) / n_tokens if n_tokens else 0.0
    )
    digit_ratio = (
        len(_DIGIT_RE.findall(text)) / n_chars if n_chars else 0.0
    )
    punct_ratio = n_punct / n_chars if n_chars else 0.0

    score = 1.0
    if n_tokens < 20 or n_tokens > 100_000:
        score *= 0.3
    if not 3.0 <= mean_tok <= 12.0:
        score *= 0.5
    if punct_ratio > 0.2:
        score *= 0.5
    if digit_ratio > 0.3:
        score *= 0.5
    if stop_ratio < 0.05:
        score *= 0.7
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "mean_token_len": mean_tok,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "digit_ratio": digit_ratio,
        "quality": score,
    }


def detect_lang(text: str) -> str:
    """Stopword-profile language ID (en/de/fr/und).

    A deterministic n-gram-free heuristic: fraction of tokens hitting
    each language's stopword profile; 'und' when nothing scores.
    """
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return "und"
    best_lang, best = "und", 0.0
    for lang, stops in _LANG_STOPWORDS.items():
        hits = sum(1 for t in toks if t in stops)
        frac = hits / len(toks)
        if frac > best:
            best_lang, best = lang, frac
    return best_lang if best >= 0.02 else "und"


def doc_fingerprint(text: str, gram: int = 8) -> int:
    """Rolling-hash document fingerprint: min splitmix64 over char
    n-grams (63-bit, int64-safe). Identical texts share fingerprints;
    a single-char edit usually changes only ~gram windows, so the min
    survives most small edits — a cheap near-dup prefilter signal."""
    data = text.encode("utf-8")
    if len(data) < gram:
        data = data + b"\x00" * (gram - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = arr.shape[0] - gram + 1
    acc = np.zeros(n, dtype=np.uint64)
    for i in range(gram):
        acc = acc * np.uint64(0x100000001B3) + arr[i : n + i]
    return int(splitmix64(acc).min() & np.uint64((1 << 63) - 1))


# ---------------------------------------------------------------------------
# Vectorized batch kernel (Arrow C++ RE2 counts + segmented numpy).
# Bit-identical to the scalar functions above (tested, incl. non-ASCII
# text — both sides use the same ASCII character classes): every ratio
# is an integer-count division and the quality score multiplies the same
# constants in the same order.
# ---------------------------------------------------------------------------

import pyarrow as pa
import pyarrow.compute as pc

_LANG_ORDER = ("en", "de", "fr")   # dict iteration order of _LANG_STOPWORDS


def _seg_sums(values: np.ndarray, doc_ends: np.ndarray, per_doc: np.ndarray) -> np.ndarray:
    cs = np.concatenate([[0], np.cumsum(values)])
    return cs[doc_ends] - cs[doc_ends - per_doc]


def batch_textstats(
    texts, *, with_fingerprint: bool = True
) -> dict[str, np.ndarray]:
    """All per-doc text statistics for a batch, vectorized.

    Returns numpy arrays keyed like ``quality_features`` plus
    ``n_ws_tokens``, ``n_pieces``, ``lang_guess``, ``fingerprint``.
    ``with_fingerprint=False`` skips the 8-gram rolling-hash pass (the
    heaviest kernel here) for callers that only consume lang/quality.
    """
    from nlshray.functions.shingles import _SPLIT_PATTERN, _as_string_array
    from nlshray.hashing import _string_array_bytes

    arr = _as_string_array(texts)
    n_docs = len(arr)
    n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)

    # counts via RE2 (ASCII-equal to the python re definitions)
    n_punct = pc.count_substring_regex(arr, r"[^0-9a-zA-Z_\s]").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_digit = pc.count_substring_regex(arr, "[0-9]").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_ws = pc.count_substring_regex(arr, r"\S+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_pieces = pc.count_substring_regex(
        arr, r"[0-9a-zA-Z_]+|[^0-9a-zA-Z_\s]"
    ).to_numpy(zero_copy_only=False).astype(np.int64)

    # lowercased \w+ tokens: one split; lengths + stopword hits per doc
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_ends = np.cumsum(per_doc)
    n_tokens = _seg_sums((tok_lens > 0).astype(np.int64), doc_ends, per_doc)
    tok_chars = _seg_sums(tok_lens, doc_ends, per_doc)

    stop_hits = {}
    for lang in _LANG_ORDER:
        hits = pc.is_in(
            flat, value_set=pa.array(sorted(_LANG_STOPWORDS[lang]), pa.string())
        ).to_numpy(zero_copy_only=False)
        stop_hits[lang] = _seg_sums(hits.astype(np.int64), doc_ends, per_doc)

    nt = np.maximum(n_tokens, 1)   # guarded divisions; zero-token docs -> 0
    has_t = n_tokens > 0
    nc = np.maximum(n_chars, 1)
    has_c = n_chars > 0
    mean_tok = np.where(has_t, tok_chars / nt, 0.0)
    stop_ratio = np.where(has_t, stop_hits["en"] / nt, 0.0)
    punct_ratio = np.where(has_c, n_punct / nc, 0.0)
    digit_ratio = np.where(has_c, n_digit / nc, 0.0)

    score = np.ones(n_docs, dtype=np.float64)
    score *= np.where((n_tokens < 20) | (n_tokens > 100_000), 0.3, 1.0)
    score *= np.where((mean_tok < 3.0) | (mean_tok > 12.0), 0.5, 1.0)
    score *= np.where(punct_ratio > 0.2, 0.5, 1.0)
    score *= np.where(digit_ratio > 0.3, 0.5, 1.0)
    score *= np.where(stop_ratio < 0.05, 0.7, 1.0)

    # language: first profile (in _LANG_ORDER) achieving the strict max,
    # threshold 0.02, zero-hit docs -> und (matches detect_lang's
    # ``frac > best`` loop over dict order)
    fracs = np.stack(
        [np.where(has_t, stop_hits[l] / nt, 0.0) for l in _LANG_ORDER]
    )
    best = fracs.max(axis=0)
    winner_idx = np.argmax(fracs == best, axis=0)
    langs = np.array(_LANG_ORDER)
    lang_guess = np.where(
        (best >= 0.02) & (best > 0), langs[winner_idx], "und"
    )

    # fingerprints: segmented 8-gram rolling min over the raw bytes
    fingerprint = (
        batch_fingerprints(arr)
        if with_fingerprint
        else np.zeros(n_docs, np.int64)
    )

    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_ws_tokens": n_ws,
        "n_pieces": n_pieces,
        "mean_token_len": mean_tok,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "digit_ratio": digit_ratio,
        "quality": score,
        "lang_guess": lang_guess,
        "fingerprint": fingerprint,
    }


def batch_fingerprints(texts, gram: int = 8) -> np.ndarray:
    """Vectorized ``doc_fingerprint`` for a batch (same values)."""
    from nlshray.functions.shingles import _as_string_array
    from nlshray.hashing import _POLY, _string_array_bytes

    arr = _as_string_array(texts)
    data, lengths = _string_array_bytes(arr)
    n_docs = lengths.shape[0]
    out = np.empty(n_docs, dtype=np.int64)
    mask63 = np.uint64((1 << 63) - 1)
    long_mask = lengths >= gram
    short_idx = np.flatnonzero(~long_mask)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    m = int(data.shape[0])
    if long_mask.any():
        W = m - gram + 1
        acc = np.zeros(W, dtype=np.uint64)
        d64 = data.astype(np.uint64)
        with np.errstate(over="ignore"):
            for i in range(gram):
                acc = acc * _POLY + d64[i : W + i]
        wh = splitmix64(acc)
        # keep only windows fully inside one long doc (delta mask), then
        # one minimum.reduceat over the packed valid windows
        ls = starts[long_mask]
        n_win = lengths[long_mask] - gram + 1
        delta = np.zeros(W + 1, dtype=np.int64)
        np.add.at(delta, ls, 1)
        np.add.at(delta, ls + n_win, -1)
        valid = np.cumsum(delta[:-1]) > 0
        vwh = wh[valid]
        vstarts = np.cumsum(n_win) - n_win
        mins = np.minimum.reduceat(vwh, vstarts)
        out[long_mask] = (mins & mask63).astype(np.int64)
    for i in short_idx:
        seg = data[starts[i] : ends[i]].tobytes()
        out[i] = doc_fingerprint(seg.decode("utf-8", "surrogateescape"), gram)
    return out
