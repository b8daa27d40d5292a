"""Text-analysis kernels for training-data curation.

Beyond the reference's scope (it processes dense vectors only), these are
the standard web-text quality operators a 100 TB pipeline needs; all are
pure functions over the text bytes, deterministic, vectorized per batch.
"""

from __future__ import annotations

import re

import numpy as np

from nlshray.hashing import splitmix64

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish word/punct pieces: word chars | single non-word-non-space
_PIECE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

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
    """Tokens by whitespace split (the SQL-parity token counter)."""
    t = text.strip()
    return len(_WS_RE.split(t)) if t else 0


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
        sum(ch.isdigit() for ch in text) / n_chars if n_chars else 0.0
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
