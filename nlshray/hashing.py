"""Deterministic, vectorized 64-bit hash kernels.

Role model: the reference's Cython bit-pack kernel that turns a binary
code matrix into integer bucket keys (``/root/reference/nlsh/utils.pyx:7-32``,
pure-python twin ``eval.py:49-53``). There, a per-vector bit vector is
folded MSB-first into one int key. Here the same "vector -> integer key"
fold appears three times, all as numpy uint64 kernels (no Cython needed —
numpy wraparound arithmetic is the vectorization):

* token-hash window -> shingle hash      (``shingle_hashes``)
* signature-slot window -> band hash     (``band_hashes``)
* arbitrary bytes -> stable 64-bit id    (``hash_bytes_u64`` / ``hash_str_array``)

All randomness derives from explicit integer seeds (the reference seeds
nothing — SURVEY.md §4 'Determinism'); identical results at any
parallelism level.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
# splitmix64 finalizer constants (public domain, Steele et al.)
_C1 = _U64(0xBF58476D1CE4E5B9)
_C2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)
# polynomial-fold multiplier (odd => bijective per step mod 2^64)
_POLY = _U64(0x100000001B3)  # FNV-1a 64 prime

MASK63 = (1 << 63) - 1  # doc ids are masked to 63 bits -> int64-safe everywhere


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a bijection on uint64.

    XOR-ing with distinct seeds before finalizing yields the family of
    'random permutations of the key universe' that MinHash needs (the
    engine's stand-in for the reference's learned hash encoder,
    ``/root/reference/nlsh/hashings.py:66-85``).
    """
    z = x.astype(_U64, copy=True)
    z += _GOLDEN
    z ^= z >> _U64(30)
    z *= _C1
    z ^= z >> _U64(27)
    z *= _C2
    z ^= z >> _U64(31)
    return z


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a byte string (blake2b, 8-byte digest)."""
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash_str_array(strings, seed: int = 0) -> np.ndarray:
    """Hash an iterable of python strings to uint64 (deterministic).

    Per-string blake2b with memoization across the batch — the per-call
    cost is amortized because web-text token vocabularies repeat heavily
    within a batch. Unseen-string cost ~0.5 us; repeats are dict hits.
    """
    salt = seed.to_bytes(8, "little")
    cache: dict[str, int] = {}
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        v = cache.get(s)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=salt).digest(),
                "little",
            )
            cache[s] = v
        out[i] = v
    return out


def doc_id_from_url(url: str) -> int:
    """Content-derived doc identity (SURVEY.md §1.2): 63-bit hash of url.

    Masked to 63 bits so ids survive int64 round-trips through pandas,
    DuckDB and Parquet without sign surprises.
    """
    return hash_bytes_u64(url.encode("utf-8"), seed=0xD0C) & MASK63


def doc_ids_from_urls(urls) -> np.ndarray:
    salt = (0xD0C).to_bytes(8, "little")
    out = np.empty(len(urls), dtype=np.int64)
    for i, u in enumerate(urls):
        v = int.from_bytes(
            hashlib.blake2b(u.encode("utf-8"), digest_size=8, salt=salt).digest(),
            "little",
        )
        out[i] = v & MASK63
    return out


def poly_fold(window: np.ndarray) -> np.ndarray:
    """Fold the trailing axis of a uint64 array into one uint64 per row.

    MSB-first polynomial accumulation ``acc = acc * P + x`` — the direct
    descendant of the reference's ``out = (out << 1) | bit`` bit-pack
    (``/root/reference/nlsh/utils.pyx:13-14``) generalized from bits to
    64-bit lanes — followed by a splitmix64 finalize.
    """
    w = window.astype(_U64, copy=False)
    acc = np.zeros(w.shape[:-1], dtype=_U64)
    for i in range(w.shape[-1]):
        acc = acc * _POLY + w[..., i]
    return splitmix64(acc)


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """uint64 hashes of all k-token windows of one document.

    Vectorized over windows via strided slices: window j covers tokens
    [j, j+k). Returns shape (n_tokens - k + 1,); empty when the doc has
    fewer than k tokens (callers treat whole-doc-as-one-shingle instead).
    """
    n = token_hashes.shape[0]
    if n < k:
        return np.empty(0, dtype=np.uint64)
    t = token_hashes.astype(_U64, copy=False)
    acc = np.zeros(n - k + 1, dtype=_U64)
    for i in range(k):
        acc = acc * _POLY + t[i : n - k + 1 + i]
    return splitmix64(acc)


def band_hashes(sigs: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n_docs, num_perms) uint64 signatures -> (n_docs, bands) band keys."""
    n = sigs.shape[0]
    w = sigs.reshape(n, bands, rows_per_band)
    out = poly_fold(w)
    # mix in the band index so identical slot-windows in different bands
    # cannot collide onto one key by accident
    out ^= splitmix64(np.arange(bands, dtype=np.uint64))[None, :]
    return out
