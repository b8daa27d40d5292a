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

from nlshray.functions.nputil import segmented_rev_arange

_U64 = np.uint64
# splitmix64 finalizer constants (public domain, Steele et al.)
_C1 = _U64(0xBF58476D1CE4E5B9)
_C2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)
# polynomial-fold multiplier (odd => bijective per step mod 2^64)
_POLY = _U64(0x100000001B3)  # FNV-1a 64 prime
# independent second multiplier (MurmurHash64A constant) for the
# verification hash: a poly-fold collision is fold-structural, so it
# survives ANY finalizer seed — independence requires a different
# multiplier, and a simultaneous collision under two unrelated odd
# multipliers is a ~2^-126 event
_POLY2 = _U64(0xC6A4A7935BD1E995)

MASK63 = (1 << 63) - 1  # doc ids are masked to 63 bits -> int64-safe everywhere

# poly_fold_ragged tile: elements per segment-aligned tile; u64
# temporaries are ~4 x 8 B/element, so 64k elements ~ 2 MB -> L2-resident
_TILE_FOLD = 1 << 16


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a bijection on uint64.

    XOR-ing with distinct seeds before finalizing yields the family of
    'random permutations of the key universe' that MinHash needs (the
    engine's stand-in for the reference's learned hash encoder,
    ``/root/reference/nlsh/hashings.py:66-85``).
    """
    with np.errstate(over="ignore"):
        z = x.astype(_U64, copy=True)
        z += _GOLDEN
        z ^= z >> _U64(30)
        z *= _C1
        z ^= z >> _U64(27)
        z *= _C2
        z ^= z >> _U64(31)
        return z


def splitmix64_xor_into(
    x: np.ndarray, seed: np.uint64, out: np.ndarray, tmp: np.ndarray
) -> np.ndarray:
    """``splitmix64(x ^ seed)`` with ZERO allocations — ``out`` and
    ``tmp`` are caller-provided uint64 scratch of x's shape.

    Bit-identical to ``splitmix64(x ^ seed)`` (same wraparound ops in
    the same order). Exists for the MinHash perm loop: the allocating
    form creates ~5 tile-sized temporaries per permutation x tile —
    tens of GB of allocator/first-touch traffic per block — while this
    variant keeps the working set at exactly 3 cache-hot buffers.
    """
    with np.errstate(over="ignore"):
        np.bitwise_xor(x, seed, out=out)
        out += _GOLDEN
        np.right_shift(out, _U64(30), out=tmp)
        out ^= tmp
        out *= _C1
        np.right_shift(out, _U64(27), out=tmp)
        out ^= tmp
        out *= _C2
        np.right_shift(out, _U64(31), out=tmp)
        out ^= tmp
    return out


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a byte string (blake2b, 8-byte digest).

    Kept for one-off uses (config fingerprints); the corpus-scale paths
    use the vectorized polynomial kernels below — a cryptographic hash
    is overkill for shingling and its per-call python cost was the
    measured serial floor of the whole pipeline (~585 docs/s/core).
    """
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def _seed_mix(seed: int) -> np.uint64:
    return splitmix64(np.array([np.uint64(seed)], dtype=np.uint64))[0]


def poly_fold_ragged(
    values: np.ndarray, lengths: np.ndarray, mult: np.uint64 = _POLY
) -> np.ndarray:
    """Segmented ``acc = acc * P + v`` fold, vectorized over segments.

    ``values``: contiguous concatenation of all segments (any int dtype,
    promoted to uint64); ``lengths``: per-segment element counts (>= 0).
    Returns one raw uint64 per segment (NO splitmix finalize — callers
    add their own). Equivalent to ``sum(v_i * P^(L-1-i)) mod 2^64``,
    computed with a power table + one wrapping cumsum — no per-segment
    python. Empty segments fold to 0. ``mult`` selects the multiplier
    (pass ``_POLY2`` for an independent verification hash).
    """
    lengths = lengths.astype(np.int64, copy=False)
    n = lengths.shape[0]
    m = int(lengths.sum())
    out = np.zeros(n, dtype=_U64)
    if m == 0:
        return out
    ends = np.cumsum(lengths)
    starts = ends - lengths
    maxlen = int(lengths.max())
    # NOTE: every kernel here wraps mod 2^64 on purpose; without
    # errstate numpy's overflow-warning machinery costs ~1 us/WARNING
    # CHECK (measured 2.5 s vs 12 ms for one 3M-element cumsum)
    with np.errstate(over="ignore"):
        pows = np.empty(maxlen, dtype=_U64)
        pows[0] = _U64(1)
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, mult, dtype=_U64), out=pows[1:]
            )
        # Tiled over segment groups: the uint64 temporaries (exp,
        # contrib, cumsum) inflate byte input 8x each — unbounded they
        # thrash worker heaps on block-sized batches (measured 120 s for
        # an 800k-doc materialize vs ~4 s tiled). Tiles stay L2-resident.
        s0 = 0
        while s0 < n:
            # first segment whose end crosses the tile budget closes the
            # tile (searchsorted, NOT a per-segment scan: segments are
            # tokens here, and a python increment per token was ~3 s of
            # the ~9 s token-hash cost on a 25k-doc block)
            s1 = min(
                int(
                    np.searchsorted(
                        ends, starts[s0] + _TILE_FOLD, side="left"
                    )
                )
                + 1,
                n,
            )
            lo, hi = starts[s0], ends[s1 - 1]
            v = values[lo:hi].astype(_U64, copy=False)
            seg_ends = ends[s0:s1] - lo
            seg_lens = lengths[s0:s1]
            # exponent of element j in its segment: descending
            # [len-1 .. 0] ranges (cumsum form; np.repeat here cost
            # ~2x the fold itself on token-scale batches)
            exp = segmented_rev_arange(seg_lens)
            contrib = v * pows[exp]
            cs = np.concatenate([[_U64(0)], np.cumsum(contrib, dtype=_U64)])
            out[s0:s1] = cs[seg_ends] - cs[seg_ends - seg_lens]
            s0 = s1
        return out


def _string_array_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """(byte values concatenated per string, per-string byte lengths)
    for a flat Arrow String/Binary array — zero-copy views of its
    buffers wherever the values are contiguous (always true for freshly
    built arrays, e.g. the output of split kernels).

    Handles both 32-bit (string/binary) and 64-bit (large_string/
    large_binary) offset widths — misreading a large_* buffer as int32
    would silently hash every row identically."""
    import pyarrow as pa

    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        off_dtype = np.int32
    else:
        raise TypeError(f"unsupported array type for byte hashing: {t}")
    offs_buf = arr.buffers()[1]
    offs = np.frombuffer(offs_buf, dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    return data[offs[0] : offs[-1]], np.diff(offs)


def hash_utf8_array(arr, seed: int = 0, mult: np.uint64 = _POLY) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow string/binary array.

    Polynomial fold over each value's utf-8 bytes (P = FNV-64 prime, so
    in-byte-range coefficient compensation a la the classic 31-multiplier
    collisions is impossible) + splitmix64 finalize XOR seed. Replaces
    the per-row python blake2b that was the hottest serial cost in the
    exact-dup and shingling stages.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    elif not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), pa.string())
    data, lengths = _string_array_bytes(arr)
    raw = poly_fold_ragged(data, lengths, mult=mult)
    return splitmix64(raw ^ _seed_mix(seed))


def hash_str_array(strings, seed: int = 0) -> np.ndarray:
    """Hash strings to uint64 (deterministic, vectorized)."""
    return hash_utf8_array(strings, seed=seed)


def doc_id_from_url(url: str) -> int:
    """Content-derived doc identity (SURVEY.md §1.2): 63-bit hash of url.

    Masked to 63 bits so ids survive int64 round-trips through pandas,
    DuckDB and Parquet without sign surprises.
    """
    return int(doc_ids_from_urls([url])[0])


def doc_ids_from_urls(urls) -> np.ndarray:
    return (hash_utf8_array(urls, seed=0xD0C) & np.uint64(MASK63)).astype(
        np.int64
    )


def poly_fold(window: np.ndarray) -> np.ndarray:
    """Fold the trailing axis of a uint64 array into one uint64 per row.

    MSB-first polynomial accumulation ``acc = acc * P + x`` — the direct
    descendant of the reference's ``out = (out << 1) | bit`` bit-pack
    (``/root/reference/nlsh/utils.pyx:13-14``) generalized from bits to
    64-bit lanes — followed by a splitmix64 finalize.
    """
    w = window.astype(_U64, copy=False)
    acc = np.zeros(w.shape[:-1], dtype=_U64)
    with np.errstate(over="ignore"):
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
    with np.errstate(over="ignore"):
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
