"""Batched 128-permutation MinHash.

Descendant of the reference's hash-encoder kernel: there, a batch of
vectors runs through a learned encoder and thresholding to produce a
(batch, hash_size) binary code matrix (``/root/reference/nlsh/hashings.py:66-85``);
here, a batch of shingle-hash sets runs through 128 seeded uint64
permutations to produce a (batch, 128) signature matrix. Both are
batch-vectorized 'vector -> code' maps; ours needs no training.

Permutation j is ``splitmix64(h XOR seed_j)`` — splitmix64's finalizer is
a bijection on uint64, so each seed induces a genuine permutation of the
shingle-hash universe; the signature slot is the min over the document's
shingles under that permutation.
"""

from __future__ import annotations

import numpy as np

from nlshray.hashing import _seed_mix, splitmix64, splitmix64_xor_into


def perm_seeds(num_perms: int, seed: int) -> np.ndarray:
    """num_perms uint64 permutation seeds derived from one config seed.

    Seed-derived and stateless — every worker regenerates the identical
    table (SURVEY.md ST4); nothing is shipped.
    """
    base = np.arange(num_perms, dtype=np.uint64) ^ np.uint64(seed * 0x9E3779B9 + 1)
    return splitmix64(base)


# shingle-hash tile size: small enough that a tile plus splitmix
# temporaries stays in L2 across all num_perms passes — the kernel is
# otherwise DRAM-bandwidth-bound (128 full-array passes) and stops
# scaling past a few cores
_TILE_SHINGLES = 16_384


def sign_concat(
    flat: np.ndarray, lengths: np.ndarray, seeds: np.ndarray
) -> np.ndarray:
    """MinHash signatures for a batch in flat+lengths layout.

    ``flat``: concatenated uint64 shingle hashes; ``lengths[i] >= 1``.
    Returns (n_docs, len(seeds)) uint64. Tiled over documents: each tile
    of shingle hashes is mixed under all permutations while cache-hot,
    never allocating a (n_shingles, n_perms) matrix.
    """
    n_docs = lengths.shape[0]
    n_perms = seeds.shape[0]
    sigs = np.empty((n_docs, n_perms), dtype=np.uint64)
    if n_docs == 0:
        return sigs
    flat = flat.astype(np.uint64, copy=False)
    ends = np.cumsum(lengths)
    starts = ends - lengths

    # scratch reused across every tile x permutation: the allocating form
    # (splitmix64(tile ^ seed)) creates ~5 tile-sized temporaries per
    # perm — ~25 GB of allocator/first-touch traffic per 25k-doc block
    mixed = np.empty(_TILE_SHINGLES, dtype=np.uint64)
    tmp = np.empty(_TILE_SHINGLES, dtype=np.uint64)
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while d1 < n_docs and ends[d1 - 1] - starts[d0] < _TILE_SHINGLES:
            d1 += 1
        tile = flat[starts[d0] : ends[d1 - 1]]
        m = tile.shape[0]
        if m > mixed.shape[0]:  # single doc longer than the tile budget
            mixed = np.empty(m, dtype=np.uint64)
            tmp = np.empty(m, dtype=np.uint64)
        tstarts = (starts[d0:d1] - starts[d0]).astype(np.int64)
        mv, tv = mixed[:m], tmp[:m]
        for j in range(n_perms):
            splitmix64_xor_into(tile, seeds[j], mv, tv)
            sigs[d0:d1, j] = np.minimum.reduceat(mv, tstarts)
        d0 = d1
    return sigs


def oph_sign_concat(
    flat: np.ndarray, lengths: np.ndarray, num_perms: int, seed: int
) -> np.ndarray:
    """One-permutation MinHash with rotation densification — the scale
    signer (public method: Li, Owen & Zhang, NIPS 2012; densification
    Shrivastava & Li, ICML 2014).

    ONE splitmix pass over the shingles instead of ``num_perms`` passes:
    each shingle hash is remixed once, its top ``log2(num_perms)`` bits
    pick a signature slot, and the slot keeps the per-document minimum.
    Empty slots densify by circular borrow from the nearest non-empty
    slot to the right, offset by ``C * distance`` so borrowed slots only
    collide when both documents borrowed the same value over the same
    distance. Output shape/semantics match ``sign_concat``: slot-match
    fraction is an unbiased Jaccard estimate, so banding, pair
    generation and the verify estimator consume OPH signatures
    unchanged. Trade-off vs the 128-pass signer: ~num_perms× less hash
    compute, slightly higher estimator variance for documents with few
    shingles (slots behave like sampled-without-replacement bins).
    """
    from nlshray.functions.nputil import segment_ids

    n_docs = lengths.shape[0]
    P = int(num_perms)
    if P & (P - 1) or P < 2:
        raise ValueError(f"oph signer requires power-of-two num_perms, got {P}")
    if n_docs == 0:
        return np.empty((0, P), dtype=np.uint64)
    flat = flat.astype(np.uint64, copy=False)
    h = splitmix64(flat ^ _OPH_SALT ^ _seed_mix(seed))
    doc = segment_ids(lengths.astype(np.int64, copy=False))
    shift = np.uint64(64 - (P.bit_length() - 1))

    # scatter-min into a (doc, bin) grid — keys arrive doc-grouped, so
    # ufunc.at stays cache-local (measured ~40x faster than a lexsort)
    key = doc * P + (h >> shift).astype(np.int64)
    sig_flat = np.full(n_docs * P, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    np.minimum.at(sig_flat, key, h)
    filled_flat = np.zeros(n_docs * P, dtype=np.bool_)
    filled_flat[key] = True
    sigs = sig_flat.reshape(n_docs, P)
    filled = filled_flat.reshape(n_docs, P)

    rows = np.flatnonzero(~filled.all(axis=1))
    if rows.shape[0]:
        orig = sigs[rows]
        fil = filled[rows]
        out = orig.copy()
        need = ~fil
        C = np.uint64(0x27D4EB2F165667C5)
        with np.errstate(over="ignore"):  # uint64 wraparound is the point
            for t in range(1, P):
                if not need.any():
                    break
                take = need & np.roll(fil, -t, axis=1)
                if take.any():
                    out = np.where(
                        take, np.roll(orig, -t, axis=1) + C * np.uint64(t), out
                    )
                    need &= ~take
        sigs[rows] = out
    return sigs


_OPH_SALT = np.uint64(0x9E3779B97F4A7C15)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Row-wise estimated Jaccard = fraction of matching signature slots.

    Batch shape (n_pairs, num_perms) x2 -> (n_pairs,) float64. The
    engine's stand-in for the reference's batched code-distance kernels
    (``/root/reference/nlsh/learning/distances.py:245-312``).
    """
    return (sig_a == sig_b).mean(axis=1)
