"""Unit goldens for the hash kernels (style of the reference's
``nlsh/tests/test_indexer.py`` bit-pack/groupby goldens)."""

import numpy as np

from nlshray.hashing import (
    MASK63,
    band_hashes,
    doc_id_from_url,
    doc_ids_from_urls,
    hash_bytes_u64,
    poly_fold,
    shingle_hashes,
    splitmix64,
)


def test_splitmix64_deterministic_and_mixing():
    x = np.arange(1000, dtype=np.uint64)
    a = splitmix64(x)
    b = splitmix64(x)
    assert (a == b).all()
    # bijective finalizer on distinct inputs -> no collisions
    assert len(np.unique(a)) == 1000
    # input must not pass through
    assert not (a == x).any()


def test_splitmix64_does_not_mutate_input():
    x = np.arange(10, dtype=np.uint64)
    splitmix64(x)
    assert (x == np.arange(10, dtype=np.uint64)).all()


def test_hash_bytes_u64_stable():
    assert hash_bytes_u64(b"hello") == hash_bytes_u64(b"hello")
    assert hash_bytes_u64(b"hello") != hash_bytes_u64(b"hello", seed=1)
    assert hash_bytes_u64(b"hello") != hash_bytes_u64(b"hellp")


def test_doc_ids_63bit_and_match_scalar():
    urls = ["https://a.example/1", "https://b.example/2"]
    ids = doc_ids_from_urls(urls)
    assert ids.dtype == np.int64
    assert all(0 <= i <= MASK63 for i in ids)
    assert ids[0] == doc_id_from_url(urls[0])
    assert ids[0] != ids[1]


def test_poly_fold_order_sensitive():
    w1 = np.array([[1, 2, 3]], dtype=np.uint64)
    w2 = np.array([[3, 2, 1]], dtype=np.uint64)
    assert poly_fold(w1)[0] != poly_fold(w2)[0]
    assert poly_fold(w1)[0] == poly_fold(w1.copy())[0]


def test_shingle_hashes_window_semantics():
    t = splitmix64(np.arange(10, dtype=np.uint64))
    sh = shingle_hashes(t, 3)
    assert sh.shape == (8,)
    # window j equals poly_fold of its own slice
    for j in range(8):
        assert sh[j] == poly_fold(t[j : j + 3][None, :])[0]
    assert shingle_hashes(t[:2], 3).shape == (0,)


def test_band_hashes_band_identity_mixed_in():
    # two docs with identical slots in band 0 vs band 1 must not collide
    sigs = np.zeros((1, 16), dtype=np.uint64)
    bh = band_hashes(sigs, 2, 8)
    assert bh.shape == (1, 2)
    assert bh[0, 0] != bh[0, 1]  # same slot window, different band index

    # equal band windows in the SAME band do collide (that's LSH)
    a = np.arange(16, dtype=np.uint64)[None, :]
    b = a.copy()
    b[0, 8:] += 1  # differ only in band 1
    ba, bb = band_hashes(a, 2, 8), band_hashes(b, 2, 8)
    assert ba[0, 0] == bb[0, 0]
    assert ba[0, 1] != bb[0, 1]


def test_hash_utf8_array_large_string_offsets():
    """large_string (int64 offsets) must hash identically to string —
    misreading the offsets as int32 silently hashed every row the same
    (mass-collapse in exact dedup)."""
    import pyarrow as pa

    from nlshray.hashing import hash_utf8_array

    texts = ["alpha", "beta", "gamma gamma", "", "alpha"]
    small = pa.array(texts, pa.string())
    large = pa.array(texts, pa.large_string())
    hs = hash_utf8_array(small, seed=7)
    hl = hash_utf8_array(large, seed=7)
    np.testing.assert_array_equal(hs, hl)
    assert len(np.unique(hs)) == 4  # distinct texts hash distinctly

    # sliced large arrays (non-zero arr.offset) parse correctly too
    sl = large.slice(1, 3)
    np.testing.assert_array_equal(hash_utf8_array(sl, seed=7), hs[1:4])

    # binary flavors
    bs = pa.array([t.encode() for t in texts], pa.binary())
    bl = pa.array([t.encode() for t in texts], pa.large_binary())
    np.testing.assert_array_equal(hash_utf8_array(bs), hash_utf8_array(bl))

    # unsupported types raise instead of mis-hashing
    import pytest

    with pytest.raises(TypeError):
        hash_utf8_array(pa.array([1, 2, 3]))


def test_poly_fold_ragged_tile_boundaries_match_reference_fold():
    """Tiling must be invisible: segments longer than a tile, empty
    segments at tile edges, and mixed sizes all fold exactly like the
    per-segment reference loop."""
    from nlshray.hashing import _POLY, _TILE_FOLD, poly_fold_ragged

    rng = np.random.default_rng(7)
    # mix: empties, tiny, mid, and two segments each larger than a tile
    lengths = np.concatenate(
        [
            [0, 1, 0],
            rng.integers(1, 40, size=500),
            [_TILE_FOLD + 123],
            [0],
            rng.integers(1, 40, size=500),
            [2 * _TILE_FOLD + 7, 0],
        ]
    ).astype(np.int64)
    values = rng.integers(0, 256, size=int(lengths.sum())).astype(np.uint8)
    got = poly_fold_ragged(values, lengths)

    # reference: plain per-segment horner loop
    exp = np.zeros(lengths.shape[0], dtype=np.uint64)
    pos = 0
    with np.errstate(over="ignore"):
        for i, L in enumerate(lengths):
            acc = np.uint64(0)
            for v in values[pos : pos + L]:
                acc = acc * _POLY + np.uint64(v)
            exp[i] = acc
            pos += L
    assert np.array_equal(got, exp)
