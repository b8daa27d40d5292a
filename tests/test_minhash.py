"""MinHash goldens + statistical properties (FIXTURES.md §4; style of the
reference's distance goldens, ``nlsh/learning/tests/test_distances.py``)."""

import numpy as np

from nlshray.functions.minhash import estimate_jaccard, perm_seeds, sign_concat
from nlshray.functions.shingles import batch_shingle_hashes, doc_shingle_hashes

SEEDS = perm_seeds(128, 42)

TEXTS = [
    "the cat sat on the mat near the door",
    "the cat sat on the mat near the window",
    "completely unrelated text about weather patterns today",
]

# frozen under seed=42 (FIXTURES.md: 'precomputed once under seed=42 and
# frozen as literals')
GOLDEN_SEEDS_4 = [
    10415557904906071443,
    10564971649884262524,
    7984734122929729408,
    10054623000600317070,
]
GOLDEN_SIG0_4 = [
    8503032217986568351,
    1597971712111366369,
    2021305791191000272,
    5661755812915754042,
]
GOLDEN_SIG1_4 = [
    8446376202927431772,
    1597971712111366369,
    2021305791191000272,
    5661755812915754042,
]


def test_perm_seeds_frozen():
    assert SEEDS.shape == (128,)
    assert SEEDS[:4].tolist() == GOLDEN_SEEDS_4
    assert len(np.unique(SEEDS)) == 128
    assert not np.array_equal(perm_seeds(128, 43), SEEDS)


def test_signature_golden():
    flat, lengths = batch_shingle_hashes(TEXTS, 5)
    assert lengths.tolist() == [5, 5, 3]
    sigs = sign_concat(flat, lengths, SEEDS)
    assert sigs.shape == (3, 128)
    assert sigs[0, :4].tolist() == GOLDEN_SIG0_4
    assert sigs[1, :4].tolist() == GOLDEN_SIG1_4
    assert estimate_jaccard(sigs[0:1], sigs[1:2])[0] == 0.640625
    assert estimate_jaccard(sigs[0:1], sigs[2:3])[0] == 0.0


def test_min_over_multiset_equals_min_over_set():
    text = "a b c d e f g " * 20  # heavy shingle repetition
    multi = doc_shingle_hashes(text, 5)
    uniq = doc_shingle_hashes(text, 5, unique=True)
    lengths = np.array([multi.shape[0]], dtype=np.int64)
    lengths_u = np.array([uniq.shape[0]], dtype=np.int64)
    s1 = sign_concat(multi, lengths, SEEDS)
    s2 = sign_concat(uniq, lengths_u, SEEDS)
    assert (s1 == s2).all()


def test_estimate_within_chernoff_bound_of_exact():
    """Property (SURVEY.md §5.4): |est - exact| small w.h.p. at 128 perms."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        n_shared = int(rng.integers(10, 200))
        n_a = int(rng.integers(0, 100))
        n_b = int(rng.integers(0, 100))
        pool = rng.integers(1, 2**62, size=n_shared + n_a + n_b).astype(np.uint64)
        shared, only_a, only_b = np.split(pool, [n_shared, n_shared + n_a])
        a = np.unique(np.concatenate([shared, only_a]))
        b = np.unique(np.concatenate([shared, only_b]))
        inter = np.intersect1d(a, b).shape[0]
        exact = inter / (a.shape[0] + b.shape[0] - inter)
        sig = sign_concat(
            np.concatenate([a, b]),
            np.array([a.shape[0], b.shape[0]]),
            SEEDS,
        )
        est = estimate_jaccard(sig[0:1], sig[1:2])[0]
        # 128 perms: std <= 0.5/sqrt(128) ~ 0.044; 4 sigma bound
        assert abs(est - exact) < 0.18, (exact, est)


def test_empty_batch():
    sigs = sign_concat(
        np.empty(0, np.uint64), np.empty(0, np.int64), SEEDS
    )
    assert sigs.shape == (0, 128)


# ---------------------------------------------------------------- OPH

from nlshray.functions.minhash import oph_sign_concat  # noqa: E402


def test_oph_shape_determinism_and_seed():
    rng = np.random.default_rng(3)
    lengths = rng.integers(1, 400, size=50).astype(np.int64)
    flat = rng.integers(1, 2**63, size=int(lengths.sum())).astype(np.uint64)
    s1 = oph_sign_concat(flat, lengths, 128, 42)
    s2 = oph_sign_concat(flat, lengths, 128, 42)
    assert s1.shape == (50, 128) and s1.dtype == np.uint64
    assert np.array_equal(s1, s2)
    assert not np.array_equal(s1, oph_sign_concat(flat, lengths, 128, 43))


def test_oph_densification_fills_every_slot():
    """A one-shingle doc must densify all 128 slots deterministically and
    identically for the same shingle (so exact dups still estimate 1.0)."""
    one = np.array([12345], np.uint64)
    s = oph_sign_concat(
        np.concatenate([one, one]), np.array([1, 1]), 128, 42
    )
    assert np.array_equal(s[0], s[1])
    assert estimate_jaccard(s[0:1], s[1:2])[0] == 1.0
    # borrowed slots carry distance offsets: not all equal to the source
    assert len(np.unique(s[0])) > 1


def test_oph_multiset_equals_set():
    base = np.arange(1, 300, dtype=np.uint64) * np.uint64(2654435761)
    multi = np.concatenate([base, base[:50]])
    s = oph_sign_concat(
        np.concatenate([base, multi]),
        np.array([base.shape[0], multi.shape[0]]),
        128,
        42,
    )
    assert np.array_equal(s[0], s[1])


def test_oph_requires_power_of_two():
    import pytest

    with pytest.raises(ValueError):
        oph_sign_concat(np.array([1], np.uint64), np.array([1]), 96, 42)


def test_oph_estimator_matches_exact_jaccard():
    """Same property gate as the 128-perm signer: |est - exact| small
    w.h.p., and near-zero mean bias across trials."""
    rng = np.random.default_rng(11)
    errs = []
    for _ in range(40):
        n_shared = int(rng.integers(50, 400))
        n_a = int(rng.integers(0, 120))
        n_b = int(rng.integers(0, 120))
        pool = rng.integers(1, 2**62, size=n_shared + n_a + n_b).astype(np.uint64)
        shared, only_a, only_b = np.split(pool, [n_shared, n_shared + n_a])
        a = np.unique(np.concatenate([shared, only_a]))
        b = np.unique(np.concatenate([shared, only_b]))
        inter = np.intersect1d(a, b).shape[0]
        exact = inter / (a.shape[0] + b.shape[0] - inter)
        sig = oph_sign_concat(
            np.concatenate([a, b]),
            np.array([a.shape[0], b.shape[0]]),
            128,
            42,
        )
        est = estimate_jaccard(sig[0:1], sig[1:2])[0]
        errs.append(est - exact)
        assert abs(est - exact) < 0.22, (exact, est)
    assert abs(float(np.mean(errs))) < 0.03, np.mean(errs)


def test_oph_empty_batch():
    s = oph_sign_concat(np.empty(0, np.uint64), np.empty(0, np.int64), 128, 42)
    assert s.shape == (0, 128)
