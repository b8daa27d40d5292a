"""Distance-zoo goldens — the reference's own fixtures
(/root/reference/nlsh/learning/tests/test_distances.py:11-38) adapted
as numpy golden tests, plus consistency properties the reference's
shapes imply."""

import numpy as np

from nlshray.functions.distances import (
    cross_entropy_bernoulli,
    cross_entropy_bernoulli_pairwise,
    entropy_bernoulli,
    hellinger_categorical,
    jsd_categorical,
    kl_bernoulli,
    kl_bernoulli_pairwise,
    kl_bernoulli_row_pairwise,
    l2_pairwise,
    l2_rowwise,
    mean_kl_bernoulli,
    mean_kl_bernoulli_pairwise,
)


def test_jsd_categorical_golden():
    p = np.array([[0.1, 0.9], [0.1, 0.9], [1.0, 0.0]])
    q = np.array([[0.5, 0.5], [0.1, 0.9], [0.0, 1.0]])
    np.testing.assert_array_almost_equal(
        jsd_categorical(p, q), [0.101749, 0.0, 0.693147]
    )


def test_kl_bernoulli_golden():
    p = np.array([[0.5, 0.5], [0.1, 0.9], [0.1, 0.9], [0.1, 0.9], [1.0, 0.0]])
    q = np.array([[0.1, 0.9], [0.5, 0.5], [0.9, 0.1], [0.1, 0.9], [0.0, 1.0]])
    np.testing.assert_array_almost_equal(
        kl_bernoulli(p, q),
        [0.510826, 0.368064, 1.757779, 0.0, 46.0517],
        decimal=4,
    )


def test_cross_entropy_bernoulli_golden():
    p = np.array(
        [[0.5, 0.5], [0.1, 0.9], [0.1, 0.9], [0.1, 0.9], [0.2, 0.8], [1.0, 0.0]]
    )
    q = np.array(
        [[0.1, 0.9], [0.5, 0.5], [0.9, 0.1], [0.1, 0.9], [0.2, 0.8], [0.0, 1.0]]
    )
    np.testing.assert_array_almost_equal(
        cross_entropy_bernoulli(p, q),
        [1.203973, 0.693147, 2.082862, 0.325083, 0.500402, 46.0517],
        decimal=4,
    )


def test_hellinger_golden():
    p = np.array([[0.5, 0.5], [1.0, 0.0]])
    q = np.array([[0.5, 0.5], [0.0, 1.0]])
    d = hellinger_categorical(p, q)
    np.testing.assert_array_almost_equal(d, [0.0, 1.0])


def test_pairwise_diag_matches_rowwise_sum():
    """pairwise (SUM over bits) diag == rowwise (MEAN) * k — the
    reference's two conventions differ exactly by the bit count."""
    rng = np.random.default_rng(3)
    p = rng.uniform(0.05, 0.95, size=(4, 6))
    q = rng.uniform(0.05, 0.95, size=(4, 6))
    pw = kl_bernoulli_pairwise(p, q)
    np.testing.assert_allclose(np.diag(pw), kl_bernoulli(p, q) * 6, rtol=1e-9)


def test_row_pairwise_matches_pairwise():
    rng = np.random.default_rng(4)
    p = rng.uniform(0.05, 0.95, size=(2, 3, 5))
    q = rng.uniform(0.05, 0.95, size=(2, 4, 5))
    rp = kl_bernoulli_row_pairwise(p, q)
    assert rp.shape == (2, 3, 4)
    for i in range(2):
        np.testing.assert_allclose(
            rp[i], kl_bernoulli_pairwise(p[i], q[i]), rtol=1e-12
        )


def test_mean_kl_symmetry():
    rng = np.random.default_rng(5)
    p = rng.uniform(0.05, 0.95, size=(3, 4))
    q = rng.uniform(0.05, 0.95, size=(3, 4))
    np.testing.assert_allclose(
        mean_kl_bernoulli(p, q), mean_kl_bernoulli(q, p), rtol=1e-12
    )
    m = mean_kl_bernoulli_pairwise(p, q)
    np.testing.assert_allclose(m, mean_kl_bernoulli_pairwise(q, p).T, rtol=1e-12)


def test_cross_entropy_pairwise_diag():
    rng = np.random.default_rng(6)
    p = rng.uniform(0.05, 0.95, size=(3, 4))
    q = rng.uniform(0.05, 0.95, size=(3, 4))
    pw = cross_entropy_bernoulli_pairwise(p, q)
    want = kl_bernoulli(p, q, 1e-20) * 4 + entropy_bernoulli(p)
    np.testing.assert_allclose(np.diag(pw), want, rtol=1e-9)


def test_l2_forms():
    p = np.array([[0.0, 0.0], [1.0, 1.0]])
    q = np.array([[3.0, 4.0], [1.0, 1.0]])
    np.testing.assert_allclose(l2_rowwise(p, q), [5.0, 0.0])
    pw = l2_pairwise(p, q)
    np.testing.assert_allclose(pw[0, 0], 5.0)
    np.testing.assert_allclose(pw[1, 1], 0.0)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_vs_scalar_dp():
    from nlshray.functions.distances import levenshtein_batch

    rng = np.random.default_rng(7)
    alphabet = list("abcde é中")
    lefts, rights = [], []
    for _ in range(120):
        la, lb = rng.integers(0, 18, size=2)
        lefts.append("".join(rng.choice(alphabet, la)))
        rights.append("".join(rng.choice(alphabet, lb)))
    lefts += ["", "", "abc", "kitten", "flaw"]
    rights += ["", "xyz", "", "sitting", "lawn"]
    got = levenshtein_batch(lefts, rights)
    want = np.array([_lev_ref(a, b) for a, b in zip(lefts, rights)])
    np.testing.assert_array_equal(got, want)
    assert levenshtein_batch([], []).shape == (0,)
