"""Supervised triplet trainer (nlshray/stages/train.py) — the analog of
the reference's actual training loop (/root/reference/nlsh/trainers/
base.py:36-115, triplet.py:16-27): determinism, gradient sanity,
npz/serving compatibility, and the recall-up gate actually earning its
name over the untrained init."""

import numpy as np
import pytest

from nlshray.stages.neural import (
    NeuralBucketer,
    forward_probs,
    init_weights,
    load_weights,
    pack_codes,
    save_weights,
)
from nlshray.stages.train import (
    _bucket_eval,
    fit_triplet_weights,
    self_knn,
    triplet_batches,
)


def _clustered(n_clusters=6, per=40, dim=16, seed=7):
    """Gaussian blobs: supervised training has real structure to learn."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    X = np.concatenate(
        [c + rng.normal(size=(per, dim)) * 0.4 for c in centers]
    )
    return X


def test_self_knn_matches_naive():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 8))
    got = self_knn(X, k=5, block=16)  # multi-block path
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(50):
        order = np.lexsort((np.arange(50), -sims[i]))[:5]
        assert list(got[i]) == list(order), i


def test_triplet_batches_shapes_and_supervision():
    rng = np.random.default_rng(1)
    knn = np.tile(np.arange(5), (64, 1))
    seen = 0
    for a, p, n in triplet_batches(64, knn, 16, rng):
        assert a.shape == p.shape == n.shape == (16,)
        # positives come from the anchor's kNN rows
        assert np.isin(p, knn[a]).all()
        seen += 16
    assert seen == 64


def test_fit_deterministic():
    X = _clustered()
    w1 = fit_triplet_weights(X, bits=6, hidden=(16,), epochs=2, seed=3)
    w2 = fit_triplet_weights(X, bits=6, hidden=(16,), epochs=2, seed=3)
    assert sorted(w1) == sorted(w2)
    for k in w1:
        if w1[k].dtype.kind == "f":
            np.testing.assert_array_equal(w1[k], w2[k])


@pytest.mark.parametrize("activation", ["relu", "sin"])
def test_training_beats_untrained_init(activation):
    """The reference's checkpoint gate (recall up, base.py:98-104): the
    trained head must bucket true neighbors together better than the
    seed-derived untrained stack of the same shape."""
    X = _clustered()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    knn = self_knn(X, k=5)
    w0 = init_weights(X.shape[1], hidden=(32,), bits=8, activation=activation)
    rec0, _ = _bucket_eval(forward_probs(Xn, w0), knn)
    wt = fit_triplet_weights(
        X, bits=8, hidden=(32,), activation=activation,
        epochs=6, knn=knn, seed=11,
    )
    rect, size_t = _bucket_eval(forward_probs(Xn, wt), knn)
    assert rect > rec0 + 0.05, (rect, rec0)
    # gate's other half: buckets stay buckets, not one giant bin
    assert size_t < X.shape[0] * 0.5


def test_weights_serve_roundtrip(tmp_path):
    """Trained dict is drop-in for the serving stack: npz save/load
    (S5), NeuralBucketer __init__ (S6/ST1), pack_codes key layout."""
    X = _clustered(per=20)
    w = fit_triplet_weights(X, bits=6, hidden=(16,), epochs=2, seed=5)
    p = str(tmp_path / "head.npz")
    save_weights(w, p)
    w2 = load_weights(p)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    np.testing.assert_array_equal(
        forward_probs(Xn, w), forward_probs(Xn, w2)
    )
    b = NeuralBucketer(X.shape[1], bits=6, weights_path=p)
    codes = pack_codes(forward_probs(Xn, b.weights) > 0.5)
    assert codes.dtype == np.int64 and codes.shape == (X.shape[0],)
