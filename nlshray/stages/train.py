"""Supervised contrastive training of the neural hash head.

The reference's actual training loop — the one behavior that previously
had no analog here — is supervised triplet/siamese training of the
encoder+hash stack (``/root/reference/nlsh/trainers/base.py:36-115``,
``trainers/triplet.py:16-27,171-182``): anchors are corpus vectors,
positives are drawn from each anchor's precomputed true kNN
(``KNearestNeighborTriplet.batch_generator``), negatives are sampled
(random by default), and the loss is a margin hinge on rowwise
distances between the *sigmoid hash probabilities*
(``hashings.py:39-40`` predict -> probs; ``triplet.py:16-27``), driven
by Adam(amsgrad) at lr 3e-4 (``base.py:58-63``). A periodic gate keeps
the checkpoint whose eval recall went UP while mean candidate-set size
went DOWN (``base.py:98-104``).

This module re-expresses that loop in numpy (no torch in this stack):
hand-derived backprop through the same MLP shapes ``neural.init_weights``
produces (ReLU stack = MultiLayerRelu, sin stack = SIREN), the same
sigmoid Bernoulli head, an Adam(amsgrad) step, and the same
recall-up/candidates-down checkpoint gate. The trained dict is
npz-compatible with ``NeuralBucketer`` / ``forward_probs`` /
``save_weights`` — drop-in wherever the ITQ or random head is used.

Scale posture: like the reference (whole training set GPU-resident,
``base.py:44``), training runs on a driver-bounded sample; what is
distributed at corpus scale is the ground-truth kNN precompute (the
existing brute/ANN stages) and the application of the trained head
(``neural_bucket_stage`` actor pool, weights loaded once per worker).
"""

from __future__ import annotations

import numpy as np

from nlshray.stages.neural import pack_codes

__all__ = ["self_knn", "triplet_batches", "fit_triplet_weights"]


def self_knn(X: np.ndarray, k: int, *, block: int = 2048) -> np.ndarray:
    """(n, k) true cosine kNN of every row against the rest (self
    excluded) — the trainer's supervision signal (the reference
    precomputes this offline, ``precompute.py``). Blocked matmul over
    L2-normalized rows; deterministic ties via argsort stability."""
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = Xn.shape[0]
    out = np.empty((n, k), dtype=np.int64)
    for s in range(0, n, block):
        e = min(s + block, n)
        sims = Xn[s:e] @ Xn.T
        sims[np.arange(e - s), np.arange(s, e)] = -np.inf
        # top-k by similarity, canonical (sim desc, id asc) order
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        psims = np.take_along_axis(sims, part, axis=1)
        order = np.lexsort((part, -psims), axis=1)
        out[s:e] = np.take_along_axis(part, order, axis=1)
    return out


def triplet_batches(
    n: int, knn: np.ndarray, batch_size: int, rng: np.random.Generator
):
    """Yield (anchor_idx, pos_idx, neg_idx) minibatches for one epoch —
    the reference's sampling scheme (``triplet.py:101-132``): shuffled
    anchors, one random column of each anchor's kNN as the positive,
    uniform-random negatives."""
    anchor = rng.permutation(n)
    pos_col = rng.integers(0, knn.shape[1], size=n)
    neg = rng.integers(0, n, size=n)
    pos = knn[anchor, pos_col]
    for s in range(0, n - batch_size + 1, batch_size):
        sl = slice(s, s + batch_size)
        yield anchor[sl], pos[sl], neg[sl]


def _forward_cached(x, W, act):
    """Forward through the stack caching pre-activations for backprop.
    Mirrors ``neural._head_logits`` exactly (ReLU stack / SIREN
    sin(30 * pre))."""
    hs, pres = [x], []
    h = x
    for Wi, bi in W["stack"]:
        pre = h @ Wi + bi
        pres.append(pre)
        h = np.maximum(pre, 0.0) if act == "relu" else np.sin(30.0 * pre)
        hs.append(h)
    z = h @ W["W_out"] + W["b_out"]
    with np.errstate(over="ignore"):
        p = 1.0 / (1.0 + np.exp(-z))
    return p, z, hs, pres


def _backward(g_p, p, hs, pres, W, act, grads):
    """Accumulate dL/dweights given dL/dp for one forward pass."""
    dz = g_p * p * (1.0 - p)                     # sigmoid head
    grads["W_out"] += hs[-1].T @ dz
    grads["b_out"] += dz.sum(axis=0)
    dh = dz @ W["W_out"].T
    for i in range(len(W["stack"]) - 1, -1, -1):
        Wi, _bi = W["stack"][i]
        if act == "relu":
            dpre = dh * (pres[i] > 0)
        else:
            dpre = dh * 30.0 * np.cos(30.0 * pres[i])
        grads["stack"][i][0] += hs[i].T @ dpre
        grads["stack"][i][1] += dpre.sum(axis=0)
        dh = dpre @ Wi.T


def _bucket_eval(p_codes: np.ndarray, knn: np.ndarray) -> tuple[float, float]:
    """(recall@k within own hard bucket, mean bucket size) — the
    reference's periodic gate metrics (``base.py:84-104``: n_indexes /
    recall / query_size) over the training sample itself."""
    keys = pack_codes(p_codes >= 0.5)
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(ks)) + 1, [ks.shape[0]]])
    bucket_of = np.empty(ks.shape[0], dtype=np.int64)
    sizes = np.diff(starts)
    for j, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
        bucket_of[order[s:e]] = j
    same = bucket_of[knn] == bucket_of[:, None]
    return float(same.mean()), float(sizes[bucket_of].mean())


def fit_triplet_weights(
    X: np.ndarray,
    bits: int = 12,
    *,
    hidden: tuple[int, ...] = (64, 64),
    activation: str = "relu",
    knn_k: int = 10,
    epochs: int = 5,
    batch_size: int = 256,
    lr: float = 3e-4,
    margin: float = 0.1,
    seed: int = 42,
    eval_every: int = 20,
    knn: np.ndarray | None = None,
    init: dict | None = None,
) -> dict[str, np.ndarray]:
    """Train the hash head with the reference's supervised triplet loop.

    Loss per batch (``triplet.py:16-27`` with the zoo's rowwise L2 on
    hash probabilities): ``mean(relu(d(pa,pp) - d(pa,pn) + margin))``.
    Optimizer: Adam with amsgrad (``base.py:58-63``). Checkpoint gate:
    keep the weights whose in-bucket recall improved while mean bucket
    size did not grow (``base.py:98-104``).

    ``init``: optional npz-style weight dict to fine-tune FROM (e.g.
    the ITQ head from ``fit_hash_weights``). The gate is then seeded
    with the init weights' own recall/bucket-size, so the returned head
    is never worse than the init on the train metric — the reference's
    keep-only-if-improved checkpoint rule with the unsupervised head as
    checkpoint zero.

    Returns the ``neural.py`` npz-style weight dict (save with
    ``save_weights``, serve with ``NeuralBucketer``).
    """
    X = np.asarray(X, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n, dim = X.shape
    rng = np.random.default_rng(seed)
    if knn is None:
        knn = self_knn(X, knn_k)

    if init is not None:
        n_layers = int(np.asarray(init.get("n_layers", [0]))[0])
        if n_layers:
            activation = str(np.asarray(init["activation"])[0])
        W = {
            "stack": [
                [
                    np.asarray(init[f"W{i}"], np.float64).copy(),
                    np.asarray(init[f"b{i}"], np.float64).copy(),
                ]
                for i in range(n_layers)
            ]
        }
        W["W_out"] = np.asarray(init["W_out"], np.float64).copy()
        W["b_out"] = np.asarray(init["b_out"], np.float64).copy()
        bits = W["W_out"].shape[1]
    else:
        # init the same shapes init_weights draws, but from the trainer rng
        sizes = [dim, *hidden]
        W = {"stack": []}
        for i in range(len(sizes) - 1):
            # He init for ReLU; SIREN convention for sin: hidden layers
            # uniform(+/- sqrt(6/fan)/omega0) so sin(30*pre) starts in its
            # quasi-linear regime instead of saturated oscillation (Sitzmann
            # et al. 2020 §3.2), first layer uniform(+/- 1/fan).
            if activation == "relu":
                scale = np.sqrt(2.0 / sizes[i])
            elif i == 0:
                scale = 1.0 / sizes[i]
            else:
                scale = np.sqrt(6.0 / sizes[i]) / 30.0
            W["stack"].append(
                [
                    rng.uniform(-1, 1, (sizes[i], sizes[i + 1])) * scale,
                    np.zeros(sizes[i + 1]),
                ]
            )
        W["W_out"] = rng.uniform(-1, 1, (sizes[-1], bits)) * np.sqrt(
            6.0 / sizes[-1]
        )
        W["b_out"] = np.zeros(bits)

    def params():
        for pair in W["stack"]:
            yield pair, 0
            yield pair, 1
        yield W, "W_out"
        yield W, "b_out"

    # Adam(amsgrad) state per parameter
    m = [np.zeros_like(holder[key]) for holder, key in params()]
    v = [np.zeros_like(holder[key]) for holder, key in params()]
    vhat = [np.zeros_like(holder[key]) for holder, key in params()]
    b1, b2, eps = 0.9, 0.999, 1e-8
    t = 0

    def snapshot():
        out = {
            "W_out": W["W_out"].copy(),
            "b_out": W["b_out"].copy(),
            "n_layers": np.array([len(W["stack"])]),
            "activation": np.array([activation]),
        }
        for i, (Wi, bi) in enumerate(W["stack"]):
            out[f"W{i}"] = Wi.copy()
            out[f"b{i}"] = bi.copy()
        return out

    best = None
    best_recall, best_size = -1.0, float("inf")
    if init is not None:
        # checkpoint zero = the init head itself: training can only
        # improve on it (the reference's keep-if-improved gate)
        probs0, _, _, _ = _forward_cached(X, W, activation)
        best_recall, best_size = _bucket_eval(probs0, knn)
        best = snapshot()

    step = 0
    for _ in range(epochs):
        for ai, pi, ni in triplet_batches(n, knn, batch_size, rng):
            step += 1
            grads = {
                "stack": [
                    [np.zeros_like(Wi), np.zeros_like(bi)]
                    for Wi, bi in W["stack"]
                ],
                "W_out": np.zeros_like(W["W_out"]),
                "b_out": np.zeros_like(W["b_out"]),
            }
            pa, _za, hsa, presa = _forward_cached(X[ai], W, activation)
            pp, _zp, hsp, presp = _forward_cached(X[pi], W, activation)
            pn, _zn, hsn, presn = _forward_cached(X[ni], W, activation)
            dpos = ((pa - pp) ** 2).sum(axis=1)
            dneg = ((pa - pn) ** 2).sum(axis=1)
            active = (dpos - dneg + margin > 0).astype(np.float64)
            w = (active / ai.shape[0])[:, None]
            _backward(2.0 * (pn - pp) * w, pa, hsa, presa, W, activation, grads)
            _backward(-2.0 * (pa - pp) * w, pp, hsp, presp, W, activation, grads)
            _backward(2.0 * (pa - pn) * w, pn, hsn, presn, W, activation, grads)

            t += 1
            gflat = [
                g for pair in grads["stack"] for g in pair
            ] + [grads["W_out"], grads["b_out"]]
            for j, ((holder, key), g) in enumerate(zip(params(), gflat)):
                m[j] = b1 * m[j] + (1 - b1) * g
                v[j] = b2 * v[j] + (1 - b2) * g * g
                vhat[j] = np.maximum(vhat[j], v[j])  # amsgrad
                mh = m[j] / (1 - b1**t)
                holder[key] = holder[key] - lr * mh / (np.sqrt(vhat[j]) + eps)

            if step % eval_every == 0:
                probs, _, _, _ = _forward_cached(X, W, activation)
                rec, qsize = _bucket_eval(probs, knn)
                if rec > best_recall and qsize <= max(best_size, 1.0) * 1.5:
                    best, best_recall, best_size = snapshot(), rec, qsize

    probs, _, _, _ = _forward_cached(X, W, activation)
    rec, qsize = _bucket_eval(probs, knn)
    # final candidate obeys the same two-sided gate: recall up AND the
    # candidate budget bounded (base.py:98-104 keeps neither-regressed)
    if rec > best_recall and qsize <= max(best_size, 1.0) * 1.5:
        best = snapshot()
    return best if best is not None else snapshot()
