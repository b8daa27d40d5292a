"""Optional neural-LSH bucketing stage — the reference's surviving core.

Re-expresses the reference's learned hash pipeline as a Ray actor-pool
stage over dense vectors, without torch (numpy forward only):

* SIREN-style encoder: sinusoidal MLP (``/root/reference/encoders.py:58-79``,
  hard-wired as the default at ``main.py:388-391``);
* Bernoulli hash head: linear -> sigmoid -> per-bit probabilities
  (``nlsh/hashings.py:13-27``);
* hard codes: threshold at 0.5 (``nlsh/hashings.py:72``); multi-probe:
  extra Bernoulli samples per vector (``nlsh/hashings.py:74-85``,
  ``eval.py:65-83``);
* bit-pack MSB-first into an integer bucket key (``nlsh/utils.pyx:7-32``).

Weights load once per actor in ``__init__`` (pattern ST1/S6: the
reference builds its encoder once and reuses it across every hash call;
``torch.jit.load`` at ``eval.py:113-114`` becomes ``np.load`` here).
Without a trained checkpoint, seed-derived random weights make the stage
a learned-hash-SHAPED random partition (validated against vanilla
hyperplane LSH in tests); a real training loop is out of scope by design
(SURVEY.md: 'What we are NOT doing').

Query flow (the reference's ``indexer.py:56-96`` probe-gather-rerank):
bucket the corpus, bucket the queries with multi-probe sampling, score
only bucket-colliding candidates, exact re-rank to top-k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.hashing import MASK63, splitmix64
from nlshray.stages.ann import (
    _finalize_topk,
    _l2norm,
    _log_candidate_fraction,
    _topk_rows,
    vectors_from_batch,
)


def init_weights(
    dim: int,
    hidden: tuple[int, ...] = (64, 64),
    bits: int = 12,
    seed: int = 42,
    activation: str = "sin",
) -> dict[str, np.ndarray]:
    """Seed-derived encoder weights for a configurable hidden stack.

    ``activation="sin"`` is the SIREN default (reference grid config:
    hash_size=12, encoder 64,64 — ``run_multiple.sh:3-16``;
    ``/root/reference/encoders.py:58-79``); ``activation="relu"`` is the
    reference's ``MultiLayerRelu`` stack (``encoders.py:24-55``), with
    ``hidden=(256, 256)`` reproducing its fixed ``TwoLayer256Relu``
    (``encoders.py:8-21``). Stand-in for a trained checkpoint; swap in
    ``np.savez`` weights of the same shapes (or ``fit_hash_weights``)."""
    if activation not in ("sin", "relu"):
        raise ValueError(f"unknown activation {activation!r}")
    sizes = [dim, *hidden]
    rng_base = np.uint64(seed * 31 + 7)
    weights: dict[str, np.ndarray] = {}

    def draw(n, key):
        raw = splitmix64(np.arange(n, dtype=np.uint64) ^ rng_base ^ np.uint64(key))
        return (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2 - 1

    for i in range(len(sizes) - 1):
        fan_in = sizes[i]
        w = draw(sizes[i] * sizes[i + 1], 1000 + i).reshape(sizes[i], sizes[i + 1])
        # SIREN-ish uniform(+/-sqrt(6/fan)) vs He-style for ReLU
        scale = np.sqrt(6.0 / fan_in) if activation == "sin" else np.sqrt(2.0 / fan_in)
        weights[f"W{i}"] = w * scale
        weights[f"b{i}"] = np.zeros(sizes[i + 1])
    w_out = draw(sizes[-1] * bits, 9999).reshape(sizes[-1], bits)
    weights["W_out"] = w_out * np.sqrt(6.0 / sizes[-1])
    weights["b_out"] = np.zeros(bits)
    weights["n_layers"] = np.array([len(sizes) - 1])
    weights["activation"] = np.array([activation])
    return weights


def init_relu_weights(
    dim: int, hidden: tuple[int, ...] = (256, 256), bits: int = 12, seed: int = 42
) -> dict[str, np.ndarray]:
    """The reference's fixed two-layer-256 ReLU encoder shape (M5,
    ``encoders.py:8-21``) as the default ``hidden``."""
    return init_weights(dim, hidden=hidden, bits=bits, seed=seed, activation="relu")


def fit_hash_weights(
    X: np.ndarray, bits: int = 12, *, n_iters: int = 50, scale: float = 8.0
) -> dict[str, np.ndarray]:
    """TRAIN the hash head on corpus vectors — the reference's 'learned
    space partition' role (``/root/reference/nlsh/trainers/base.py:36-115``:
    fit encoder+hash on the corpus, gate on recall up / candidates down)
    without torch: ITQ (PCA to ``bits`` dims + iterative orthogonal
    rotation minimizing the binary quantization loss; Gong & Lazebnik,
    CVPR 2011 — public method). Fully deterministic (canonical
    eigenvector signs, fixed iteration count), closed-form per step.

    Returns the same npz-style weight dict ``NeuralBucketer`` loads;
    ``n_layers=0`` makes ``forward_probs`` the trained linear head
    ``sigmoid(scale * (x - mu) @ V @ R)`` whose hard codes are the ITQ
    codes. ``scale`` sets multi-probe confidence: borderline vectors
    keep probs near 0.5, so extra Bernoulli probes explore exactly the
    uncertain bits.
    """
    X = _l2norm(np.asarray(X, dtype=np.float64))
    mu = X.mean(axis=0)
    Xc = X - mu
    C = Xc.T @ Xc
    _evals, evecs = np.linalg.eigh(C)
    V = evecs[:, ::-1][:, :bits]
    # canonical sign: largest-magnitude component of each direction positive
    s = np.sign(V[np.abs(V).argmax(axis=0), np.arange(bits)])
    s[s == 0] = 1.0
    V = V * s
    Z = Xc @ V
    R = np.eye(bits)
    for _ in range(n_iters):
        B = np.sign(Z @ R)
        B[B == 0] = 1.0
        # orthogonal Procrustes: R = argmin ||Z R - B||_F
        U, _sv, Vt = np.linalg.svd(Z.T @ B)
        R = U @ Vt
    W = V @ R * scale
    return {
        "W_out": W,
        "b_out": -(mu @ V @ R) * scale,
        "n_layers": np.array([0]),
    }


def _head_logits(x: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """Shared encoder stack + linear output layer -> raw logits."""
    act = str(np.asarray(weights.get("activation", ["sin"]))[0])
    h = x
    for i in range(int(weights["n_layers"][0])):
        pre = h @ weights[f"W{i}"] + weights[f"b{i}"]
        if act == "relu":
            h = np.maximum(pre, 0.0)          # MultiLayerRelu (encoders.py:24-55)
        else:
            # SIREN scales the WHOLE preactivation by omega0
            # (encoders.py: sin(omega0 * (Wx + b))), not just the bias
            h = np.sin(30.0 * pre)
    return h @ weights["W_out"] + weights["b_out"]


def forward_probs(x: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """(n, dim) -> (n, bits) Bernoulli probabilities.

    sin activations (encoders.py:58-79), sigmoid head (hashings.py:23-27).
    """
    with np.errstate(over="ignore"):
        return 1.0 / (1.0 + np.exp(-_head_logits(x, weights)))


def forward_categorical(
    x: np.ndarray, weights: dict[str, np.ndarray]
) -> np.ndarray:
    """(n, dim) -> (n, n_buckets) bucket distribution — the reference's
    ``Categorical`` hasher head (``nlsh/hashings.py:94-139``): softmax
    over a linear layer on the encoder output (M10; disabled in the
    reference's runs but part of its hash-family surface). Same weight
    dict as the Bernoulli head; ``W_out``'s width is the bucket count
    instead of the bit count."""
    logits = _head_logits(x, weights)
    logits -= logits.max(axis=1, keepdims=True)   # stable softmax
    e = np.exp(logits)
    return e / e.sum(axis=1, keepdims=True)


def categorical_codes(probs: np.ndarray, n_probes: int = 1) -> list[np.ndarray]:
    """Bucket ids per vector: argmax (``hashings.py:132-134``) plus the
    next (n_probes-1) most probable buckets as the deterministic
    multi-probe analog (sorted, deduplicated — same contract as
    ``sample_codes``)."""
    if n_probes <= 1:
        return [np.array([b]) for b in probs.argmax(axis=1)]
    top = np.argsort(-probs, axis=1, kind="stable")[:, :n_probes]
    return [np.unique(row) for row in top]


def save_weights(weights: dict[str, np.ndarray], path: str) -> None:
    """Persist a hash-head weight dict (S5 — the reference's
    ``hashings.py:53-58`` ``save(base_name)`` surface, npz instead of
    torchscript). Atomic rename so a killed run never leaves a torn
    checkpoint; the twin of ``NeuralBucketer(weights_path=...)``."""
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **weights)
    os.replace(tmp, path)


def load_weights(path: str) -> dict[str, np.ndarray]:
    """Load a weight dict saved by ``save_weights`` (S6 load path; the
    actor pool calls this once per worker in ``__init__``)."""
    return dict(np.load(path))


def pack_codes(bits: np.ndarray) -> np.ndarray:
    """(n, hash_size) {0,1} -> int64 bucket keys, MSB-first — the numpy
    twin of the reference's Cython fold (utils.pyx:13-14)."""
    weights = 1 << np.arange(bits.shape[1] - 1, -1, -1, dtype=np.int64)
    return bits.astype(np.int64) @ weights


def sample_codes(
    probs: np.ndarray, n_samples: int, seed: int
) -> list[np.ndarray]:
    """Per-vector probe-code sets: hard code + (n_samples-1) Bernoulli
    draws, deduplicated (hashings.py:74-85 + utils.pyx:19-32)."""
    hard = pack_codes(probs > 0.5)
    if n_samples <= 1:
        return [np.array([h]) for h in hard]
    rng = np.random.default_rng(seed)
    draws = rng.random((n_samples - 1, *probs.shape)) < probs[None, :, :]
    sampled = np.stack(
        [pack_codes(d) for d in draws], axis=1
    )  # (n, n_samples-1)
    out = []
    for i in range(probs.shape[0]):
        out.append(np.unique(np.concatenate([[hard[i]], sampled[i]])))
    return out


class NeuralBucketer:
    """Actor-pool UDF: embedding column -> (id, bucket) rows.

    Weights load ONCE per actor (``__init__``); batches stream through.
    """

    def __init__(
        self,
        dim: int,
        bits: int = 12,
        seed: int = 42,
        weights_path: str | None = None,
        weights: dict[str, np.ndarray] | None = None,
        col: str = "embedding",
        id_col: str = "vec_id",
    ):
        if weights is not None:
            self.weights = weights          # trained (fit_hash_weights)
        elif weights_path:
            self.weights = load_weights(weights_path)
        else:
            self.weights = init_weights(dim, bits=bits, seed=seed)
        self.dim = dim
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _l2norm(vectors_from_batch(batch[self.col], self.dim))
        probs = forward_probs(m, self.weights)
        buckets = pack_codes(probs > 0.5) & MASK63
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bucket": pa.array(buckets, pa.int64()),
            }
        )


def neural_bucket_stage(
    ds: ray.data.Dataset,
    *,
    dim: int,
    bits: int = 12,
    seed: int = 42,
    weights_path: str | None = None,
    weights: dict[str, np.ndarray] | None = None,
    col: str = "embedding",
    id_col: str = "vec_id",
    concurrency=(1, 8),
    batch_size: int = 4096,   # the reference hashes in 4096-row batches
) -> ray.data.Dataset:
    return ds.select_columns([id_col, col]).map_batches(
        NeuralBucketer,
        fn_constructor_kwargs={
            "dim": dim,
            "bits": bits,
            "seed": seed,
            "weights_path": weights_path,
            "weights": weights,
            "col": col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def neural_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    *,
    bits: int = 12,
    seed: int = 42,
    n_probes: int = 10,       # reference default probe count (base.py:94)
    weights_path: str | None = None,
    weights: dict[str, np.ndarray] | None = None,
    col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Multi-probe bucket lookup + exact re-rank — the reference's query
    path (indexer.py:56-96) over a Ray Dataset."""
    dim = dim or queries.shape[1]
    hasher = NeuralBucketer(
        dim, bits=bits, seed=seed, weights_path=weights_path, weights=weights
    )
    qn = _l2norm(np.asarray(queries, dtype=np.float64))
    qprobs = forward_probs(qn, hasher.weights)
    probe_sets = sample_codes(qprobs, n_probes, seed=seed + 1)
    q_ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), qn, probe_sets)
    )
    w_ref = ray.put(hasher.weights)

    def score(t: pa.Table) -> dict[str, np.ndarray]:
        """Gather-then-score: the hash forward pass + probe-set lookup
        select candidate columns FIRST; the d-dim similarity matmul runs
        only over survivors (the reference's index2row.get -> gather ->
        distance-on-candidates shape, indexer.py:62-88)."""
        qids, qmat, probes = ray.get(q_ref)
        w = ray.get(w_ref)
        m = _l2norm(vectors_from_batch(t[col], dim))
        vids_all = t[id_col].to_numpy()
        vb = pack_codes(forward_probs(m, w) > 0.5)
        # candidate mask: corpus bucket in the query's probe set
        mask = np.stack([np.isin(vb, p) for p in probes])
        cand = np.flatnonzero(mask.any(axis=0))
        _log_candidate_fraction(
            "knn_neural", cand.shape[0], vids_all.shape[0]
        )
        if cand.shape[0] == 0:
            return {
                "query_id": np.empty(0, np.int64),
                "neighbor_id": np.empty(0, np.int64),
                "sim": np.empty(0, np.float64),
            }
        vids = vids_all[cand]
        sims = np.where(mask[:, cand], qmat @ m[cand].T, -np.inf)
        if exclude_self:
            sims = np.where(vids[None, :] == qids[:, None], -np.inf, sims)
        out = _topk_rows(qids, sims, vids, k)
        keep = out["sim"] > -np.inf
        return {kk: vv[keep] for kk, vv in out.items()}

    cand = ds.select_columns([id_col, col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
    )
    return cand.groupby("query_id", num_partitions=4).map_groups(
        _finalize_topk, fn_kwargs={"k": k}, batch_format="numpy"
    )


def bucket_code_counts(
    ds: ray.data.Dataset,
    *,
    bits: int = 12,
    seed: int = 42,
    weights_path: str | None = None,
    weights: dict[str, np.ndarray] | None = None,
    col: str = "embedding",
    dim: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique bucket codes, counts) of the corpus under a hash
    head — per-batch ``np.unique`` partials combined once on the driver
    (combiner pattern; ≤2^bits rows per partial, no shuffle). Codes match
    ``neural_knn``'s corpus codes exactly (same forward pass, no mask),
    so ``counts[searchsorted(codes, probe_set)]`` is the EXACT candidate
    budget a probe set pays."""
    hasher = NeuralBucketer(
        dim, bits=bits, seed=seed, weights_path=weights_path, weights=weights
    )
    w_ref = ray.put(hasher.weights)

    def partial(t: pa.Table) -> dict[str, np.ndarray]:
        w = ray.get(w_ref)
        m = _l2norm(vectors_from_batch(t[col], dim))
        u, c = np.unique(pack_codes(forward_probs(m, w) > 0.5), return_counts=True)
        return {"code": u, "count": c.astype(np.int64)}

    codes_c, counts_c = [], []
    for b in ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
    ).iter_batches(batch_format="numpy", batch_size=None):
        codes_c.append(b["code"])
        counts_c.append(b["count"])
    allc = np.concatenate(codes_c) if codes_c else np.empty(0, np.int64)
    alln = np.concatenate(counts_c) if counts_c else np.empty(0, np.int64)
    codes, inv = np.unique(allc, return_inverse=True)
    counts = np.zeros(codes.shape[0], np.int64)
    np.add.at(counts, inv, alln)
    return codes, counts


def multiprobe_sweep(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    truth: dict[int, np.ndarray],
    probe_counts=(1, 2, 5, 10),
    k: int = 10,
    **kwargs,
) -> list[dict]:
    """The reference's offline probe-count sweep (eval.py:148-196):
    recall + candidate budget per n_probes setting. ``mean_candidates``
    counts returned neighbors (≤k); ``mean_bucket_candidates`` is the
    exact mean number of bucket-colliding corpus vectors per query — the
    budget the reference's checkpoint gate holds flat while recall rises
    (``nlsh/trainers/base.py:98-104``)."""
    from nlshray.metrics import recall_at_k

    dim = kwargs.get("dim") or queries.shape[1]
    hasher = NeuralBucketer(
        dim,
        bits=kwargs.get("bits", 12),
        seed=kwargs.get("seed", 42),
        weights_path=kwargs.get("weights_path"),
        weights=kwargs.get("weights"),
    )
    codes, counts = bucket_code_counts(
        ds,
        weights=hasher.weights,
        col=kwargs.get("col", "embedding"),
        dim=dim,
    )
    qprobs = forward_probs(
        _l2norm(np.asarray(queries, dtype=np.float64)), hasher.weights
    )

    results = []
    for n in probe_counts:
        probe_sets = sample_codes(qprobs, n, seed=kwargs.get("seed", 42) + 1)
        per_q = [
            int(
                counts[
                    np.searchsorted(codes, p[np.isin(p, codes, assume_unique=True)])
                ].sum()
            )
            for p in probe_sets
        ]
        out = neural_knn(ds, queries, query_ids, k=k, n_probes=n, **kwargs)
        rows: dict[int, list[int]] = {}
        for r in out.take_all():
            rows.setdefault(int(r["query_id"]), []).append(int(r["neighbor_id"]))
        recalls = [
            recall_at_k(truth[q], np.array(rows.get(q, []), dtype=np.int64))
            for q in truth
        ]
        results.append(
            {
                "n_probes": n,
                "recall": float(np.mean(recalls)),
                "mean_candidates": float(
                    np.mean([len(v) for v in rows.values()]) if rows else 0.0
                ),
                "mean_bucket_candidates": float(np.mean(per_q)),
            }
        )
    return results
