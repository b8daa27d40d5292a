"""Trained-head evaluation at bench scale (VERDICT r3 #7).

The reference's checkpoint gate keeps a trained hash head only if eval
recall went UP while the candidate budget did not (``/root/reference/
nlsh/trainers/base.py:98-104``). This tool measures that trade-off as a
recorded artifact: random hyperplanes vs ITQ (`fit_hash_weights`) vs the
supervised triplet head (`fit_triplet_weights`) on a 50k clustered
embedding corpus, each swept over probe counts (recall@10 + mean
candidate count per query).

Training is driver-bounded on a 10k subsample (mirrors the reference's
bounded train set); serving runs the distributed ``neural_knn`` path
over the full 50k corpus.

Usage: python tools/head_eval.py   # prints one JSON line + a table
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, BITS, K = 50_000, 64, 10, 10
N_QUERIES = 100
PROBES = (1, 2, 4, 8, 16)
SEED = 7


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nlshray.fixtures import generate_embeddings
    from nlshray.stages.neural import fit_hash_weights, multiprobe_sweep
    from nlshray.stages.train import fit_triplet_weights, self_knn

    X = generate_embeddings(N, dim=DIM, seed=SEED)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N, dtype=np.int64)),
                "embedding": pa.array(list(X.astype(np.float32))),
            }
        )
    ).repartition(32).materialize()

    qids = np.arange(N_QUERIES, dtype=np.int64)
    Q = X[:N_QUERIES]
    truth_knn = self_knn(
        X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12), K
    )
    truth = {int(i): truth_knn[i] for i in qids}

    t0 = time.perf_counter()
    itq = fit_hash_weights(X, bits=BITS)
    itq_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    sample = X[:10_000]
    knn_s = self_knn(sample, K)
    trained = fit_triplet_weights(
        sample, bits=BITS, hidden=(32,), epochs=3, seed=SEED, knn=knn_s,
    )
    train_sec = time.perf_counter() - t0

    # ITQ-initialized fine-tune: the reference's keep-if-improved gate
    # with the unsupervised head as checkpoint zero — returned head is
    # never worse than ITQ on the train metric
    t0 = time.perf_counter()
    # descale the ITQ logits 8x before fine-tuning: hard codes (and so
    # checkpoint-zero metrics) are invariant to positive logit scale,
    # but sigmoid(8z) saturates and starves the triplet gradients
    itq_soft = {**itq, "W_out": itq["W_out"] / 8.0, "b_out": itq["b_out"] / 8.0}
    tuned = fit_triplet_weights(
        sample, bits=BITS, epochs=5, lr=1e-3, seed=SEED, knn=knn_s,
        init=itq_soft,
    )
    tune_sec = time.perf_counter() - t0

    heads = {
        "random": None,
        "itq": itq,
        "triplet": trained,
        "triplet_itq": tuned,
    }
    report = {}
    for name, w in heads.items():
        report[name] = multiprobe_sweep(
            ds, Q, qids, truth, probe_counts=PROBES, k=K,
            bits=BITS, seed=SEED, dim=DIM, weights=w,
        )

    print(
        json.dumps(
            {
                "metric": "trained-head recall/candidates sweep (50k corpus)",
                "n": N, "dim": DIM, "bits": BITS, "k": K,
                "itq_fit_sec": round(itq_sec, 1),
                "triplet_fit_sec": round(train_sec, 1),
                "triplet_itq_fit_sec": round(tune_sec, 1),
                "sweep": report,
            }
        )
    )
    print("\n| head | " + " | ".join(f"p={p}" for p in PROBES) + " |",
          file=sys.stderr)
    print("|---" * (len(PROBES) + 1) + "|", file=sys.stderr)
    for name, rows in report.items():
        cells = [
            f"{r['recall']:.3f} ({r['mean_bucket_candidates']:.0f})"
            for r in rows
        ]
        print(f"| {name} | " + " | ".join(cells) + " |", file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    main()
