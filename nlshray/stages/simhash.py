"""SimHash near-dup pipeline pieces.

Reuses the MinHash pipeline's physical plan (band rows -> grouped pair
emission -> broadcast verify) with a different signature family: one
uint64 SimHash per doc, banded into 4 x 16-bit chunks (any matching
chunk => candidate), verified by Hamming distance. The pluggable-Signer
parity with the reference's hashing duck type (SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.functions.nputil import lookup_sorted
from nlshray.functions.simhash import hamming_distance, simhash_batch
from nlshray.hashing import MASK63, splitmix64
from nlshray.stages.pairs import candidate_pairs_stage

N_CHUNKS = 4  # 4 x 16-bit chunks of the 64-bit simhash


class SimHashSigner:
    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch["text"], seed=self.seed)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sh.astype(np.int64)),  # bit-preserving view
            }
        )


def simhash_sign_stage(
    docs: ray.data.Dataset, seed: int = 42, *, batch_size: int = 1024
) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        SimHashSigner,
        fn_constructor_kwargs={"seed": seed},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def simhash_band_stage(sigs: ray.data.Dataset) -> ray.data.Dataset:
    """simhash -> (band_idx, band_hash, doc_id) rows, one per 16-bit chunk.

    Chunk value is mixed with its index (same trick as MinHash banding)
    so the groupby key is the single ``band_hash`` column.
    """

    def explode(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy().astype(np.uint64)
        n = sh.shape[0]
        chunks = np.stack(
            [(sh >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(N_CHUNKS)],
            axis=1,
        )
        mixed = splitmix64(
            chunks ^ splitmix64(np.arange(N_CHUNKS, dtype=np.uint64))[None, :]
        )
        bh = (mixed & np.uint64(MASK63)).astype(np.int64)
        return pa.table(
            {
                "band_idx": pa.array(
                    np.tile(np.arange(N_CHUNKS, dtype=np.int16), n)
                ),
                "band_hash": pa.array(bh.reshape(-1)),
                "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), N_CHUNKS)),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dedup(
    docs: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    seed: int = 42,
    cfg=None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """docs -> confirmed simhash near-dup pairs
    (left_id, right_id, left_simhash, right_simhash, hamming, n_bands).

    EXACT at ``max_hamming <= N_CHUNKS - 1``: a pair differing in <= 3
    bits can touch at most 3 of the 4 16-bit chunks, so at least one
    chunk matches and bands recall the pair (pigeonhole) — which is why
    the DuckDB all-pairs oracle reproduces this query bit-for-bit.
    The simhash values ride along as int64 (bit-preserving views) so
    the oracle can be checked value-by-value."""
    from nlshray.config import DedupConfig

    cfg = cfg or DedupConfig()
    sigs = simhash_sign_stage(docs, seed=seed).materialize()
    bands = simhash_band_stage(sigs)
    cand, _stats = candidate_pairs_stage(bands, cfg, num_partitions=num_partitions)

    # broadcast simhash lookup (64 bits/doc — tiny) for verification
    keys, vals = [], []
    for b in sigs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.append(b["doc_id"].to_numpy())
        vals.append(b["simhash"].to_numpy())
    k = np.concatenate(keys) if keys else np.empty(0, np.int64)
    v = np.concatenate(vals) if vals else np.empty(0, np.int64)
    order = np.argsort(k)
    lut_ref = ray.put((k[order], v[order]))

    def verify(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(lut_ref)
        l = lookup_sorted(kk, vv, t["left_id"].to_numpy(), np.zeros(t.num_rows, np.int64))
        r = lookup_sorted(kk, vv, t["right_id"].to_numpy(), np.zeros(t.num_rows, np.int64))
        ham = hamming_distance(l.astype(np.uint64), r.astype(np.uint64))
        out = (
            t.append_column("left_simhash", pa.array(l, pa.int64()))
            .append_column("right_simhash", pa.array(r, pa.int64()))
            .append_column("hamming", pa.array(ham.astype(np.int64)))
        )
        return out.filter(pa.compute.less_equal(out["hamming"], max_hamming))

    return cand.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
