"""MinHash signature stage — the engine's hash-encoder.

Descendant of the reference's batched hashing loop
(``/root/reference/nlsh/indexer.py:36-54``: hash the corpus in 4096-row
batches through a stateful encoder). There, encoder weights live on one
GPU and are reused across batches (pattern ST1, SURVEY.md §2.3); here
the signer is a callable CLASS run as a Ray actor pool — the permutation
table is built once per actor in ``__init__``, batches stream through
``__call__``. Note: the reference's manual tail-batch handling has a bug
that silently changes behavior for the last partial batch
(``nlsh/indexer.py:52``); Ray Data's block machinery makes tail batches
a non-issue.

Output schema: ``doc_id: int64, sig: fixed_size_list<uint64, num_perms>``.
~1 KB/doc — this is all that moves through every later shuffle.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.config import DedupConfig
from nlshray.functions.minhash import oph_sign_concat, perm_seeds, sign_concat
from nlshray.functions.shingles import batch_shingle_hashes


def sigs_to_numpy(sig_col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """fixed_size_binary(num_perms*8) column -> (n, num_perms) uint64.

    Zero-copy view of the Arrow buffer (little-endian uint64 lanes).
    Signatures ride as fixed-size binary rather than fixed_size_list
    because pyarrow's hash join (used by Dataset.join in the verify
    stage) rejects list-typed payload columns.
    """
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    buf = sig_col.buffers()[1]
    off = sig_col.offset * num_perms
    return np.frombuffer(buf, dtype="<u8")[off : off + len(sig_col) * num_perms].reshape(
        -1, num_perms
    )


def numpy_to_sigs(sigs: np.ndarray) -> pa.Array:
    n, p = sigs.shape
    data = np.ascontiguousarray(sigs.astype("<u8", copy=False))
    return pa.Array.from_buffers(pa.binary(p * 8), n, [None, pa.py_buffer(data.tobytes())])


class MinHashSigner:
    """text -> 128-slot MinHash signature (the pluggable Signer).

    The permutation table is seed-derived and cheap (128 splitmix values),
    so per-worker regeneration costs nothing — run as STATELESS tasks
    (``sign_batch``) that reuse warm workers from earlier stages. The
    actor-pool form stays available for signers with genuinely expensive
    init (the optional neural signer, SURVEY.md ST1)."""

    def __init__(self, cfg: DedupConfig):
        self.k = cfg.shingle_k
        self.seeds = perm_seeds(cfg.num_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, lengths = batch_shingle_hashes(batch["text"], self.k)
        sigs = sign_concat(flat, lengths, self.seeds)
        return pa.table({"doc_id": batch["doc_id"], "sig": numpy_to_sigs(sigs)})


@lru_cache(maxsize=8)
def _cached_seeds(num_perms: int, seed: int) -> np.ndarray:
    return perm_seeds(num_perms, seed)


def sign_batch(
    batch: pa.Table, *, k: int, num_perms: int, seed: int,
    signer: str = "minhash",
) -> pa.Table:
    flat, lengths = batch_shingle_hashes(batch["text"], k)
    if signer == "oph":
        sigs = oph_sign_concat(flat, lengths, num_perms, seed)
    else:
        sigs = sign_concat(flat, lengths, _cached_seeds(num_perms, seed))
    return pa.table({"doc_id": batch["doc_id"], "sig": numpy_to_sigs(sigs)})


def sign_stage(
    reps: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """(doc_id, text, ...) -> (doc_id, sig). Projects early: only the two
    needed columns enter the stage. ``cfg.signer`` picks the kernel:
    permutation MinHash (default) or one-permutation hashing with
    rotation densification (``oph`` — the 100-TB sign plan, one hash
    pass instead of ``num_perms``)."""
    return reps.select_columns(["doc_id", "text"]).map_batches(
        sign_batch,
        fn_kwargs={
            "k": cfg.shingle_k,
            "num_perms": cfg.num_perms,
            "seed": cfg.seed,
            "signer": cfg.signer,
        },
        batch_format="pyarrow",
        batch_size=cfg.sign_batch_size,
        zero_copy_batch=True,
    )
