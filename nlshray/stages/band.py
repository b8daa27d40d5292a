"""LSH banding: signatures -> exploded (band_idx, band_hash, doc_id) rows.

Descendant of the reference's bit-pack step (``/root/reference/nlsh/utils.pyx:7-32``):
there a per-vector binary code folds into one integer bucket key; here
each of b=16 bands of r=8 signature slots folds into a 64-bit band key
(``nlshray.hashing.band_hashes``), and each doc emits one row per band —
the multi-probe explode of ``nlsh/hashings.py:77-85`` reshaped as rows
(SURVEY.md M8/M9).

``band_hash`` already mixes in the band index, so the groupby key for
bucketing is the single int64 column ``band_hash``. Rows are 18 bytes —
the only thing the candidate-generation shuffle moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.config import DedupConfig
from nlshray.hashing import MASK63, band_hashes
from nlshray.stages.sign import sigs_to_numpy


def _band_batch(batch: pa.Table, *, bands: int, r: int, num_perms: int) -> pa.Table:
    sigs = sigs_to_numpy(batch["sig"], num_perms)
    n = sigs.shape[0]
    bh = (band_hashes(sigs, bands, r) & np.uint64(MASK63)).astype(np.int64)
    doc_ids = batch["doc_id"].to_numpy()
    return pa.table(
        {
            "band_idx": pa.array(np.tile(np.arange(bands, dtype=np.int16), n)),
            "band_hash": pa.array(bh.reshape(-1)),
            "doc_id": pa.array(np.repeat(doc_ids, bands)),
        }
    )


def band_rows_of_block(
    block: pa.Table, *, bands: int, r: int, num_perms: int
) -> tuple[np.ndarray, np.ndarray]:
    """(band_hash, doc_id) arrays of one sig block — the banding kernel
    in raw-task form, folded into the pair shuffle's round A so the
    scale plan needs no separate band-map execution."""
    t = _band_batch(block, bands=bands, r=r, num_perms=num_perms)
    return t["band_hash"].to_numpy(), t["doc_id"].to_numpy()


def band_stage(sigs: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    return sigs.map_batches(
        _band_batch,
        fn_kwargs={
            "bands": cfg.bands,
            "r": cfg.rows_per_band,
            "num_perms": cfg.num_perms,
        },
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
