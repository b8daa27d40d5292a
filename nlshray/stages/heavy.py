"""Exact corpus-wide heavy hitters via a CountMin candidate pass.

The third sketch family next to Bloom (``stages/incremental``) and
HyperLogLog (grouped distinct counts): a CountMin sketch used the way a
100-TB pipeline actually wants it — never as the answer, only as a
recall-safe candidate filter in front of an exact second pass, so the
output is EXACT while the shuffle stays bounded by the sketch width
instead of the vocabulary size (``vocab_top_tokens``'s combiner shuffles
one partial row per distinct (block, token); on a web corpus that's the
open-vocabulary tail, which is exactly what a threshold query doesn't
need to move).

Two streaming passes over the token column:

1. **Sketch pass** — each block tokenizes (same ``[0-9a-z_]+`` tokens as
   the vocab/decontam operators), ``value_counts`` its block vocabulary,
   scatters the counts into ``d`` hash rows of width ``w`` with
   ``np.add.at``, and emits only the NONZERO cells as ``(cell, n)``
   rows — at most ``d*w`` per block regardless of vocabulary. A bounded
   ``groupby(cell).sum`` merges them into the global sketch (<= ``d*w``
   rows total, a few MB driver-side).
2. **Candidate pass** — the dense sketch is broadcast ONCE with
   ``ray.put`` (workers map it zero-copy from plasma); each block
   re-counts its vocabulary and emits ``(tok, n_partial)`` only for
   tokens whose CMS estimate (min over the ``d`` rows) reaches
   ``threshold``. CountMin never underestimates, so no true heavy
   hitter can be dropped; collisions only let extra candidates through,
   and the final ``groupby(tok).sum`` + exact ``>= threshold`` filter
   removes them. Candidate rows are the ONLY per-token data that ever
   shuffles.

Output: ``(tok, n)`` with exact global counts, ``n >= threshold``,
sorted ``n DESC, tok ASC`` — bit-replayable by a plain SQL
``GROUP BY ... HAVING`` (no hash enters the result, the sketch is pure
pruning). Determinism: counts are exact sums and the hash rows are
seed-derived, so the result is independent of block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from nlshray.hashing import hash_utf8_array

_SPLIT_PATTERN = r"[^0-9a-z_]+"


def _block_vocab(t: pa.Table, col: str) -> tuple[pa.Array, np.ndarray]:
    """(distinct tokens, counts) for one block's text column."""
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    vc = pc.value_counts(flat)
    return vc.field("values"), vc.field("counts").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)


def _cms_cells(tokens: pa.Array, d: int, w: int, seed: int) -> np.ndarray:
    """(d, n_tokens) cell index per hash row (row r's cells offset r*w)."""
    cells = np.empty((d, len(tokens)), dtype=np.int64)
    for r in range(d):
        h = hash_utf8_array(tokens, seed=seed + 0x5EED + r)
        cells[r] = (h % np.uint64(w)).astype(np.int64) + r * w
    return cells


def heavy_hitter_tokens(
    docs: ray.data.Dataset,
    threshold: int,
    text_col: str = "text",
    d: int = 4,
    w: int = 1 << 16,
    seed: int = 0,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """All tokens with exact corpus-wide count >= ``threshold``.

    ``d`` x ``w`` CountMin (defaults: 4 x 65536 = 2 MB of int64 —
    overestimate probability per row ~ vocab/w, min over 4 rows). Raise
    ``w`` for web-scale vocabularies; the sketch merge stays <= ``d*w``
    rows no matter what.
    """

    def sketch_partial(t: pa.Table) -> pa.Table:
        toks, counts = _block_vocab(t, text_col)
        dense = np.zeros(d * w, dtype=np.int64)
        if len(toks):
            cells = _cms_cells(toks, d, w, seed)
            np.add.at(dense, cells.ravel(), np.tile(counts, d))
        nz = np.flatnonzero(dense)
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "n": pa.array(dense[nz], pa.int64()),
            }
        )

    merged = (
        docs.map_batches(
            sketch_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cell", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # <= d*w rows by construction — the ONLY collect
    )
    sketch = np.zeros(d * w, dtype=np.int64)
    for row in merged:
        sketch[row["cell"]] = row["n"]
    sketch_ref = ray.put(sketch)

    def candidates(t: pa.Table) -> pa.Table:
        sk = ray.get(sketch_ref)  # zero-copy plasma read, once per task
        toks, counts = _block_vocab(t, text_col)
        if not len(toks):
            return pa.table(
                {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        est = sk[_cms_cells(toks, d, w, seed)].min(axis=0)
        keep = est >= threshold
        return pa.table(
            {
                "tok": toks.filter(pa.array(keep)),
                "n": pa.array(counts[keep], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(
            candidates, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("tok", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    thr = int(threshold)

    def exact_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"], thr))

    exact = agg.map_batches(
        exact_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    return exact.sort(["n", "tok"], descending=[True, False])
