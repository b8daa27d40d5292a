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


def _hh_sketch_partial(
    t: pa.Table, col: str, d: int, w: int, seed: int
) -> pa.Table:
    """One block's CMS cell partial: sparse (cell, n) rows."""
    toks, counts = _block_vocab(t, col)
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


def _hh_cand_partial(
    t: pa.Table, col: str, d: int, w: int, seed: int, thr: int, sketch_ref
) -> pa.Table:
    """One block's (tok, partial_count) rows for CMS-passed tokens."""
    sk = ray.get(sketch_ref)  # zero-copy plasma read, once per task
    toks, counts = _block_vocab(t, col)
    if not len(toks):
        return pa.table(
            {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    est = sk[_cms_cells(toks, d, w, seed)].min(axis=0)
    keep = est >= thr
    return pa.table(
        {
            "tok": toks.filter(pa.array(keep)),
            "n": pa.array(counts[keep], pa.int64()),
        }
    )


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

    from functools import partial as fpartial

    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        int64_key_hash,
        utf8_key_hash,
    )

    empty = pa.table(
        {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    refs = docs.select_columns([text_col]).to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(empty)
    sk_out = ray.get(
        hash_exchange(
            refs,
            fpartial(_hh_sketch_partial, col=text_col, d=d, w=w, seed=seed),
            int64_key_hash("cell"),
            grouped_sum_merge("cell", ["n"]),
            num_partitions,
        )
    )
    sketch = np.zeros(d * w, dtype=np.int64)
    for t in sk_out:
        if len(t):
            sketch[t["cell"].to_numpy(zero_copy_only=False)] = t[
                "n"
            ].to_numpy(zero_copy_only=False)
    sketch_ref = ray.put(sketch)
    thr = int(threshold)

    base = grouped_sum_merge("tok", ["n"])

    def exact_merge(t: pa.Table) -> pa.Table:
        out = base(t)
        if len(out):
            out = out.filter(pc.greater_equal(out["n"], thr))
        return out

    exact = ray.data.from_arrow_refs(
        hash_exchange(
            refs,
            fpartial(
                _hh_cand_partial,
                col=text_col,
                d=d,
                w=w,
                seed=seed,
                thr=thr,
                sketch_ref=sketch_ref,
            ),
            utf8_key_hash("tok"),
            exact_merge,
            num_partitions,
        )
    )
    return exact.sort(["n", "tok"], descending=[True, False])
