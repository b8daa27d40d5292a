"""Cross-document line-level dedup (CCNet / Dolma "paragraph dedup").

The reference dedups whole documents (doc-level signatures,
`/root/reference/nlsh/hashing.py` semantics); the standard upstream
hygiene pass a web corpus needs BEFORE doc-level MinHash is removing
boilerplate LINES — navigation strings, cookie banners, footers — that
repeat across many pages and inflate every doc-level similarity. This
stage rewrites each document, dropping every line that occurs in
``min_docs`` or more DISTINCT documents, preserving the order of the
surviving lines.

Scale shape: boilerplate lines are exactly the HEAVY HITTERS of the
within-doc-deduped line stream, so this reuses the CountMin-candidate
pattern of ``stages/heavy.py``:

1. **Sketch pass** — each block splits its docs on ``\\n``, dedupes
   (doc, line) occurrences (a line repeated inside one doc counts
   once — the threshold is on *distinct docs*), and CMS-counts the
   survivors. The merged sketch is <= ``d*w`` rows regardless of how
   many distinct lines the corpus has.
2. **Candidate pass** — the dense sketch is broadcast once with
   ``ray.put``; each block re-emits ``(line, partial_distinct_docs)``
   only for lines whose CMS estimate reaches ``min_docs``. CountMin
   never underestimates, so no true boilerplate line can be missed;
   the exact ``groupby(line).sum >= min_docs`` filter removes the
   collision-admitted extras. Candidate rows are the only per-line
   data that ever shuffles.
3. **Rewrite pass** — the exact boilerplate line set (small: only
   lines repeated across documents survive) is broadcast once; each
   block drops members with one vectorized ``pc.is_in`` over the
   flattened line values and re-joins the survivors with
   ``pc.binary_join``. Document text never shuffles.

Within-doc dedup uses a 128-bit key (two independent 64-bit polynomial
hashes) purely to deduplicate; every emitted count and the membership
test in the rewrite pass operate on the actual line STRINGS, so the
output is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from nlshray.hashing import hash_utf8_array
from nlshray.stages.heavy import _cms_cells

_SEP = "\n"


def _split_lines(t: pa.Table, text_col: str):
    """(list<string> lines, flat values, int64 offsets) for one block."""
    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ls = pc.split_pattern(arr, _SEP)
    flat = pc.list_flatten(ls)
    off = np.asarray(ls.offsets, dtype=np.int64)
    return ls, flat, off


def _distinct_doc_lines(flat: pa.Array, off: np.ndarray) -> np.ndarray:
    """Bool mask keeping ONE occurrence of each (doc, line) pair.

    Dedup key is (doc index, h1(line), h2(line)) — two independent
    64-bit hashes, so a merge needs a simultaneous 128-bit collision
    inside one document. Counts emitted downstream are of the actual
    strings; the hashes never leave this function.
    """
    n = len(flat)
    if n == 0:
        return np.zeros(0, dtype=bool)
    doc_idx = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
    h1 = hash_utf8_array(flat, seed=0x11CE)
    h2 = hash_utf8_array(flat, seed=0x22CE)
    order = np.lexsort((h2, h1, doc_idx))
    d, a, b = doc_idx[order], h1[order], h2[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = (d[1:] != d[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    keep = np.zeros(n, dtype=bool)
    keep[order[first]] = True
    return keep


def _block_line_doc_counts(t: pa.Table, text_col: str):
    """(distinct lines, per-line distinct-doc count) for one block."""
    _, flat, off = _split_lines(t, text_col)
    kept = flat.filter(pa.array(_distinct_doc_lines(flat, off)))
    vc = pc.value_counts(kept)
    return vc.field("values"), vc.field("counts").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)


def _sketch_partial(
    t: pa.Table, text_col: str, d: int, w: int, seed: int
) -> pa.Table:
    """One block's CMS cell partial: sparse (cell, n) int64 rows."""
    lines, counts = _block_line_doc_counts(t, text_col)
    dense = np.zeros(d * w, dtype=np.int64)
    if len(lines):
        cells = _cms_cells(lines, d, w, seed)
        np.add.at(dense, cells.ravel(), np.tile(counts, d))
    nz = np.flatnonzero(dense)
    return pa.table(
        {
            "cell": pa.array(nz, pa.int64()),
            "n": pa.array(dense[nz], pa.int64()),
        }
    )


def _cand_partial(
    t: pa.Table,
    text_col: str,
    d: int,
    w: int,
    seed: int,
    thr: int,
    sketch_ref,
) -> pa.Table:
    """One block's (line, partial_distinct_docs) rows for lines whose
    CMS estimate reaches thr (CMS never underestimates)."""
    sk = ray.get(sketch_ref)  # zero-copy plasma read, once per task
    lines, counts = _block_line_doc_counts(t, text_col)
    if not len(lines):
        return pa.table(
            {
                "line": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
    est = sk[_cms_cells(lines, d, w, seed)].min(axis=0)
    keep = est >= thr
    return pa.table(
        {
            "line": lines.filter(pa.array(keep)),
            "n_docs": pa.array(counts[keep], pa.int64()),
        }
    )


def boilerplate_lines(
    docs: rd.Dataset,
    min_docs: int = 2,
    text_col: str = "text",
    d: int = 4,
    w: int = 1 << 16,
    seed: int = 0,
    num_partitions: int = 8,
) -> rd.Dataset:
    """(line, n_docs) for every line in >= ``min_docs`` distinct docs.

    Exact counts; the CMS is pure pruning (see module docstring).
    """

    from functools import partial as fpartial

    from nlshray.stages.exchange import (
        grouped_sum_merge,
        hash_exchange,
        int64_key_hash,
        utf8_key_hash,
    )

    refs = docs.select_columns([text_col]).to_arrow_refs()
    if not refs:
        return rd.from_arrow(
            pa.table(
                {"line": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64())}
            )
        )
    # sketch pass: <= d*w sparse cell rows per block, exchanged on cell
    sk_out = ray.get(
        hash_exchange(
            refs,
            fpartial(_sketch_partial, text_col=text_col, d=d, w=w, seed=seed),
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
    thr = int(min_docs)

    # candidate pass: only CMS-passed lines shuffle; round B holds the
    # COMPLETE global distinct-doc count per line, so the >= thr filter
    # inside the merge is exact and collision-admitted extras die there
    base = grouped_sum_merge("line", ["n_docs"])

    def exact_merge(t: pa.Table) -> pa.Table:
        out = base(t)
        if len(out):
            out = out.filter(pc.greater_equal(out["n_docs"], thr))
        return out

    b_out = hash_exchange(
        refs,
        fpartial(
            _cand_partial,
            text_col=text_col,
            d=d,
            w=w,
            seed=seed,
            thr=thr,
            sketch_ref=sketch_ref,
        ),
        utf8_key_hash("line"),
        exact_merge,
        num_partitions,
    )
    return rd.from_arrow_refs(b_out)


def line_dedup(
    docs: rd.Dataset,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = 4,
    w: int = 1 << 16,
    seed: int = 0,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Rewrite docs with boilerplate lines removed.

    Output: (id_col, clean_text, n_lines, n_dropped). ``clean_text``
    joins the surviving lines with ``\\n`` in original order; a doc
    whose every line is boilerplate keeps an empty string.

    Memory envelope: the broadcast boilerplate set holds only lines
    that repeat across >= ``min_docs`` documents — the cross-site
    boilerplate vocabulary, not the corpus (CCNet measures this in the
    millions of lines for a full crawl: a few hundred MB in plasma,
    read zero-copy by every rewrite task).
    """
    refs = boilerplate_lines(
        docs,
        min_docs,
        text_col=text_col,
        d=d,
        w=w,
        seed=seed,
        num_partitions=num_partitions,
    ).to_arrow_refs()
    chunks = [c for t in ray.get(refs) if t.num_rows for c in t["line"].chunks]
    boiler = (
        pa.chunked_array(chunks).combine_chunks()
        if chunks
        else pa.array([], pa.string())
    )
    boiler_ref = ray.put(boiler)

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        bset = ray.get(boiler_ref)
        _, flat, off = _split_lines(t, text_col)
        if len(bset):
            drop = pc.is_in(flat, value_set=bset).to_numpy(
                zero_copy_only=False
            )
        else:
            drop = np.zeros(len(flat), dtype=bool)
        keep = ~drop
        kept_cum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(keep, dtype=np.int64)]
        )
        new_ls = pa.ListArray.from_arrays(
            pa.array(kept_cum[off], pa.int32()),
            flat.filter(pa.array(keep)),
        )
        drop_cum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(drop, dtype=np.int64)]
        )
        n_dropped = drop_cum[off[1:]] - drop_cum[off[:-1]]
        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": pc.binary_join(new_ls, _SEP),
                "n_lines": pa.array(np.diff(off), pa.int64()),
                "n_dropped": pa.array(n_dropped, pa.int64()),
            }
        )

    return docs.map_batches(
        rewrite, batch_format="pyarrow", zero_copy_batch=True
    )
