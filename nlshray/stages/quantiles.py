"""Exact grouped quantiles over a bounded-domain value column.

A global sort is the textbook way to get exact quantiles and the worst
thing to do at 10^12 rows. For bounded integer domains (doc lengths,
token counts, status codes) the histogram IS sufficient statistics:
per-block (group, value, count) partials — at most |domain| x |groups|
rows each — stream to one combine, and the quantile is read off the
group's CDF. Two streaming passes, zero shuffles, EXACT answers
(``quantile_disc`` semantics: the smallest value whose cumulative count
reaches ``ceil(q * n)``). Unbounded/float domains need a bucketing
pre-map (not provided here — the corpus stats this serves are integral).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.functions.nputil import lexsort2


def _hist_partial(t: pa.Table, *, group_col: str, value_col: str) -> pa.Table:
    """(group, value, count) runs of one batch — sorted run detection,
    no python per row."""
    if t.num_rows == 0:
        return pa.table(
            {
                group_col: pa.array([], pa.string()),
                "value": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    g = t[group_col]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    v = t[value_col].to_numpy().astype(np.int64)
    order = lexsort2(v, codes)
    c_s, v_s = codes[order], v[order]
    change = (np.diff(c_s) != 0) | (np.diff(v_s) != 0)
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    counts = np.diff(np.concatenate([starts, [c_s.shape[0]]]))
    return pa.table(
        {
            group_col: enc.dictionary.take(pa.array(c_s[starts])),
            "value": pa.array(v_s[starts]),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
) -> pa.Table:
    """-> one row per group: ``q_<pct>`` columns (exact, quantile_disc
    semantics) plus ``n_rows``. The combine is driver-side over the
    merged histogram — bounded by |domain| x |groups|, not corpus size."""
    hist: dict[tuple, int] = {}
    for b in ds.select_columns([group_col, value_col]).map_batches(
        _hist_partial,
        fn_kwargs={"group_col": group_col, "value_col": value_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for g, v, n in zip(
            b[group_col].to_pylist(), b["value"].to_pylist(), b["n"].to_pylist()
        ):
            hist[(g, v)] = hist.get((g, v), 0) + int(n)

    groups = sorted({g for g, _ in hist})
    cols: dict[str, list] = {group_col: []}
    for q in qs:
        cols[f"q_{int(round(q * 100))}"] = []
    cols["n_rows"] = []
    for g in groups:
        vals = sorted(v for gg, v in hist if gg == g)
        counts = np.array([hist[(g, v)] for v in vals], np.int64)
        cdf = np.cumsum(counts)
        n = int(cdf[-1])
        cols[group_col].append(g)
        for q in qs:
            target = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cdf, target))
            cols[f"q_{int(round(q * 100))}"].append(int(vals[idx]))
        cols["n_rows"].append(n)
    return pa.table(
        {
            group_col: pa.array(cols[group_col], pa.string()),
            **{
                f"q_{int(round(q * 100))}": pa.array(
                    cols[f"q_{int(round(q * 100))}"], pa.int64()
                )
                for q in qs
            },
            "n_rows": pa.array(cols["n_rows"], pa.int64()),
        }
    )
