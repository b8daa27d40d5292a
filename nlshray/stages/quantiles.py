"""Exact grouped quantiles over a bounded-domain value column.

A global sort is the textbook way to get exact quantiles and the worst
thing to do at 10^12 rows. For bounded integer domains (doc lengths,
token counts, status codes) the histogram IS sufficient statistics:
per-block (group, value, count) partials — at most |domain| x |groups|
rows each — stream to one combine, and the quantile is read off the
group's CDF. Two streaming passes, zero shuffles, EXACT answers
(``quantile_disc`` semantics: the smallest value whose cumulative count
reaches ``ceil(q * n)``). Unbounded/float domains use the bucketing
pre-map below (``grouped_quantiles_float``): a coarse histogram over an
order-preserving float64→uint64 key locates the straddling bucket per
(group, q), then ONE targeted second pass gathers only those buckets'
values and reads the exact answer off the in-bucket rank. Still zero
all-to-all shuffles; the gather is bounded by the straddling buckets'
total population (≈ n / #occupied-buckets per group in the typical
case), not corpus size.
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


def grouped_mad(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    outlier_k: int = 3,
) -> pa.Table:
    """Robust per-group location/scale report: median, MAD (median
    absolute deviation, ``quantile_disc`` semantics on both), and the
    count of rows with ``|v - med| > k * MAD`` — the robust-z outlier
    filter a corpus-curation pass runs before trusting mean/std.

    ONE streaming pass, zero shuffles: the per-(group, value) histogram
    is sufficient statistics for every order statistic of every
    per-value transform, so median, the deviation histogram, MAD and
    the outlier count are all read off the same driver-merged CDF —
    where the textbook plan is two full corpus passes with a per-group
    sort each."""
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

    def _disc_median(vals: np.ndarray, counts: np.ndarray) -> int:
        cdf = np.cumsum(counts)
        target = max(int(np.ceil(0.5 * int(cdf[-1]))), 1)
        return int(vals[int(np.searchsorted(cdf, target))])

    groups = sorted({g for g, _ in hist})
    out: dict[str, list] = {
        group_col: [], "med": [], "mad": [], "n_outliers": [], "n_rows": []
    }
    for g in groups:
        vals = np.array(sorted(v for gg, v in hist if gg == g), np.int64)
        counts = np.array([hist[(g, v)] for v in vals], np.int64)
        med = _disc_median(vals, counts)
        # deviation histogram: |v - med| with the same counts, re-merged
        # (two values can map to one deviation)
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        dev_s, cnt_s = dev[order], counts[order]
        starts = (
            np.concatenate([[0], np.flatnonzero(np.diff(dev_s)) + 1])
            if dev_s.shape[0]
            else np.empty(0, np.int64)
        )
        dev_u = dev_s[starts]
        cnt_u = np.add.reduceat(cnt_s, starts)
        mad = _disc_median(dev_u, cnt_u)
        n_out = int(cnt_u[dev_u > outlier_k * mad].sum())
        out[group_col].append(g)
        out["med"].append(med)
        out["mad"].append(mad)
        out["n_outliers"].append(n_out)
        out["n_rows"].append(int(counts.sum()))
    return pa.table(
        {
            group_col: pa.array(out[group_col], pa.string()),
            "med": pa.array(out["med"], pa.int64()),
            "mad": pa.array(out["mad"], pa.int64()),
            "n_outliers": pa.array(out["n_outliers"], pa.int64()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
        }
    )


def grouped_percent_rank(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    out_col: str = "pct_rank",
) -> ray.data.Dataset:
    """Attach SQL ``PERCENT_RANK() OVER (PARTITION BY group ORDER BY
    value)`` to every row — the windowed-rank twin of
    :func:`grouped_quantiles`, and like it a bounded-int-domain plan
    with ZERO all-to-all shuffles where the textbook plan is a full
    per-group sort of the corpus.

    Two streaming passes: (1) per-block (group, value, count) histogram
    partials merge driver-side into per-group CDFs — at most
    |domain| x |groups| entries, not corpus size; (2) a broadcast
    lookup map (sorted values + strictly-below counts per group) is
    closed over by a ``map_batches`` that attaches
    ``pct = n_strictly_below / (n_group - 1)`` (0.0 for singleton
    groups, matching SQL) via one searchsorted per batch-distinct
    group. Descendant of the reference's rank-the-candidates step
    (``nlsh/indexer.py:84-95``) generalized to a windowed column."""
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

    lookup: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for g in {g for g, _ in hist}:
        vals = np.array(sorted(v for gg, v in hist if gg == g), np.int64)
        counts = np.array([hist[(g, v)] for v in vals], np.int64)
        below = np.concatenate([[0], np.cumsum(counts)[:-1]])
        lookup[g] = (vals, below, int(counts.sum()))

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        garr = t[group_col]
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        enc = garr.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        v = t[value_col].to_numpy().astype(np.int64)
        pct = np.zeros(t.num_rows, np.float64)
        for gi, g in enumerate(enc.dictionary.to_pylist()):
            vals, below, n = lookup[g]
            if n <= 1:
                continue
            m = codes == gi
            idx = np.searchsorted(vals, v[m])
            pct[m] = below[idx] / np.float64(n - 1)
        return t.append_column(out_col, pa.array(pct, pa.float64()))

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# float / unbounded domains: bucketing pre-map + targeted refine pass


_BUCKET_BITS = 20  # 2^20 coarse buckets over the whole float64 order


def _float_order_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> uint64 map (the classic total-order
    trick: flip the sign bit for non-negatives, all bits for negatives),
    so uint64 comparison == IEEE754 ordering. NaNs are the caller's
    problem (they'd sort above +inf); the stats this serves are finite."""
    u = v.astype(np.float64).view(np.uint64)
    neg = (u >> np.uint64(63)).astype(bool)
    mask = np.where(neg, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(1) << np.uint64(63))
    return u ^ mask


def _bucket_hist_partial(
    t: pa.Table, *, group_col: str, value_col: str
) -> pa.Table:
    """(group, bucket, count) runs of one batch — the coarse pass."""
    if t.num_rows == 0:
        return pa.table(
            {
                group_col: pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    g = t[group_col]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    v = t[value_col].to_numpy(zero_copy_only=False)
    b = (_float_order_key(v) >> np.uint64(64 - _BUCKET_BITS)).astype(np.int64)
    order = lexsort2(b, codes)
    c_s, b_s = codes[order], b[order]
    change = (np.diff(c_s) != 0) | (np.diff(b_s) != 0)
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    counts = np.diff(np.concatenate([starts, [c_s.shape[0]]]))
    return pa.table(
        {
            group_col: enc.dictionary.take(pa.array(c_s[starts])),
            "bucket": pa.array(b_s[starts]),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def grouped_quantiles_float(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
) -> pa.Table:
    """Exact grouped quantiles over a float64 column (``quantile_disc``
    semantics, same as :func:`grouped_quantiles`): one row per group
    with ``q_<pct>`` columns + ``n_rows``.

    Plan (two streaming passes, zero shuffles):
      1. coarse pass — per-block (group, bucket, count) partials over
         the top ``_BUCKET_BITS`` of the order-preserving float key;
         driver merges the (small) histogram and, per (group, q),
         locates the straddling bucket and the in-bucket rank,
      2. refine pass — re-scan gathering ONLY values whose (group,
         bucket) straddles some requested quantile; per straddling
         bucket a driver sort reads the answer off the rank. Answers
         are copied input values, so the result is bit-exact vs a SQL
         ``quantile_disc`` oracle.
    """
    proj = ds.select_columns([group_col, value_col])
    hist: dict[tuple, int] = {}
    for b in proj.map_batches(
        _bucket_hist_partial,
        fn_kwargs={"group_col": group_col, "value_col": value_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for g, bk, n in zip(
            b[group_col].to_pylist(), b["bucket"].to_pylist(), b["n"].to_pylist()
        ):
            hist[(g, bk)] = hist.get((g, bk), 0) + int(n)

    qcols = [f"q_{int(round(q * 100))}" for q in qs]
    groups = sorted({g for g, _ in hist})
    # per (group, q): straddling bucket + rank of the answer inside it
    need: dict[str, dict[int, list[tuple[float, int]]]] = {}
    n_rows: dict[str, int] = {}
    for g in groups:
        bks = sorted(bk for gg, bk in hist if gg == g)
        counts = np.array([hist[(g, bk)] for bk in bks], np.int64)
        cdf = np.cumsum(counts)
        n = int(cdf[-1])
        n_rows[g] = n
        for q in qs:
            target = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cdf, target))
            below = int(cdf[idx - 1]) if idx else 0
            need.setdefault(g, {}).setdefault(int(bks[idx]), []).append(
                (q, target - below)
            )

    # refine pass: gather only the straddling buckets' values
    need_buckets = {
        g: np.array(sorted(d.keys()), np.int64) for g, d in need.items()
    }

    def gather(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = (_float_order_key(v) >> np.uint64(64 - _BUCKET_BITS)).astype(
            np.int64
        )
        keep = np.zeros(t.num_rows, np.bool_)
        gcol = t[group_col]
        # loop only over the batch's DISTINCT groups (dictionary codes),
        # skipping groups with no straddling bucket — O(distinct), not
        # O(|needed groups| x batch)
        garr = gcol
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        enc = garr.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        for gi, g in enumerate(enc.dictionary.to_pylist()):
            bks = need_buckets.get(g)
            if bks is None:
                continue
            pos = np.searchsorted(bks, bkt)
            inb = (pos < bks.shape[0]) & (
                bks[np.minimum(pos, bks.shape[0] - 1)] == bkt
            )
            keep |= (codes == gi) & inb
        rows = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                group_col: gcol.take(rows),
                "bucket": pa.array(bkt[np.flatnonzero(keep)]),
                "value": pa.array(v[np.flatnonzero(keep)]),
            }
        )

    gathered: dict[tuple, list[np.ndarray]] = {}
    for b in proj.map_batches(
        gather, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        gl = b[group_col].to_pylist()
        bl = b["bucket"].to_numpy(zero_copy_only=False)
        vl = b["value"].to_numpy(zero_copy_only=False)
        gs = np.array(gl)
        for g in set(gl):
            gm = gs == g
            for bk in np.unique(bl[gm]):
                gathered.setdefault((g, int(bk)), []).append(
                    vl[gm & (bl == bk)]
                )

    cols: dict[str, list] = {group_col: [], **{c: [] for c in qcols}, "n_rows": []}
    for g in groups:
        cols[group_col].append(g)
        answers: dict[float, float] = {}
        for bk, wants in need[g].items():
            vals = np.sort(np.concatenate(gathered[(g, bk)]))
            for q, rank in wants:
                answers[q] = float(vals[rank - 1])
        for q, c in zip(qs, qcols):
            cols[c].append(answers[q])
        cols["n_rows"].append(n_rows[g])
    return pa.table(
        {
            group_col: pa.array(cols[group_col], pa.string()),
            **{c: pa.array(cols[c], pa.float64()) for c in qcols},
            "n_rows": pa.array(cols["n_rows"], pa.int64()),
        }
    )
