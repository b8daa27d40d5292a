"""Sliding (RANGE) window aggregate — per-row trailing-window stats.

For each row, statistics over all rows of the same key whose timestamp
falls in ``[ts - window, ts]`` (both ends inclusive — ANSI ``RANGE
BETWEEN <window> PRECEDING AND CURRENT ROW`` frame semantics, including
same-timestamp peers).

Ray-native plan: one hash shuffle (``groupby(key)``), then a
``map_groups`` kernel that sorts the group once and derives every frame
with two vectorized ``np.searchsorted`` passes. COUNT is exact integer
arithmetic; MAX is a copied value — both bit-reproducible against a SQL
window oracle (a SUM of doubles would not be: summation-order error,
see BASELINE.md parity notes — so the stage deliberately emits
order-independent aggregates only).

The max kernel is the classic monotone-deque sliding max: O(n) per
group total (each row enters/leaves the deque once), not O(n·w); frame
bounds are non-decreasing after the sort, which is what the deque
requires. Partitioning assumption: one key's rows fit one worker.

Completes §2.9 (streaming-shaped, ours): tumbling (`events_hourly`),
session (`events_sessionize`), and now sliding windows.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa

import ray.data


def sliding_window(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    window_seconds: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-row trailing-window (count, max) over ``value``; emits
    (id_col, cnt, max_value) rows, one per input row."""
    delta = np.timedelta64(window_seconds, "s")

    def frames(t: pa.Table) -> dict[str, np.ndarray]:
        tsv = t[ts].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vals = t[value].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tsv))
        tsv, ids, vals = tsv[order], ids[order], vals[order]
        lo = np.searchsorted(tsv, tsv - delta, side="left")
        hi = np.searchsorted(tsv, tsv, side="right")
        mx = np.empty(len(vals), np.float64)
        dq: deque[int] = deque()
        j = 0
        for i in range(len(vals)):
            while j < hi[i]:
                while dq and vals[dq[-1]] <= vals[j]:
                    dq.pop()
                dq.append(j)
                j += 1
            while dq[0] < lo[i]:
                dq.popleft()
            mx[i] = vals[dq[0]]
        return {id_col: ids, "cnt": (hi - lo).astype(np.int64), "max_value": mx}

    return ds.groupby(key, num_partitions=num_partitions).map_groups(
        frames, batch_format="pyarrow"
    )


def session_window(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    gap_seconds: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Gap-based session windows per key — one output row per session:
    ``(key, session_start, n_events, sum_value)`` where a new session
    starts when the gap to the previous event exceeds ``gap_seconds``.

    Fully segmented numpy (VERDICT r3 #4 — no pandas anywhere): one hash
    shuffle co-locates each key, then the kernel stable-sorts the
    group's timestamps once and derives session boundaries with a
    single vectorized diff; per-session count/sum/min fall out of
    ``np.add.reduceat`` over the boundary starts. ``session_start`` is
    emitted as int64 microseconds (EPOCH_US) and ``sum_value`` rounded
    to 4 places — both order-robust, hash-exact vs the SQL oracle.

    Partitioning assumption: one key's rows fit one worker (same bound
    as every groupby; session state is per-key so no salting tier)."""
    gap_us = np.int64(gap_seconds) * 1_000_000

    def sessions(t: pa.Table) -> pa.Table:
        tsv = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        us = tsv.view(np.int64)
        vals = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(us, kind="stable")
        us, vals = us[order], vals[order]
        new = np.empty(us.shape[0], np.bool_)
        new[0] = True
        np.greater(us[1:] - us[:-1], gap_us, out=new[1:])
        starts = np.flatnonzero(new)
        n = np.diff(np.concatenate([starts, [us.shape[0]]]))
        sum_v = np.add.reduceat(vals, starts)
        return pa.table(
            {
                key: t[key].take(
                    pa.array(np.zeros(starts.shape[0], np.int64))
                ),
                "session_start": pa.array(us[starts]),
                "n_events": pa.array(n.astype(np.int64)),
                "sum_value": pa.array(np.round(sum_v, 4)),
            }
        )

    return ds.groupby(key, num_partitions=num_partitions).map_groups(
        sessions, batch_format="pyarrow"
    )


def running_totals(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    scale: int = 10_000,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-key running totals — the cumulative (ROWS UNBOUNDED
    PRECEDING) window: for each row, the count and sum of all same-key
    rows at or before it in ``(ts, id_col)`` order.

    Hash-exact against a SQL window oracle by construction: the float
    ``value`` is floor-quantized to fixed point (``floor(v * scale)`` —
    FLOOR is exact on the shared float64 product, unlike ROUND whose
    half-rule differs between numpy and SQL engines) and the running sum
    accumulates in int64, so summation order cannot perturb bits.

    One hash shuffle on ``key``, then a segmented kernel: lexsort the
    group once, ``np.cumsum`` the quantized values, emit
    ``(id_col, running_n, running_sum_c)`` — one output row per input
    row. Partitioning assumption: one key's rows fit one worker."""
    scale_f = float(scale)

    def cum(t: pa.Table) -> dict[str, np.ndarray]:
        us = (
            t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        v_c = np.floor(
            t[value].to_numpy(zero_copy_only=False) * scale_f
        ).astype(np.int64)
        order = np.lexsort((ids, us))
        n = us.shape[0]
        return {
            id_col: ids[order],
            "running_n": np.arange(1, n + 1, dtype=np.int64),
            "running_sum_c": np.cumsum(v_c[order]),
        }

    return ds.groupby(key, num_partitions=num_partitions).map_groups(
        cum, batch_format="pyarrow"
    )


def debounce(
    ds: ray.data.Dataset,
    *,
    keys: list[str],
    ts: str,
    id_col: str,
    min_gap_seconds: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Event debounce: within each key group, keep a row only if the
    PREVIOUS row (by ``(ts, id_col)`` order) is more than
    ``min_gap_seconds`` older — the rapid-repeat collapse applied to
    crawl-snapshot streams and telemetry (LAG semantics: the comparison
    is against the previous RAW event, so the rule is a pure window
    function and SQL-replayable; comparing against the previous KEPT
    event would be an iterative chain).

    One hash shuffle on the keys, then a segmented kernel: lexsort the
    group once, one vectorized diff, one take. Output rows are the
    surviving originals with ``ts`` re-emitted as int64 microseconds
    (``ts_us``) for hash-exact comparison.

    Partitioning assumption: one key group's rows fit one worker.
    """
    gap_us = np.int64(min_gap_seconds) * 1_000_000

    def keep(t: pa.Table) -> pa.Table:
        us = (
            t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us))
        us_sorted = us[order]
        kept = np.empty(us_sorted.shape[0], np.bool_)
        kept[0] = True
        np.greater(us_sorted[1:] - us_sorted[:-1], gap_us, out=kept[1:])
        picked = t.take(pa.array(order[kept]))
        out = picked.drop_columns([ts])
        return out.append_column("ts_us", pa.array(us_sorted[kept]))

    return ds.groupby(keys, num_partitions=num_partitions).map_groups(
        keep, batch_format="pyarrow"
    )


def funnel(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    type_col: str,
    steps: list[str],
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Ordered funnel per key: the classic product-analytics question
    "which users did step1, THEN step2, THEN step3?". For each key,
    take the FIRST occurrence of ``steps[0]``, then the first
    ``steps[1]`` STRICTLY after it, and so on; emit one row per key
    that completes every step: ``(key, t_0 .. t_{k-1})`` as int64
    microseconds.

    Greedy-earliest is correct for existence: if any valid ordered
    assignment exists, the greedy one does (exchange argument — taking
    the earliest possible step can only leave more room for later
    steps). One hash shuffle co-locates each key; the kernel is one
    stable sort plus one vectorized min-scan per step (k scans of the
    group, k = len(steps), never a Python row loop). Strictly-after
    (``>``) on both engines makes equal-timestamp chains ineligible,
    so the SQL replay (nested MIN-over-filtered-join) is exact.

    Partitioning assumption: one key group's rows fit one worker.
    """
    if len(steps) < 1:
        raise ValueError("need at least one funnel step")

    def kern(t: pa.Table) -> pa.Table:
        us = (
            t[ts]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        et = t[type_col].to_numpy(zero_copy_only=False)
        times = []
        t_prev = np.int64(np.iinfo(np.int64).min)
        for step in steps:
            m = (et == step) & (us > t_prev)
            if not m.any():
                return pa.table(
                    {
                        key: t[key].slice(0, 0),
                        **{
                            f"t_{i}": pa.array([], pa.int64())
                            for i in range(len(steps))
                        },
                    }
                )
            t_prev = us[m].min()
            times.append(t_prev)
        return pa.table(
            {
                key: t[key].slice(0, 1),
                **{
                    f"t_{i}": pa.array([v], pa.int64())
                    for i, v in enumerate(times)
                },
            }
        )

    return ds.groupby(key, num_partitions=num_partitions).map_groups(
        kern, batch_format="pyarrow"
    )


def rolling_anomaly(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    window: int = 20,
    min_n: int = 5,
    k: int = 3,
    scale: int = 10_000,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-key rolling z-score outlier flags — the streaming anomaly
    detector of the window family: each row is tested against the mean
    and variance of its key's PRECEDING ``window`` rows (ROWS BETWEEN
    ``window`` PRECEDING AND 1 PRECEDING in ``(ts, id_col)`` order).

    Entirely integer, hence hash-exact against a SQL window oracle:
    values floor-quantize to fixed point (the ``running_totals``
    device) and the z-test rearranges to avoid division —
    ``z^2 > k^2  <=>  (n*v - sum)^2 > k^2 * (n*sumsq - sum^2)`` —
    so no float is ever computed. Rows with fewer than ``min_n``
    predecessors are never flagged (cold-start guard).

    One hash shuffle on ``key``, then a segmented kernel: lexsort the
    group once, two cumsums, vectorized window-edge subtraction.
    Partitioning assumption: one key's rows fit one worker. Int64
    bounds (vq := |value| * scale): the z-test RHS ``k^2 * (n_prev*s2
    - s*s)`` needs ``k^2 * window^2 * vq^2 < 2^63``, i.e. vq <
    sqrt(2^63)/(k*window) (~5.1e7 at the k=3, window=20 defaults);
    the LHS needs vq < sqrt(2^63)/(2*window) and the whole-group
    sum-of-squares cumsum needs ``n_group * vq^2 < 2^63``. A runtime
    guard raises instead of silently wrapping — events-scale values
    are far inside all three.
    """
    scale_f = float(scale)
    k2 = np.int64(k * k)
    _SQRT_I64 = 3_037_000_499  # isqrt(2^63 - 1)
    vq_limit = _SQRT_I64 // (max(int(k), 2) * int(window))

    def fn(t: pa.Table) -> dict[str, np.ndarray]:
        us = (
            t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vq = np.floor(
            t[value].to_numpy(zero_copy_only=False) * scale_f
        ).astype(np.int64)
        order = np.lexsort((ids, us))
        v = vq[order]
        n = v.shape[0]
        if n:
            vmax = int(np.abs(v).max())
            if vmax > vq_limit or vmax * vmax * n >= 2**63:
                raise ValueError(
                    f"rolling_anomaly int64 overflow: max |value*scale| "
                    f"{vmax} exceeds the safe bound "
                    f"{min(vq_limit, int((2**63 // max(n, 1)) ** 0.5))} "
                    f"for k={k}, window={window}, group size {n}; "
                    f"reduce `scale` or pre-clip the value column"
                )
        cum = np.concatenate([[0], np.cumsum(v)])
        cum2 = np.concatenate([[0], np.cumsum(v * v)])
        i = np.arange(n, dtype=np.int64)
        lo = np.maximum(i - window, 0)
        n_prev = i - lo
        s = cum[i] - cum[lo]
        s2 = cum2[i] - cum2[lo]
        a = n_prev * v - s
        flag = (n_prev >= min_n) & (a * a > k2 * (n_prev * s2 - s * s))
        return {
            id_col: ids[order],
            "n_prev": n_prev,
            "sum_prev_q": s,
            "sumsq_prev_q": s2,
            "is_anomaly": flag.astype(np.int64),
        }

    return ds.groupby(key, num_partitions=num_partitions).map_groups(
        fn, batch_format="pyarrow"
    )
