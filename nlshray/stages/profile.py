"""One-pass table profiler: per-column stats for pipeline sanity checks.

The "what am I even looking at" operator every engine ships (DuckDB's
``SUMMARIZE``, Spark's ``describe``): row count, null count, min, max
and sum per numeric/timestamp column, computed in ONE streaming pass —
each block emits a tiny per-column partial (4 scalars per column), the
driver folds them. Nothing wide: the combine is O(blocks × columns).

Timestamps profile as int64 epoch-microseconds (the repo's canonical
hash-exact timestamp representation, see ``stages/window.py``); sums
are fixed-point-quantized BEFORE summation (floor to 1e-4, summed in
int64) so the reported total is order-independent and bit-replayable
in SQL — the same trick ``events_running_totals`` uses. Min/max are
copied input values, exact by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


_QUANT = 10_000  # fixed-point sum quantum (1e-4)


def profile_table(
    ds: ray.data.Dataset, columns: list[str]
) -> pa.Table:
    """One row per column: (column, n_rows, n_nulls, min_v, max_v,
    sum_q) — min/max as float64, sum as int64 fixed-point (value
    floored to 1e-4). Timestamp columns are profiled in
    epoch-microseconds."""

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            nulls = arr.null_count
            nn = arr.drop_null()
            is_ts = pa.types.is_timestamp(nn.type)
            is_float = pa.types.is_floating(nn.type)
            if is_ts:
                nn = nn.cast(pa.int64())
            vf = nn.to_numpy(zero_copy_only=False).astype(np.float64)
            vf = vf[~np.isnan(vf)]  # NaN payloads count as missing too
            if vf.size:
                mn, mx = float(vf.min()), float(vf.max())
                if is_ts:
                    # a timestamp TOTAL is meaningless and epoch_us sums
                    # overflow int64 — reported as 0 (oracle matches)
                    sq = 0
                elif is_float:
                    sq = int(np.floor(vf * _QUANT).astype(np.int64).sum())
                else:  # exact integer column: sum raw values
                    sq = int(vf.astype(np.int64).sum())
            else:
                mn, mx, sq = np.inf, -np.inf, 0
            rows.append((c, n, nulls, mn, mx, sq))
        return pa.table(
            {
                "column": pa.array([r[0] for r in rows], pa.string()),
                "n_rows": pa.array([r[1] for r in rows], pa.int64()),
                "n_nulls": pa.array([r[2] for r in rows], pa.int64()),
                "min_v": pa.array([r[3] for r in rows], pa.float64()),
                "max_v": pa.array([r[4] for r in rows], pa.float64()),
                "sum_q": pa.array([r[5] for r in rows], pa.int64()),
            }
        )

    acc: dict[str, list] = {}
    for b in ds.select_columns(columns).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for r in b.to_pylist():
            a = acc.setdefault(
                r["column"], [0, 0, np.inf, -np.inf, 0]
            )
            a[0] += r["n_rows"]
            a[1] += r["n_nulls"]
            a[2] = min(a[2], r["min_v"])
            a[3] = max(a[3], r["max_v"])
            a[4] += r["sum_q"]
    out = [(c, *acc[c]) for c in columns if c in acc]
    return pa.table(
        {
            "column": pa.array([r[0] for r in out], pa.string()),
            "n_rows": pa.array([r[1] for r in out], pa.int64()),
            "n_nulls": pa.array([r[2] for r in out], pa.int64()),
            "min_v": pa.array([r[3] for r in out], pa.float64()),
            "max_v": pa.array([r[4] for r in out], pa.float64()),
            "sum_q": pa.array([r[5] for r in out], pa.int64()),
        }
    )
