"""As-of (nearest-prior) join — a custom wide operator Ray Data lacks.

Semantics: for each left row, attach the single right row with the same
equality key and the greatest ``right_ts <= left_ts`` (ties on the
timestamp broken by the greater ``right_tie`` value, so the result is
total-order deterministic). Unmatched left rows are dropped (inner).

Ray-native plan — no driver-side work, one shuffle:
  1. both sides are projected to a shared schema (null-padded payload
     columns + a ``side`` tag) and ``union``-ed — a metadata-only op,
  2. one hash shuffle co-locates each key: ``groupby(on)``,
  3. ``map_groups`` sorts the group's right rows by (ts, tie) once and
     binary-searches every left row against it (vectorized
     ``np.searchsorted`` — no per-row Python).

Partitioning assumption (documented per the task contract): a single
equality key's rows must fit one worker — the same bound every
``groupby`` carries. Skewed keys are bounded by per-key activity
(events per user), not corpus size, so no salting tier is needed here.

The reference has no join engine (single-GPU tensors,
``/root/reference/nlsh/indexer.py`` gathers by integer index); this is
part of the beyond-reference training-data-pipeline surface (as-of join
is the canonical "enrich events with latest dimension state" op).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _null_padded(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in t.column_names:
            cols.append(t[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.table(dict(zip(schema.names, cols)))


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tie: str,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Inner as-of join; emits ``left_cols`` + ``right_cols`` of the
    matched right row. ``left_ts``/``right_ts`` must be the same
    comparable type (timestamp or numeric) on both sides."""
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    ltypes = {f.name: f.type for f in lschema}
    rtypes = {f.name: f.type for f in rschema}
    if right_tie not in right_cols:
        right_cols = right_cols + [right_tie]

    fields = [pa.field(on, ltypes[on]), pa.field("__ts", ltypes[left_ts]),
              pa.field("__side", pa.int8())]
    fields += [pa.field(c, ltypes[c]) for c in left_cols if c != on]
    fields += [pa.field(c, rtypes[c]) for c in right_cols if c != on]
    schema = pa.schema(fields)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__ts", t[left_ts].cast(ltypes[left_ts]))
        t = t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))
        return _null_padded(t, schema)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.append_column("__ts", t[right_ts].cast(ltypes[left_ts]))
        t = t.append_column("__side", pa.array(np.ones(t.num_rows, np.int8)))
        return _null_padded(t, schema)

    both = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_left = [c for c in left_cols if c != on]
    out_right = [c for c in right_cols if c != on]

    def match(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        ts = t["__ts"].to_numpy(zero_copy_only=False)
        lidx = np.flatnonzero(side == 0)
        ridx = np.flatnonzero(side == 1)
        if len(lidx) == 0 or len(ridx) == 0:
            return schema.empty_table().select([on] + out_left + out_right)
        tie = t[right_tie].take(pa.array(ridx)).to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts[ridx]))
        r_sorted = ridx[order]
        pos = np.searchsorted(ts[r_sorted], ts[lidx], side="right") - 1
        keep = pos >= 0
        l_keep = lidx[keep]
        r_match = r_sorted[pos[keep]]
        cols = {on: t[on].take(pa.array(l_keep))}
        for c in out_left:
            cols[c] = t[c].take(pa.array(l_keep))
        for c in out_right:
            cols[c] = t[c].take(pa.array(r_match))
        return pa.table(cols)

    return both.groupby(on, num_partitions=num_partitions).map_groups(
        match, batch_format="pyarrow"
    )


def range_self_join(
    ds: ray.data.Dataset,
    *,
    on: str,
    ts: str,
    id_col: str,
    window_seconds: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Range self-join: canonical (left_id < right_id) pairs of rows
    sharing ``on`` whose timestamps differ by at most ``window_seconds``
    (inclusive) — the banded/range-join member of the join family
    (broadcast equi-join, shuffle equi-join, as-of, range).

    Plan: one co-partitioning shuffle (``groupby(on)``), then per group a
    sort + two ``np.searchsorted`` passes find each row's window span;
    pairs are emitted vectorized with ``repeat``/``concatenate`` — no
    per-pair Python. Output size is the real join cardinality (bounded
    per key by activity-within-window, the same bound any range join
    carries); the emit itself is O(pairs).
    """
    delta = np.timedelta64(window_seconds, "s")

    def pairs(t: pa.Table) -> dict[str, np.ndarray]:
        tsv = t[ts].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tsv))
        tsv, ids = tsv[order], ids[order]
        n = len(ids)
        # for row i (as the window's earliest member): rows in
        # (i, hi_i) are within +window — emitting only forward spans
        # yields each unordered pair exactly once
        hi = np.searchsorted(tsv, tsv + delta, side="right")
        counts = hi - np.arange(n) - 1
        li = np.repeat(np.arange(n), counts)
        ri = np.concatenate(
            [np.arange(i + 1, h) for i, h in enumerate(hi)]
        ) if counts.sum() else np.empty(0, np.int64)
        a, b = ids[li], ids[ri]
        return {
            "left_id": np.minimum(a, b),
            "right_id": np.maximum(a, b),
        }

    return ds.groupby(on, num_partitions=num_partitions).map_groups(
        pairs, batch_format="pyarrow"
    )
