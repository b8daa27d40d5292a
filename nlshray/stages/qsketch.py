"""One-pass approximate quantiles: a KLL-style mergeable rank sketch.

The fourth sketch family next to Bloom (``stages/incremental``),
HyperLogLog (``functions/hll``) and CountMin (``stages/heavy``), and
the SCALE PATH next to the exact quantile operators: ``stages/
quantiles.grouped_quantiles_float`` is exact but needs TWO streaming
passes (histogram + targeted refine); the sketch answers any rank
query after ONE pass, shuffling only sketches (k·levels values per
block, independent of data size) — the right trade when the input is
a 100-TB intermediate that would have to be recomputed or checkpointed
to scan twice.

Design (Karnin-Lang-Liberty 2016, simplified: every compactor holds up
to ``k`` items; items at level ``h`` carry weight ``2^h``):

- **insert** — whole numpy arrays land in level 0; any level over
  capacity sorts and keeps alternate elements, pushing them up one
  level with doubled weight. The alternation offset is DERIVED
  (splitmix64 of seed ^ level ^ compaction counter), not sampled, so a
  sketch built from the same value sequence is bit-reproducible; KLL's
  error analysis assumes a random offset, and the derived offset is
  indistinguishable for that purpose while keeping runs replayable.
  Odd-sized buffers hold back their minimum (deterministic) so total
  weight is conserved EXACTLY — the sketch's weight always equals the
  number of inserted rows.
- **merge** — concatenate per-level buffers, re-run the same
  compaction. Associative up to the documented rank error; like every
  KLL implementation the exact output depends on merge order, so the
  tests gate on rank error (<= eps), not bit equality — this is the
  one operator family in the repo that is approximate BY CONTRACT
  (the exact operators stay the correctness reference).
- **query** — sort all (value, weight) pairs, cumulative weight,
  ``quantile_disc`` rule: smallest value with cumweight >=
  ceil(q * total). Answers are always REAL input values.

Error: with all-capacity-``k`` compactors the rank error is
O(levels / k); k=200 keeps observed error well under 1% at 10^5 rows
(gated in tests at 2% with k=128). Memory: k * log2(n/k) float64s per
sketch — ~10 KB at n=10^9, k=200.

Distribution: per-block partial sketches are emitted as (level, value)
rows — bounded by k·levels per block — and merged on the driver in
sorted-partial order (grouped variant: same rows keyed by group, the
driver merges per group). At 256 nodes this collect is a few MB; a
tree-merge via ``groupby(level-range)`` is the documented growth path
if block counts ever make the driver merge the bottleneck.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nlshray.hashing import splitmix64


class KLLSketch:
    """Mergeable rank sketch over float64 values."""

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._compactions = 0
        # exact extremes, tracked outside the compactors (compaction can
        # drop the global min/max — DataSketches KLL does the same)
        self._min = np.inf
        self._max = -np.inf

    # -- construction -------------------------------------------------
    def insert(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, buf in enumerate(other.levels):
            if buf.size:
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compact()
        return self

    def _offset(self, level: int) -> int:
        bits = splitmix64(
            np.array(
                [self.seed ^ (level << 32) ^ self._compactions], np.uint64
            )
        )[0]
        return int(bits & np.uint64(1))

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            buf = self.levels[h]
            if buf.size <= self.k:
                h += 1
                continue
            buf = np.sort(buf, kind="stable")
            if buf.size % 2:  # hold back the minimum: weight conserved
                keep_back, buf = buf[:1], buf[1:]
            else:
                keep_back = buf[:0]
            off = self._offset(h)
            self._compactions += 1
            promoted = buf[off::2]
            self.levels[h] = keep_back
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[h + 1] = np.concatenate(
                [self.levels[h + 1], promoted]
            )
            h += 1

    # -- queries ------------------------------------------------------
    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([b for b in self.levels]) if self.n else np.empty(0)
        wts = (
            np.concatenate(
                [
                    np.full(b.size, 1 << h, np.int64)
                    for h, b in enumerate(self.levels)
                ]
            )
            if self.n
            else np.empty(0, np.int64)
        )
        return vals, wts

    def quantiles(self, qs: list[float]) -> np.ndarray:
        """quantile_disc rule over the weighted items (the same
        ceil(q*n)-rank rule the exact operators use)."""
        vals, wts = self._items()
        if vals.size == 0:
            return np.full(len(qs), np.nan)
        order = np.argsort(vals, kind="stable")
        vals, cw = vals[order], np.cumsum(wts[order])
        total = int(cw[-1])
        out = np.empty(len(qs))
        for i, q in enumerate(qs):
            target = max(int(np.ceil(q * total)), 1)
            if target >= total:
                out[i] = self._max  # exact, tracked outside compaction
            elif target <= 1:
                out[i] = self._min
            else:
                out[i] = vals[np.searchsorted(cw, target)]
        return np.maximum(np.minimum(out, self._max), self._min)

    def rank(self, value: float) -> int:
        """Estimated number of inserted values <= value."""
        vals, wts = self._items()
        return int(wts[vals <= value].sum())

    # -- wire format --------------------------------------------------
    def to_rows(self) -> pa.Table:
        """Wire format: one row per retained item, plus sentinel rows
        level=-1 (exact min) and level=-2 (exact max)."""
        vals, _ = self._items()
        lv = (
            np.concatenate(
                [
                    np.full(b.size, h, np.int64)
                    for h, b in enumerate(self.levels)
                ]
            )
            if self.n
            else np.empty(0, np.int64)
        )
        if self.n:
            lv = np.concatenate([lv, [-1, -2]])
            vals = np.concatenate([vals, [self._min, self._max]])
        return pa.table(
            {
                "level": pa.array(lv, pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    @classmethod
    def from_rows(
        cls, level: np.ndarray, value: np.ndarray, k: int, seed: int
    ) -> "KLLSketch":
        """Rebuild-and-merge from concatenated wire rows of ANY number
        of sketches (sentinel extremes fold by min/max)."""
        sk = cls(k=k, seed=seed)
        if len(level) == 0:
            return sk
        level = np.asarray(level, np.int64)
        value = np.asarray(value, np.float64)
        mn, mx = value[level == -1], value[level == -2]
        items = level >= 0
        level, value = level[items], value[items]
        if len(level) == 0:
            return sk
        top = int(level.max())
        sk.levels = [
            np.asarray(value[level == h], np.float64)
            for h in range(top + 1)
        ]
        sk.n = int((np.int64(1) << level).sum())
        sk._min = float(mn.min()) if mn.size else float(value.min())
        sk._max = float(mx.max()) if mx.size else float(value.max())
        sk._compact()
        return sk


def sketch_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: list[float],
    k: int = 200,
    seed: int = 0,
) -> tuple[np.ndarray, int]:
    """One-pass approximate quantiles of a column: (values, n_rows).

    The only data that ever leaves a block is its partial sketch
    (<= k·levels rows). Partials are merged driver-side in sorted
    order (deterministic given the same block layout).
    """

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return KLLSketch(k=k, seed=seed).insert(v).to_rows()

    rows = ds.select_columns([value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    lv, vals = [], []
    for b in rows.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        lv.append(b["level"].to_numpy(zero_copy_only=False))
        vals.append(b["value"].to_numpy(zero_copy_only=False))
    level = np.concatenate(lv) if lv else np.empty(0, np.int64)
    value = np.concatenate(vals) if vals else np.empty(0, np.float64)
    # deterministic merge order regardless of block arrival
    order = np.lexsort((value, level))
    sk = KLLSketch.from_rows(level[order], value[order], k=k, seed=seed)
    return sk.quantiles(qs), sk.n


def grouped_sketch_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
    k: int = 200,
    seed: int = 0,
) -> pa.Table:
    """Grouped one-pass approximate quantiles: one row per group with
    ``q_<pct>`` columns + ``n_rows`` (same shape as the exact
    ``grouped_quantiles_float``, so the two are drop-in swappable)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        enc = t[group_col]
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = pc.dictionary_encode(enc)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        gs, ls, vs = [], [], []
        for gi, g in enumerate(enc.dictionary.to_pylist()):
            rows = KLLSketch(k=k, seed=seed).insert(v[idx == gi]).to_rows()
            gs.append(np.array([g] * rows.num_rows, dtype=object))
            ls.append(rows["level"].to_numpy(zero_copy_only=False))
            vs.append(rows["value"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                group_col: pa.array(
                    np.concatenate(gs) if gs else [], pa.string()
                ),
                "level": pa.array(
                    np.concatenate(ls) if ls else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "value": pa.array(
                    np.concatenate(vs) if vs else np.empty(0, np.float64),
                    pa.float64(),
                ),
            }
        )

    rows = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    by_group: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
    for b in rows.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        g = np.asarray(b[group_col].to_pylist(), object)
        lv = b["level"].to_numpy(zero_copy_only=False)
        vals = b["value"].to_numpy(zero_copy_only=False)
        for grp in np.unique(g):
            m = g == grp
            by_group.setdefault(str(grp), []).append((lv[m], vals[m]))
    out_g, out_n, out_q = [], [], []
    for grp in sorted(by_group):
        lv = np.concatenate([a for a, _ in by_group[grp]])
        vals = np.concatenate([b for _, b in by_group[grp]])
        order = np.lexsort((vals, lv))
        sk = KLLSketch.from_rows(lv[order], vals[order], k=k, seed=seed)
        out_g.append(grp)
        out_n.append(sk.n)
        out_q.append(sk.quantiles(qs))
    cols = {
        group_col: pa.array(out_g, pa.string()),
        "n_rows": pa.array(out_n, pa.int64()),
    }
    qarr = np.array(out_q) if out_q else np.empty((0, len(qs)))
    for j, q in enumerate(qs):
        cols[f"q_{int(round(q * 100))}"] = pa.array(qarr[:, j], pa.float64())
    return pa.table(cols)
