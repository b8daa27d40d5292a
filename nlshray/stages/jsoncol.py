"""Semi-structured field extraction from a JSON string column.

Web-scale corpora carry per-record metadata as JSON strings (crawl
headers, provenance tags, event properties — here ``events.props``).
This stage pulls typed scalar fields out of such a column without a
per-row Python loop:

- **Fast path** (vectorized): one RE2 pass per field via
  ``pyarrow.compute.extract_regex``. Sound only on *flat* records —
  no backslash escapes and no nested containers — because a quoted
  string value in valid JSON cannot contain an unescaped ``"``, so on
  an escape-free record the pattern ``"key"\\s*:`` can only match the
  real top-level key; a nested object/array could shadow it, so those
  rows are excluded too.
- **Fallback** (per row, rare): rows the fast path cannot prove
  correct — any ``\\`` anywhere, a second ``{`` or any ``[`` — are
  re-parsed with ``json.loads``. On clean machine-written metadata
  this path sees ~0 rows; it exists so the operator is *correct* on
  arbitrary JSON, not just fast on the common shape.

Reference parity: the reference operates on dense vectors only
(``/root/reference/nlsh/data.py``) and has no semi-structured
surface; this belongs to the webtext-pipeline extension set
(SURVEY.md §2.9 "ours").
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_TYPES = {
    "int64": pa.int64(),
    "float64": pa.float64(),
    "string": pa.string(),
    "bool": pa.bool_(),
}

_NUM_PAT = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def _field_pattern(key: str, typ: str) -> str:
    # "(?s).*" greedy prefix: duplicate keys resolve to the LAST
    # occurrence, matching json.loads (the fallback path's ground
    # truth) and DuckDB json_extract. RE2 is linear-time either way.
    k = re.escape(key)
    if typ in ("int64", "float64"):
        return rf'(?s).*"{k}"\s*:\s*(?P<v>{_NUM_PAT})'
    if typ == "bool":
        return rf'(?s).*"{k}"\s*:\s*(?P<v>true|false)'
    if typ == "string":
        return rf'(?s).*"{k}"\s*:\s*"(?P<v>[^"\\]*)"'
    raise ValueError(f"unsupported type {typ!r}; one of {sorted(_TYPES)}")


def _coerce(val, typ: str):
    """Python-side twin of the fast path's typing, for fallback rows.
    STRICT: a value whose JSON type doesn't match the request is null
    (never truncated/coerced) — identical to the fast path, where an
    int64 request nulls non-integer literals."""
    if val is None or isinstance(val, bool) and typ != "bool":
        return None
    if typ == "int64":
        return val if isinstance(val, int) else None
    if typ == "float64":
        return float(val) if isinstance(val, (int, float)) else None
    if typ == "bool":
        return val if isinstance(val, bool) else None
    return val if isinstance(val, str) else None


def extract_json_batch(
    arr: pa.Array, fields: dict[str, str]
) -> dict[str, pa.Array]:
    """Extract ``fields`` (name -> type in int64/float64/string/bool)
    from one Arrow string array of JSON records. Returns one typed
    array per field; missing keys / JSON nulls / type mismatches on
    the fallback path come back as Arrow nulls."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # Rows the vectorized pass is provably correct on: no escapes, no
    # nested containers (see module docstring for the argument).
    has_esc = pc.match_substring(arr, "\\")
    nested = pc.or_(
        pc.greater(pc.count_substring(arr, "{"), 1),
        pc.match_substring(arr, "["),
    )
    unsafe_arr = pc.fill_null(pc.or_(has_esc, nested), False)
    unsafe = unsafe_arr.to_numpy(zero_copy_only=False)
    fallback_idx = np.flatnonzero(unsafe)
    parsed: list = []
    if fallback_idx.size:
        raw = arr.take(pa.array(fallback_idx)).to_pylist()
        for s in raw:
            try:
                obj = json.loads(s) if s is not None else None
            except (ValueError, TypeError):
                obj = None
            parsed.append(obj if isinstance(obj, dict) else {})

    out: dict[str, pa.Array] = {}
    for name, typ in fields.items():
        hit = pc.extract_regex(arr, _field_pattern(name, typ))
        vals = pc.struct_field(hit, "v")
        if fallback_idx.size:
            # A shadow match on an unsafe row could fail the cast (e.g.
            # a nested "k": 1.5 under an int64 request) — null those
            # before casting; json.loads supplies their real values.
            vals = pc.if_else(unsafe_arr, pa.scalar(None, pa.string()), vals)
        if typ == "bool":
            col = pc.equal(vals, "true")
        elif typ == "int64":
            # the numeric pattern also matches float/exponent literals;
            # an int64 request nulls those instead of failing the cast
            is_int = pc.match_substring_regex(vals, r"^-?\d+$")
            vals = pc.if_else(
                pc.fill_null(is_int, False), vals, pa.scalar(None, pa.string())
            )
            col = vals.cast(_TYPES[typ])
        else:
            col = vals.cast(_TYPES[typ])
        if fallback_idx.size:
            repl = pa.array(
                [_coerce(obj.get(name), typ) for obj in parsed],
                type=_TYPES[typ],
            )
            col = pc.replace_with_mask(col, unsafe_arr, repl)
        out[name] = col
    return out


def json_fields_stage(
    ds: rd.Dataset,
    column: str,
    fields: dict[str, str],
    *,
    keep: list[str] | None = None,
) -> rd.Dataset:
    """Dataset stage: replace JSON ``column`` with typed columns for
    ``fields``, carrying ``keep`` (default: every other column)
    through unchanged. Pure map_batches — streams, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        carried = keep if keep is not None else [
            c for c in t.column_names if c != column
        ]
        cols = {c: t[c] for c in carried}
        cols.update(extract_json_batch(t[column], fields))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
