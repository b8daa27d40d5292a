"""JSON field extraction: fast path == json.loads ground truth."""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data as rd

from nlshray.stages.jsoncol import extract_json_batch, json_fields_stage

ROWS = [
    '{"k": 87}',
    '{"k": -3, "s": "hello", "b": true}',
    '{"s": "with \\"escaped\\" quotes", "k": 5}',
    '{"a": {"k": 99}, "k": 2}',
    '{"a": {"k": 15}}',
    '{"list": [1, 2], "b": false}',
    '{"k": null}',
    '{}',
    None,
    '{"f": 8.5e1, "k": 10, "s": "end"}',
    '{"kk": 7}',
    '{"s": "k", "k": 1}',
]

FIELDS = {"k": "int64", "s": "string", "b": "bool", "f": "float64"}


def _ground_truth(field):
    out = []
    for s in ROWS:
        try:
            obj = json.loads(s) if s is not None else {}
        except ValueError:
            obj = {}
        v = obj.get(field) if isinstance(obj, dict) else None
        out.append(v)
    return out


def test_extract_matches_json_loads():
    got = extract_json_batch(pa.array(ROWS, pa.string()), FIELDS)
    for name in FIELDS:
        assert got[name].to_pylist() == _ground_truth(name), name


def test_extract_all_rows_forced_flat():
    # Rows with neither escapes nor nesting take the vectorized path;
    # verify it alone (no fallback rows present) matches json.loads.
    flat = [r for r in ROWS if r is not None and "\\" not in r
            and r.count("{") == 1 and "[" not in r]
    got = extract_json_batch(pa.array(flat, pa.string()), {"k": "int64"})
    want = [json.loads(r).get("k") for r in flat]
    want = [v if isinstance(v, int) else None for v in want]
    assert got["k"].to_pylist() == want


def test_json_fields_stage(ray_session):
    t = pa.table(
        {"event_id": pa.array(range(len(ROWS)), pa.int64()),
         "props": pa.array(ROWS, pa.string())}
    )
    out = json_fields_stage(rd.from_arrow(t), "props", FIELDS)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow")
    ).sort_by("event_id")
    assert tbl.column_names == ["event_id", "k", "s", "b", "f"]
    assert tbl["k"].to_pylist() == _ground_truth("k")
    assert tbl["s"].to_pylist() == _ground_truth("s")


def test_strict_typing_and_duplicate_keys():
    """Both paths: last duplicate key wins (json.loads semantics);
    wrong-typed values null rather than truncate or crash."""
    rows = [
        '{"k": 1, "k": 2}',            # flat dup key -> last
        '{"a": {}, "k": 1, "k": 2}',   # fallback dup key -> last
        '{"k": 1.5}',                  # float under int64 -> null
        '{"a": {}, "k": 1.9}',         # fallback float under int64 -> null
        '{"k": 1e3}',                  # exponent under int64 -> null
        '{"a": {}, "k": true}',        # bool under int64 -> null
        '{"k": 7}',
    ]
    got = extract_json_batch(pa.array(rows, pa.string()), {"k": "int64"})
    assert got["k"].to_pylist() == [2, 2, None, None, None, None, 7]
    gotf = extract_json_batch(pa.array(rows, pa.string()), {"k": "float64"})
    assert gotf["k"].to_pylist() == [2.0, 2.0, 1.5, 1.9, 1000.0, None, 7.0]
