"""Source-format parity: JSONL / CSV reads feed the engine identically
to parquet (the wire format must never change results)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from nlshray.sources.pages import (
    read_docs_csv,
    read_docs_json,
    read_pages_json,
    write_jsonl,
)


def _docs_table(n=40):
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(n)]
    texts[5] = texts[0]  # an exact dup to exercise downstream
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def _sorted_rows(ds, cols):
    t = pa.concat_tables(ray.get(ds.to_arrow_refs())).select(cols)
    return sorted(map(tuple, t.to_pydict().values() and zip(*[t[c].to_pylist() for c in cols])))


def test_jsonl_csv_parquet_parity(ray_session, tmp_path):
    tbl = _docs_table()
    pq_path = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, pq_path)
    jl_path = str(tmp_path / "docs.jsonl")
    with open(jl_path, "w") as f:
        for row in tbl.to_pylist():
            f.write(json.dumps(row) + "\n")
    csv_path = str(tmp_path / "docs.csv")
    import pyarrow.csv as pacsv

    pacsv.write_csv(tbl, csv_path)

    cols = ["doc_id", "text", "n_chars"]
    want = _sorted_rows(rd.read_parquet(pq_path, columns=cols), cols)
    got_j = _sorted_rows(read_docs_json(jl_path, columns=cols), cols)
    got_c = _sorted_rows(read_docs_csv(csv_path, columns=cols), cols)
    assert got_j == want
    assert got_c == want

    # schema types normalized to the engine's canonical ones
    sj = read_docs_json(jl_path, columns=cols).schema()
    assert dict(zip(sj.names, sj.types))["doc_id"] == pa.int64()


def test_jsonl_feeds_dedup_identically(ray_session, tmp_path):
    from nlshray.config import DedupConfig
    from nlshray.pipelines.dedup import dedup_docs, to_arrow

    tbl = _docs_table()
    jl_path = str(tmp_path / "docs.jsonl")
    with open(jl_path, "w") as f:
        for row in tbl.to_pylist():
            f.write(json.dumps(row) + "\n")
    cfg = DedupConfig()
    res_pq = dedup_docs(rd.from_arrow(tbl), cfg, num_partitions=4)
    res_jl = dedup_docs(
        read_docs_json(jl_path, columns=["doc_id", "text", "n_chars"]),
        cfg,
        num_partitions=4,
    )
    key = lambda t: sorted(
        zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist())
    )
    assert key(to_arrow(res_jl.clusters)) == key(to_arrow(res_pq.clusters))


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    tbl = _docs_table(12)
    out = str(tmp_path / "sink")
    os.makedirs(out, exist_ok=True)
    write_jsonl(rd.from_arrow(tbl), out)
    back = read_docs_json(
        [os.path.join(out, f) for f in sorted(os.listdir(out))],
        columns=["doc_id", "text", "n_chars"],
    )
    cols = ["doc_id", "text", "n_chars"]
    assert _sorted_rows(back, cols) == _sorted_rows(rd.from_arrow(tbl), cols)


def test_pages_jsonl_extracts(ray_session, tmp_path):
    from nlshray.fixtures import generate_pages
    from nlshray.stages.extract import extract_stage

    pages = generate_pages(60, seed=9)
    jl = str(tmp_path / "pages.jsonl")
    with open(jl, "w") as f:
        for row in pages.select(["url", "warc_ts", "html", "lang"]).to_pylist():
            # wire encoding: warc_ts as epoch micros, html as utf-8 text
            row["warc_ts"] = int(row["warc_ts"].timestamp() * 1_000_000)
            row["html"] = row["html"].decode("utf-8")
            f.write(json.dumps(row) + "\n")
    docs = extract_stage(read_pages_json(jl))
    got = pa.concat_tables(ray.get(docs.to_arrow_refs()))
    assert got.num_rows == 60
    assert "text" in got.column_names


def test_write_partitioned_hive_layout(ray_session, tmp_path):
    from nlshray.sources.pages import write_partitioned

    t = _docs_table(30)
    langs = ["en", "de", "fr"] * 10
    t = t.append_column("lang", pa.array(langs, pa.string()))
    out = str(tmp_path / "part")
    write_partitioned(
        rd.from_arrow(t), out, partition_by=["lang"], min_rows_per_file=5
    )
    # hive key directories exist
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=de", "lang=en", "lang=fr"]
    # a single-key read prunes at the directory level and returns
    # exactly that partition's rows
    one = pa.concat_tables(
        ray.get(rd.read_parquet(f"{out}/lang=en").to_arrow_refs())
    )
    assert sorted(one["doc_id"].to_pylist()) == list(range(0, 30, 3))
    # full roundtrip preserves every row
    back = _sorted_rows(
        rd.read_parquet(out), ["doc_id", "text", "n_chars"]
    )
    want = _sorted_rows(rd.from_arrow(t), ["doc_id", "text", "n_chars"])
    assert back == want


def _pages_rows(n=60):
    from nlshray.fixtures import generate_pages

    t = generate_pages(n, seed=5)
    return t, [
        (
            t["url"][i].as_py(),
            t["warc_ts"][i].as_py(),
            t["html"][i].as_py(),
            t["lang"][i].as_py(),
        )
        for i in range(t.num_rows)
    ]


def test_warc_roundtrip_plain_and_gzip(ray_session, tmp_path):
    """encode -> read round trip, both containers: url/ts/html/lang
    byte-identical in row order (one read task per file preserves it)."""
    from nlshray.sources.warc import encode_warc, read_warc

    t, rows = _pages_rows(60)
    plain = tmp_path / "a.warc"
    gz = tmp_path / "b.warc.gz"
    plain.write_bytes(encode_warc(rows))
    gz.write_bytes(encode_warc(rows, per_record_gzip=True))
    for path in (plain, gz):
        got = pa.concat_tables(
            ray.get(read_warc(str(path), rows_per_block=17).to_arrow_refs())
        )
        assert got["url"].to_pylist() == t["url"].to_pylist()
        assert got["html"].to_pylist() == t["html"].to_pylist()
        assert got["warc_ts"].to_pylist() == t["warc_ts"].to_pylist()
        assert got["lang"].to_pylist() == t["lang"].to_pylist()


def test_warc_skips_non_response_records(tmp_path):
    """request/warcinfo records interleaved with responses are dropped
    by the reader (the Common Crawl layout)."""
    import io
    from datetime import datetime

    from nlshray.sources.warc import encode_warc, iter_warc_records

    resp = encode_warc([("http://x/1", datetime(2026, 1, 1), b"<p>hi", "en")])
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    blob = info + resp + info
    recs = list(iter_warc_records(io.BufferedReader(io.BytesIO(blob))))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response", "warcinfo"]
    # and through the datasource only the response row comes out
    from nlshray.sources.warc import read_warc

    p = tmp_path / "mix.warc"
    p.write_bytes(blob)
    got = read_warc(str(p)).take_all()
    assert len(got) == 1 and got[0]["url"] == "http://x/1"
    assert got[0]["html"] == b"<p>hi"


def test_warc_feeds_extraction_identically(ray_session, tmp_path):
    """The byte-identical extraction invariant holds across the wire
    format: extract(warc-read pages) == extract(in-memory pages)."""
    from nlshray.sources.warc import encode_warc, read_warc
    from nlshray.stages.extract import extract_stage

    t, rows = _pages_rows(80)
    p = tmp_path / "c.warc.gz"
    p.write_bytes(encode_warc(rows, per_record_gzip=True))
    via_warc = _sorted_rows(
        extract_stage(read_warc(str(p)).repartition(4)), ["url", "text"]
    )
    direct = _sorted_rows(
        extract_stage(
            rd.from_arrow(t.select(["url", "warc_ts", "html", "lang"]))
        ),
        ["url", "text"],
    )
    assert via_warc == direct
