"""Content-defined chunking + chunk dedup (`nlshray/stages/cdc.py`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.cdc import (
    WINDOW,
    cdc_chunk_dedup,
    chunk_table,
    gear_table,
)

MIN, MAX, BITS = 128, 1024, 7


def ref_chunks(data: bytes, gear: np.ndarray) -> list[tuple[int, int]]:
    """Per-byte-loop reference: classic gear recurrence + the same cut
    rule, written independently of the vectorized kernel."""
    mask = (1 << BITS) - 1
    h = 0
    cand = []
    for i, b in enumerate(data):
        h = ((h << 1) + int(gear[b])) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0:
            cand.append(i + 1)
    chunks = []
    start, n = 0, len(data)
    while start < n:
        if n - start <= MIN:
            e = n
        else:
            lo, hi = start + MIN, start + MAX
            nxt = [c for c in cand if c >= lo and c <= min(hi, n)]
            if nxt:
                e = nxt[0]
            elif n - start <= MAX:
                e = n
            else:
                e = hi
        chunks.append((start, e - start))
        start = e
    return chunks


def _texts():
    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"abcdefgh ", np.uint8)
    texts = []
    for n in [0, 50, MIN - 1, MIN, 300, 1000, 2500, 5000]:
        texts.append(bytes(rng.choice(alpha, n)).decode())
    return texts


def test_chunk_table_matches_reference():
    texts = _texts()
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    got = chunk_table(t, MIN, MAX, BITS).to_pandas()
    gear = gear_table()
    for d, text in enumerate(texts):
        want = ref_chunks(text.encode(), gear)
        rows = got[got["doc_id"] == d].sort_values("chunk_idx")
        assert list(zip(rows["start"], rows["length"])) == want, d
        # tiling invariant
        assert rows["length"].sum() == len(text.encode())


def test_chunk_boundaries_shift_resistant():
    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"abcdefghijklmnop qrstuvw", np.uint8)
    base = bytes(rng.choice(alpha, 8000)).decode()
    shifted = "Z" + base  # one-byte insertion at the head
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": [base, shifted]})
    df = chunk_table(t, MIN, MAX, BITS).to_pandas()
    h0 = set(df.loc[df["doc_id"] == 0, "chunk_hash"])
    h1 = set(df.loc[df["doc_id"] == 1, "chunk_hash"])
    # only the head chunk(s) may differ — CDC's raison d'etre
    assert len(h0 & h1) / len(h0) > 0.7


def test_cdc_chunk_dedup_rollup(ray_session):
    rng = np.random.default_rng(13)
    alpha = np.frombuffer(b"abcdefghijklmnop qrstuvw", np.uint8)
    shared = bytes(rng.choice(alpha, 3000)).decode()
    uniq = [bytes(rng.choice(alpha, 3000)).decode() for _ in range(4)]
    texts = [uniq[0] + shared, shared + uniq[1], uniq[2], uniq[3]]
    t = pa.table(
        {"doc_id": pa.array(range(4), pa.int64()), "text": texts}
    )
    outs = []
    for parts in (1, 3):
        df = (
            cdc_chunk_dedup(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert (df.loc[df["doc_id"] <= 1, "n_dup_chunks"] >= 1).all()
    assert (df.loc[df["doc_id"] >= 2, "n_dup_chunks"] == 0).all()
    assert (df["dup_bytes"] <= df["n_bytes"]).all()


def test_cdc_query_smoke(ray_session):
    from nlshray.pipelines.queries import QUERIES

    df = QUERIES["cdc_chunk_dedup"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert (df["n_bytes"] > 0).all()
    assert (df["n_dup_chunks"] <= df["n_chunks"]).all()
    # fixture corpus contains near-dup docs -> some shared chunks
    assert df["n_dup_chunks"].sum() > 0
