"""Two-round hash exchange utility (`nlshray/stages/exchange.py`)."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray
import ray.data as rd

from nlshray.stages.exchange import (
    grouped_sum_merge,
    hash_exchange,
    utf8_key_hash,
)


def _make_vc_partial():
    # nested so cloudpickle ships it by value (test modules are not
    # importable inside Ray workers)
    def vc_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t["w"].combine_chunks())
        return pa.table(
            {"w": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    return vc_partial


def _run(words: list[str], nparts: int, blocks: int) -> dict[str, int]:
    ds = rd.from_arrow(pa.table({"w": pa.array(words, pa.string())}))
    refs = ds.repartition(blocks).to_arrow_refs()
    out = hash_exchange(
        refs,
        _make_vc_partial(),
        utf8_key_hash("w"),
        grouped_sum_merge("w", ["n"]),
        nparts,
    )
    merged = pa.concat_tables(ray.get(out))
    return dict(zip(merged["w"].to_pylist(), merged["n"].to_pylist()))


def test_exchange_exact_counts(ray_session):
    words = [f"tok{i % 37}" for i in range(5000)] + ["rare", "rare"]
    assert _run(words, nparts=7, blocks=5) == dict(Counter(words))


def test_exchange_parallelism_independent(ray_session):
    words = [f"w{i % 101}" for i in range(3000)]
    truth = dict(Counter(words))
    assert _run(words, nparts=1, blocks=1) == truth
    assert _run(words, nparts=13, blocks=9) == truth


def test_exchange_key_disjointness(ray_session):
    # each key must land in exactly ONE merged shard (global counts)
    words = [f"k{i % 50}" for i in range(2000)]
    ds = rd.from_arrow(pa.table({"w": pa.array(words, pa.string())}))
    refs = ds.repartition(6).to_arrow_refs()
    out = hash_exchange(
        refs,
        _make_vc_partial(),
        utf8_key_hash("w"),
        grouped_sum_merge("w", ["n"]),
        5,
    )
    seen: set[str] = set()
    for t in ray.get(out):
        ks = set(t["w"].to_pylist())
        assert not (ks & seen)
        seen |= ks
    assert len(seen) == 50


def test_exchange_empty_blocks(ray_session):
    ds = rd.from_arrow(pa.table({"w": pa.array([], pa.string())}))
    refs = ds.to_arrow_refs()
    out = hash_exchange(
        refs,
        _make_vc_partial(),
        utf8_key_hash("w"),
        grouped_sum_merge("w", ["n"]),
        4,
    )
    assert sum(len(t) for t in ray.get(out)) == 0
