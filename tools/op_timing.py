"""Per-operator wall timing for the round-4 LLM-pipeline ops over the
50k-page bench fixture (32 cpus). One JSON line per op on stdout.

Usage: python tools/op_timing.py [num_cpus] [op ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else None
    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from bench import _ensure_fixture

    path = _ensure_fixture()

    def load_docs() -> rd.Dataset:
        """50k bench pages -> (doc_id, text, source) docs table; source
        is a deterministic 10%-reference provenance split for the NB op."""

        def add_cols(t: pa.Table) -> pa.Table:
            from nlshray.hashing import hash_utf8_array

            h = hash_utf8_array(t["url"])
            doc_id = h.view(np.int64)
            src = np.where(h % np.uint64(10) == 0, "reference", "crawl")
            return pa.table(
                {
                    "doc_id": pa.array(doc_id, pa.int64()),
                    "text": t["text"],
                    "source": pa.array(src, pa.string()),
                }
            )

        return rd.read_parquet(path, columns=["url", "text"]).map_batches(
            add_cols, batch_format="pyarrow", zero_copy_batch=True
        )

    nparts = max(8, min(64, (ncpu * 3) // 2))

    def t_nb() -> int:
        from nlshray.stages.classifier import nb_quality_scores

        return nb_quality_scores(load_docs(), ("reference",), nparts=nparts).count()

    def t_cdc() -> int:
        from nlshray.stages.cdc import cdc_chunk_dedup

        return cdc_chunk_dedup(load_docs(), nparts=nparts).count()

    def t_bpe() -> int:
        from nlshray.stages.bpe import BpeEncoder, fit_bpe_from_dataset

        docs = load_docs()
        merges = fit_bpe_from_dataset(
            docs, num_merges=500, min_count=5, nparts=nparts
        )
        ref = ray.put(merges)
        enc = docs.map_batches(
            BpeEncoder,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, max(2, ncpu // 4)),
        )
        return enc.count()

    def t_exsub() -> int:
        from nlshray.stages.decontam import exact_substring_dedup

        return exact_substring_dedup(
            load_docs(), k=16, num_partitions=nparts
        ).count()

    def t_linededup() -> int:
        from nlshray.stages.linededup import line_dedup

        return line_dedup(load_docs(), num_partitions=nparts).count()

    def t_tfidf() -> int:
        from nlshray.stages.tfidf import tfidf_topk

        return tfidf_topk(load_docs(), k=5, num_partitions=nparts).count()

    def t_dupspans() -> int:
        from nlshray.stages.decontam import duplicate_span_stats

        return duplicate_span_stats(
            load_docs(), k=8, num_partitions=nparts
        ).count()

    ops = {
        "nb_quality_scores": t_nb,
        "cdc_chunk_dedup": t_cdc,
        "bpe_fit_encode": t_bpe,
        "exact_substring_dedup": t_exsub,
        "line_dedup": t_linededup,
        "tfidf_topk": t_tfidf,
        "duplicate_span_stats": t_dupspans,
    }
    # warm page cache
    rd.read_parquet(path).count()
    results = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        n = fn()
        sec = round(time.perf_counter() - t0, 3)
        results[name] = sec
        print(json.dumps({"op": name, "sec": sec, "rows": n, "num_cpus": ncpu}))
    print(json.dumps({"all": results, "n_pages": 50000, "num_cpus": ncpu}))
    ray.shutdown()


if __name__ == "__main__":
    main()
