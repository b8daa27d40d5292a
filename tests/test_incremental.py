"""Incremental (new-vs-seen) exact dedup — broadcast and bloom plans."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.incremental import (
    _bloom_params,
    _bloom_set,
    _bloom_test,
    _pair_membership,
    _unique_pairs,
    novel_docs,
)


def _docs(texts, start_id=0):
    return pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _sorted_ids(ds):
    return sorted(
        int(x) for b in ds.iter_batches(batch_format="pyarrow")
        for x in b["doc_id"].to_pylist()
    )


def test_novel_docs_broadcast(ray_session):
    seen = _docs(["alpha beta", "gamma delta", "shared text here"], 0)
    new = _docs(
        ["alpha beta", "totally new page", "shared text here", "fresh stuff"],
        100,
    )
    out = novel_docs(rd.from_arrow(new), rd.from_arrow(seen))
    assert _sorted_ids(out) == [101, 103]


def test_novel_docs_bloom_equals_broadcast(ray_session):
    rng = np.random.default_rng(7)
    seen_texts = [f"seen document number {i} word {rng.integers(1000)}" for i in range(200)]
    # half of new duplicates seen text, half is novel
    new_texts = seen_texts[:100] + [f"novel page {i}" for i in range(100)]
    seen = rd.from_arrow(_docs(seen_texts, 0))
    new_tbl = _docs(new_texts, 1000)
    a = _sorted_ids(novel_docs(rd.from_arrow(new_tbl), seen))
    b = _sorted_ids(
        novel_docs(
            rd.from_arrow(new_tbl), seen, force_bloom=True, num_partitions=5
        )
    )
    assert a == b == list(range(1100, 1200))


def test_novel_docs_empty_seen(ray_session):
    new = _docs(["a doc", "b doc"], 0)
    out = novel_docs(rd.from_arrow(new), rd.from_arrow(_docs([], 0)))
    assert _sorted_ids(out) == [0, 1]
    out2 = novel_docs(
        rd.from_arrow(new), rd.from_arrow(_docs([], 0)), force_bloom=True,
        num_partitions=3,
    )
    assert _sorted_ids(out2) == [0, 1]


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 1 << 63, 5000, dtype=np.int64)
    h2 = rng.integers(0, 1 << 63, 5000, dtype=np.int64)
    m, k = _bloom_params(5000, 16)
    words = np.zeros(m >> 6, np.uint64)
    _bloom_set(words, h, h2, k)
    assert _bloom_test(words, h, h2, k).all()  # zero false negatives
    qh = rng.integers(0, 1 << 63, 20000, dtype=np.int64)
    qh2 = rng.integers(0, 1 << 63, 20000, dtype=np.int64)
    fp = _bloom_test(words, qh, qh2, k).mean()
    assert fp < 0.01  # 16 bits/key -> ~4e-4 expected


def test_pair_membership_collision_run():
    # duplicate text_hash with different hash2 (a 63-bit collision):
    # membership must match on the PAIR, not the first hash alone
    H = np.array([5, 5, 9], np.int64)
    H2 = np.array([1, 2, 7], np.int64)
    H, H2 = _unique_pairs(H, H2)
    hit = _pair_membership(
        np.array([5, 5, 5, 9], np.int64),
        np.array([1, 2, 3, 8], np.int64),
        H,
        H2,
    )
    assert hit.tolist() == [True, True, False, False]


def _para(words: list[str]) -> str:
    return " ".join(words)


def test_novel_docs_near_vs_brute(ray_session):
    """Cross-snapshot near-dup filter == brute-force shingle Jaccard."""
    from nlshray.config import DedupConfig
    from nlshray.functions.shingles import doc_shingle_hashes, exact_jaccard
    from nlshray.stages.incremental import novel_docs_near

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    base = [
        _para(list(rng.choice(vocab, size=120))) for _ in range(30)
    ]
    # seen: 30 base docs. new: near-dups of some (1-2 word edits), an
    # exact copy, and fresh docs
    seen_texts = base
    new_texts = []
    for i in range(10):  # near-dups of base[i]
        w = base[i].split()
        w[5] = "edited"
        new_texts.append(_para(w))
    new_texts.append(base[20])  # exact copy
    for _ in range(10):  # fresh
        new_texts.append(_para(list(rng.choice(vocab, size=120))))
    seen = _docs(seen_texts, 0)
    new = _docs(new_texts, 1000)

    cfg = DedupConfig()
    stats: dict = {}
    out = novel_docs_near(
        rd.from_arrow(new), rd.from_arrow(seen), cfg,
        num_partitions=4, stats_out=stats,
    )
    got = set(_sorted_ids(out))

    seen_set = set(seen_texts)
    ssets = [doc_shingle_hashes(t, cfg.shingle_k, unique=True) for t in seen_set]
    truth = set()
    for d, t in zip(new["doc_id"].to_pylist(), new["text"].to_pylist()):
        if t in seen_set:
            continue
        st = doc_shingle_hashes(t, cfg.shingle_k, unique=True)
        if not any(exact_jaccard(st, s) >= cfg.threshold for s in ssets):
            truth.add(d)
    # the engine may only miss via an LSH band miss (recall), never drop
    # a genuinely novel doc (precision of the drop decision is exact)
    assert truth - got == set()
    assert got == truth  # at this scale banding catches every true pair
    assert stats["n_matched_new_reps"] >= 10
    # output schema is the input's
    assert out.schema().names == ["doc_id", "text"]


def test_novel_docs_near_parallelism_independent(ray_session):
    from nlshray.config import DedupConfig
    from nlshray.stages.incremental import novel_docs_near

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(40)]
    seen = _docs([_para(list(rng.choice(vocab, 90))) for _ in range(20)], 0)
    new_t = []
    for i in range(8):
        w = seen["text"][i].as_py().split()
        w[3] = "x"
        new_t.append(_para(w))
    new_t += [_para(list(rng.choice(vocab, 90))) for _ in range(8)]
    new = _docs(new_t, 500)
    cfg = DedupConfig()
    a = _sorted_ids(
        novel_docs_near(rd.from_arrow(new), rd.from_arrow(seen), cfg, num_partitions=2)
    )
    b = _sorted_ids(
        novel_docs_near(
            rd.from_arrow(new).repartition(7),
            rd.from_arrow(seen).repartition(3),
            cfg,
            num_partitions=9,
        )
    )
    assert a == b


def test_novel_docs_near_empty_sides(ray_session):
    from nlshray.config import DedupConfig
    from nlshray.stages.incremental import novel_docs_near

    cfg = DedupConfig()
    new = _docs(["alpha beta gamma", "delta epsilon"], 0)
    empty = _docs([], 100)
    # empty seen: everything is novel
    out = novel_docs_near(rd.from_arrow(new), rd.from_arrow(empty), cfg)
    assert _sorted_ids(out) == [0, 1]
    # empty new: nothing comes back
    out2 = novel_docs_near(rd.from_arrow(empty), rd.from_arrow(new), cfg)
    assert _sorted_ids(out2) == []


def test_seen_index_probe_equals_direct(ray_session, tmp_path):
    """build_seen_index + probe == direct two-sided computation, and a
    config mismatch refuses to probe."""
    import pytest

    from nlshray.config import DedupConfig
    from nlshray.stages.incremental import build_seen_index, novel_docs_near

    rng = np.random.default_rng(21)
    vocab = [f"v{i}" for i in range(50)]
    seen_texts = [_para(list(rng.choice(vocab, 110))) for _ in range(25)]
    new_t = []
    for i in range(6):  # near-dups of seen
        w = seen_texts[i].split()
        w[7] = "changed"
        new_t.append(_para(w))
    new_t.append(seen_texts[10])  # exact dup
    new_t += [_para(list(rng.choice(vocab, 110))) for _ in range(6)]
    seen = _docs(seen_texts, 0)
    new = _docs(new_t, 2000)

    cfg = DedupConfig()
    direct = _sorted_ids(
        novel_docs_near(rd.from_arrow(new), rd.from_arrow(seen), cfg, num_partitions=3)
    )
    idx = str(tmp_path / "seen_index")
    manifest = build_seen_index(rd.from_arrow(seen), cfg, idx, num_partitions=3)
    assert manifest["n_seen_reps"] == 25
    probed = _sorted_ids(
        novel_docs_near(
            rd.from_arrow(new), cfg=cfg, seen_index_dir=idx, num_partitions=5
        )
    )
    assert probed == direct
    assert len(probed) < len(new_t)  # something was filtered

    with pytest.raises(ValueError, match="different config"):
        novel_docs_near(
            rd.from_arrow(new),
            cfg=DedupConfig(threshold=0.9),
            seen_index_dir=idx,
        )


def test_emit_cross_pairs_fuzz_vs_brute():
    """Vectorized singles fast path + capped multi-bucket loop == brute
    force over random tagged buckets (no Ray needed)."""
    from collections import defaultdict

    from nlshray.stages.incremental import _emit_cross_pairs

    def brute(bh_n, id_n, bh_s, id_s, cap):
        pairs, forgone = set(), 0
        dn, ds = defaultdict(list), defaultdict(list)
        for b, i in zip(bh_n, id_n):
            dn[b].append(i)
        for b, i in zip(bh_s, id_s):
            ds[b].append(i)
        for b in set(dn) & set(ds):
            a, c = sorted(set(dn[b])), sorted(set(ds[b]))
            if len(a) > cap or len(c) > cap:
                forgone += len(a) * len(c) - min(len(a), cap) * min(
                    len(c), cap
                )
                a, c = a[:cap], c[:cap]
            pairs.update((x, y) for x in a for y in c)
        return pairs, forgone

    rng = np.random.default_rng(0)
    for trial in range(100):
        nb = rng.integers(1, 12)

        def side(lo):
            bh = rng.integers(0, nb, size=rng.integers(0, 30)).astype(np.int64)
            ids = rng.integers(lo, lo + 30, size=bh.shape[0]).astype(np.int64)
            seen, keep = set(), []
            for i, (b, d) in enumerate(zip(bh, ids)):
                if (b, d) not in seen:
                    seen.add((b, d))
                    keep.append(i)
            return bh[keep], ids[keep]

        bh_n, id_n = side(100)
        bh_s, id_s = side(200)
        cap = int(rng.integers(1, 6))
        l, r, _sz, fg = _emit_cross_pairs(bh_n, id_n, bh_s, id_s, cap)
        got = set(zip(l.tolist(), r.tolist()))
        want, wfg = brute(bh_n, id_n, bh_s, id_s, cap)
        assert got == want, trial
        assert fg == wfg, trial
