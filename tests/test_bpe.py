"""BPE tokenizer training + encoding (`nlshray/stages/bpe.py`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from nlshray.stages.bpe import (
    EOW,
    BpeEncoder,
    encode_word,
    fit_bpe,
    fit_bpe_from_dataset,
    word_type_counts,
)

TOY_WORDS = ["low", "lower", "newest", "widest"]
TOY_COUNTS = [5, 2, 6, 3]


def test_fit_bpe_sennrich_toy():
    """Hand-derived first merges of the classic Sennrich toy corpus
    (count DESC, pair ASC tie-break)."""
    merges = fit_bpe(TOY_WORDS, TOY_COUNTS, num_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_fit_bpe_stops_when_dry():
    # every pair unique -> no pair reaches count 2 -> zero merges
    merges = fit_bpe(["abc", "def"], [1, 1], num_merges=50)
    assert merges == []


def test_encode_roundtrip_and_greedy_equivalence():
    merges = fit_bpe(TOY_WORDS, TOY_COUNTS, num_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in TOY_WORDS + ["lowest", "newer", "wide", "zzz"]:
        toks = encode_word(w, ranks)
        # roundtrip: concatenation restores the word + EOW marker
        assert "".join(toks) == w + EOW
        # greedy lowest-rank-first == applying merges in learned order
        seq = list(w) + [EOW]
        for a, b in merges:
            out = []
            j = 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = out
        assert toks == seq, w


def _docs_tbl():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)).tolist())
        + (" Rare%sWord!" % i if i % 9 == 0 else "")
        for i in range(60)
    ]
    return pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": texts})


def test_word_type_counts_exact_and_parallelism_independent(ray_session):
    t = _docs_tbl()
    # pure-python recount with identical normalization
    import re

    want: dict[str, int] = {}
    for s in t["text"].to_pylist():
        for w in re.split(r"[^0-9a-z_]+", s.lower()):
            if 0 < len(w) <= 64:
                want[w] = want.get(w, 0) + 1
    want = {w: n for w, n in want.items() if n >= 2}

    for parts in (2, 7):
        ds = rd.from_arrow(t).repartition(parts)
        got = word_type_counts(ds, min_count=2, nparts=3).to_pandas()
        assert dict(zip(got["word"], got["n"])) == want, parts


def test_fit_bpe_from_dataset_parallelism_independent(ray_session):
    t = _docs_tbl()
    m2 = fit_bpe_from_dataset(rd.from_arrow(t).repartition(2), num_merges=30)
    m5 = fit_bpe_from_dataset(rd.from_arrow(t).repartition(5), num_merges=30)
    assert m2 == m5
    assert len(m2) > 5


def test_bpe_encoder_stage_counts(ray_session):
    import ray

    t = _docs_tbl()
    merges = fit_bpe(TOY_WORDS + ["alpha", "beta"], [5, 2, 6, 3, 4, 4], 40)
    ref = ray.put(merges)
    out = (
        rd.from_arrow(t)
        .repartition(3)
        .map_batches(
            BpeEncoder,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=1,
        )
        .sort("doc_id")
        .to_pandas()
    )
    assert len(out) == 60
    # every word encodes to >= 1 token; <= len(word)+1 symbols
    assert (out["n_bpe_tokens"] >= out["n_words"]).all()
    # spot-check one doc against the scalar path
    import re

    ranks = {p: i for i, p in enumerate(merges)}
    row = out.iloc[0]
    text = t["text"][0].as_py()
    words = [w for w in re.split(r"[^0-9a-z_]+", text.lower()) if 0 < len(w) <= 64]
    assert row["n_words"] == len(words)
    assert row["n_bpe_tokens"] == sum(len(encode_word(w, ranks)) for w in words)


def test_bpe_queries_smoke(ray_session):
    from nlshray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    vocab = QUERIES["bpe_vocab"](sf).to_pandas()
    assert len(vocab) > 50
    assert (vocab["merged"] == vocab["left"] + vocab["right"]).all()
    counts = QUERIES["bpe_token_counts"](sf).to_pandas()
    assert len(counts) == 500
    assert (counts["n_bpe_tokens"] >= counts["n_words"]).all()
