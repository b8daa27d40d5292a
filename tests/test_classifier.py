"""Naive-Bayes quality classifier (`nlshray/stages/classifier.py`)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.classifier import (
    MICRO,
    fit_nb_model,
    nb_quality_scores,
    token_class_counts,
)


def _corpus() -> pa.Table:
    rng = np.random.default_rng(11)
    ref_vocab = ["clean", "prose", "article", "edited", "cited"]
    crawl_vocab = ["spam", "click", "buy", "free", "winner", "clean"]
    rows = []
    for i in range(80):
        pos = i % 4 == 0
        vocab = ref_vocab if pos else crawl_vocab
        rows.append(
            (
                i,
                " ".join(rng.choice(vocab, size=rng.integers(4, 15)).tolist()),
                "src0" if pos else f"src{2 + i % 3}",
            )
        )
    rows.append((80, "", "src0"))  # zero-token doc -> prior only
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
        }
    )


def _py_model(t: pa.Table, pos_sources: set[str]):
    cc: dict[str, list[int]] = {}
    d1 = d0 = 0
    for text, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
        pos = src in pos_sources
        d1 += pos
        d0 += not pos
        for w in re.split(r"[^0-9a-z_]+", text.lower()):
            if w:
                cc.setdefault(w, [0, 0])[0 if pos else 1] += 1
    t1 = sum(v[0] for v in cc.values())
    t0 = sum(v[1] for v in cc.values())
    v = len(cc)
    weights = {
        w: int(np.round((np.log((p + 1) / (t1 + v)) - np.log((n + 1) / (t0 + v))) * MICRO))
        for w, (p, n) in cc.items()
    }
    prior = int(np.round(np.log(max(d1, 1) / max(d0, 1)) * MICRO))
    return weights, prior


def test_fit_nb_model_matches_pure_python(ray_session):
    t = _corpus()
    got_w, got_p = fit_nb_model(rd.from_arrow(t).repartition(3), ("src0",))
    want_w, want_p = _py_model(t, {"src0"})
    assert got_p == want_p
    assert got_w == want_w


def test_token_class_counts_parallelism_independent(ray_session):
    t = _corpus()
    outs = []
    for parts in (2, 7):
        df = (
            token_class_counts(rd.from_arrow(t).repartition(parts), ("src0",))
            .to_pandas()
            .sort_values("tok")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])


def test_nb_scores_separate_and_deterministic(ray_session):
    t = _corpus()
    runs = []
    for parts in (2, 5):
        df = (
            nb_quality_scores(rd.from_arrow(t).repartition(parts), ("src0",))
            .sort("doc_id")
            .to_pandas()
        )
        runs.append(df)
    assert runs[0].equals(runs[1])
    df = runs[0]
    # disjoint-ish vocabularies -> strong separation on non-empty docs
    body = df[df["n_tokens"] > 0]
    pos_scores = body.loc[body["label"] == 1, "nb_micro"]
    neg_scores = body.loc[body["label"] == 0, "nb_micro"]
    assert pos_scores.min() > neg_scores.max()
    assert (body["pred"] == body["label"]).mean() > 0.95
    # zero-token doc scores exactly the prior
    _, prior = _py_model(t, {"src0"})
    empty = df[df["n_tokens"] == 0]
    assert len(empty) == 1 and int(empty["nb_micro"].iloc[0]) == prior
