"""Bigram-LM perplexity scoring (`stages/lm.py`)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _ref_scores(texts):
    """Driver-side reference: same micro-nat semantics, plain Python."""
    from collections import Counter

    bc, pc_ = Counter(), Counter()
    toks = [[w for w in t.lower().split() if w] for t in texts]
    for ws in toks:
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] += 1
            pc_[a] += 1
    out = {}
    for i, ws in enumerate(toks):
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        nll = sum(
            int(np.round(-np.log(bc[p] / pc_[p[0]]) * 1e6)) for p in pairs
        )
        out[i] = (len(pairs), nll, round(float(np.exp(nll / 1e6 / len(pairs))), 6))
    return out


def test_lm_self_score_matches_reference(ray_session):
    from nlshray.stages.lm import lm_perplexity

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 30)))
        for _ in range(80)
    ] + ["alpha"]  # single-token doc: no bigrams, must be dropped
    got = (
        lm_perplexity(rd.from_arrow(_docs(texts)))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _ref_scores(texts)
    assert set(got.index) == set(want)  # doc 80 dropped
    for i, (n, nll, ppl) in want.items():
        assert got.loc[i, "n_bigrams"] == n
        assert got.loc[i, "nll_micro"] == nll
        assert got.loc[i, "ppl"] == ppl


def test_lm_parallelism_independent(ray_session):
    from nlshray.stages.lm import lm_perplexity

    rng = np.random.default_rng(3)
    vocab = ["k%d" % i for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 40)))
        for _ in range(200)
    ]
    t = _docs(texts)
    a = (
        lm_perplexity(rd.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        lm_perplexity(rd.from_arrow(t).repartition(13))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_lm_cross_corpus_backoff(ray_session):
    """Score a corpus with bigrams the model never saw: unseen pairs
    are charged exactly `unseen_cost` micro-nats; without it the
    kernel refuses (self-scoring contract)."""
    from nlshray.stages.lm import fit_bigram_counts, score_perplexity

    train = _docs(["a b a b a", "b a b a"])
    probe = _docs(["a b a", "a zz a b"])  # (a,zz)/(zz,a) unseen
    counts = fit_bigram_counts(rd.from_arrow(train))
    got = (
        score_perplexity(
            rd.from_arrow(probe), counts, unseen_cost=10 * 10**6
        )
        .to_pandas().set_index("doc_id")
    )
    # doc 0: (a,b),(b,a) both seen
    assert got.loc[0, "n_bigrams"] == 2
    # doc 1: (a,zz) unseen, (zz,a) unseen, (a,b) seen.
    # train counts: c12(a,b)=3, c12(b,a)=4 -> c1(a)=3, so (a,b) costs
    # round(-ln(3/3)*1e6) = 0 micro-nats; only the two backoffs charge.
    assert got.loc[1, "n_bigrams"] == 3
    assert got.loc[1, "nll_micro"] == 2 * 10 * 10**6

    with pytest.raises(Exception):
        score_perplexity(rd.from_arrow(probe), counts).to_pandas()


def test_lm_repetitive_doc_scores_lower(ray_session):
    """The Gopher/CCNet premise: a doc made of the corpus's dominant
    pattern gets lower perplexity than a rare-transition doc."""
    from nlshray.stages.lm import lm_perplexity

    texts = ["x y " * 20] * 9 + ["y y x x y"]
    got = lm_perplexity(rd.from_arrow(_docs(texts))).to_pandas()
    got = got.set_index("doc_id")
    assert got.loc[0, "ppl"] < got.loc[9, "ppl"]


def test_perplexity_tiers_thresholds(ray_session):
    """Tier split follows the ceil(q*n)-rank rule per group, exactly."""
    from nlshray.stages.lm import lm_perplexity, perplexity_tiers

    rng = np.random.default_rng(11)
    vocab = ["t%d" % i for i in range(10)]
    texts, langs = [], []
    for i in range(150):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(3, 25))))
        langs.append(["en", "de", "fr"][i % 3])
    t = pa.table(
        {
            "doc_id": pa.array(range(150), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    scores = lm_perplexity(rd.from_arrow(t), carry_cols=("lang",))
    got = perplexity_tiers(scores, group_col="lang").to_pandas()
    assert set(got["tier"]) <= {"head", "middle", "tail"}
    for lang, grp in got.groupby("lang"):
        vals = np.sort(grp["ppl"].values)
        n = len(vals)
        th = vals[max(int(np.ceil(0.33 * n)), 1) - 1]
        tm = vals[max(int(np.ceil(0.66 * n)), 1) - 1]
        want = np.where(
            grp["ppl"] <= th, "head",
            np.where(grp["ppl"] <= tm, "middle", "tail"),
        )
        assert (grp["tier"].values == want).all(), lang
        # every tier non-empty at this n
        assert set(grp["tier"]) == {"head", "middle", "tail"}, lang


def test_perplexity_tiers_parallelism_independent(ray_session):
    from nlshray.stages.lm import lm_perplexity, perplexity_tiers

    rng = np.random.default_rng(5)
    vocab = ["w%d" % i for i in range(8)]
    t = pa.table(
        {
            "doc_id": pa.array(range(120), pa.int64()),
            "text": pa.array(
                [" ".join(rng.choice(vocab, size=rng.integers(2, 20)))
                 for _ in range(120)], pa.string()),
            "lang": pa.array((["en", "de"] * 60), pa.string()),
        }
    )

    def run(parts):
        ds = rd.from_arrow(t)
        if parts:
            ds = ds.repartition(parts)
        s = lm_perplexity(ds, carry_cols=("lang",))
        return (
            perplexity_tiers(s, group_col="lang")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    assert run(None).equals(run(11))


def test_lm_grouped_conditioning(ray_session):
    """Per-group models really condition: scoring a doc under its own
    group's model differs from the pooled model, and matches a
    per-group reference."""
    from nlshray.stages.lm import lm_perplexity

    texts = ["a b a b a b", "a b a b", "b a b a b", "a a a a", "a a a"]
    langs = ["x", "x", "x", "y", "y"]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    got = (
        lm_perplexity(
            rd.from_arrow(t), carry_cols=("lang",), group_col="lang"
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    # group y is pure 'a a': p(a|a)=1 -> nll 0, ppl 1
    assert got.loc[3, "nll_micro"] == 0 and got.loc[3, "ppl"] == 1.0
    assert got.loc[4, "nll_micro"] == 0
    # per-group reference for group x
    want = _ref_scores([texts[i] for i in range(3)])
    for i in range(3):
        n, nll, ppl = want[i]
        assert got.loc[i, "n_bigrams"] == n
        assert got.loc[i, "nll_micro"] == nll
        assert got.loc[i, "ppl"] == ppl
    # pooled model must differ for group y (pooled has p(a|a) < 1)
    pooled = (
        lm_perplexity(rd.from_arrow(t))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert pooled.loc[3, "nll_micro"] > 0


def test_lm_counts_mergeable(ray_session):
    """fit(A + B) == merge(fit(A), fit(B)) — incremental model
    maintenance is exact."""
    from nlshray.stages.lm import fit_bigram_counts, merge_bigram_counts

    rng = np.random.default_rng(17)
    vocab = ["m%d" % i for i in range(9)]
    ta = _docs([" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
                for _ in range(60)])
    tb_texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
                for _ in range(40)]
    tb = pa.table(
        {
            "doc_id": pa.array(range(60, 100), pa.int64()),
            "text": pa.array(tb_texts, pa.string()),
        }
    )
    both = pa.concat_tables([ta, tb])

    full = fit_bigram_counts(rd.from_arrow(both)).sort_by("bh")
    inc = merge_bigram_counts(
        fit_bigram_counts(rd.from_arrow(ta)),
        fit_bigram_counts(rd.from_arrow(tb)),
    ).sort_by("bh")
    assert full.equals(inc)
