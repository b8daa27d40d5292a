"""KLL-style one-pass quantile sketch (`stages/qsketch.py`).

Approximate BY CONTRACT: gates are rank-error bounds vs the exact
answer, plus exact-weight conservation and same-sequence determinism.
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.qsketch import (
    KLLSketch,
    grouped_sketch_quantiles,
    sketch_quantiles,
)

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_err(vals, answers, qs):
    n = len(vals)
    s = np.sort(vals)
    errs = []
    for q, a in zip(qs, answers):
        true_rank = np.searchsorted(s, a, side="right")
        errs.append(abs(true_rank - max(int(np.ceil(q * n)), 1)) / n)
    return max(errs)


def test_kll_weight_conserved_and_exact_when_small():
    rng = np.random.default_rng(0)
    v = rng.normal(size=150)
    sk = KLLSketch(k=256).insert(v)
    assert sk.n == 150
    # everything fits in one compactor: answers are EXACT
    want = np.sort(v)
    got = sk.quantiles(QS)
    for q, g in zip(QS, got):
        assert g == want[max(int(np.ceil(q * 150)), 1) - 1]


def test_kll_rank_error_bound_large():
    rng = np.random.default_rng(1)
    v = np.concatenate(
        [rng.normal(size=60_000), rng.exponential(size=40_000) * 50]
    )
    sk = KLLSketch(k=128, seed=7)
    for chunk in np.array_split(v, 37):
        sk.insert(chunk)
    assert sk.n == 100_000  # weight conserved exactly through compaction
    assert _rank_err(v, sk.quantiles(QS), QS) <= 0.02


def test_kll_merge_within_bound():
    rng = np.random.default_rng(2)
    v = rng.uniform(size=50_000)
    shards = np.array_split(v, 16)
    merged = KLLSketch(k=128, seed=3)
    for s in shards:
        merged.merge(KLLSketch(k=128, seed=3).insert(s))
    assert merged.n == 50_000
    assert _rank_err(v, merged.quantiles(QS), QS) <= 0.02


def test_kll_same_sequence_deterministic():
    rng = np.random.default_rng(4)
    v = rng.normal(size=30_000)
    a = KLLSketch(k=64, seed=5).insert(v).quantiles(QS)
    b = KLLSketch(k=64, seed=5).insert(v).quantiles(QS)
    assert (a == b).all()


def test_sketch_quantiles_dataset(ray_session):
    rng = np.random.default_rng(6)
    v = rng.normal(size=20_000) * 10 + 3
    ds = rd.from_arrow(
        pa.table({"x": pa.array(v, pa.float64())})
    ).repartition(9)
    got, n = sketch_quantiles(ds, "x", QS, k=128, seed=1)
    assert n == 20_000
    assert _rank_err(v, got, QS) <= 0.02
    # answers are real input values
    assert np.isin(got, v).all()


def test_grouped_sketch_matches_exact_shape_and_bound(ray_session):
    from nlshray.stages.quantiles import grouped_quantiles_float

    rng = np.random.default_rng(8)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 30_000)]
    v = rng.normal(size=30_000) + (langs == "de") * 5
    t = pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "x": pa.array(v, pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(7)
    approx = grouped_sketch_quantiles(ds, "lang", "x", QS, k=128, seed=2)
    exact = grouped_quantiles_float(ds, "lang", "x", QS)
    assert set(approx.column_names) == set(exact.column_names)
    assert sorted(approx["lang"].to_pylist()) == sorted(
        exact["lang"].to_pylist()
    )
    ap = {r["lang"]: r for r in approx.to_pylist()}
    for lang in ("en", "de", "fr"):
        m = langs == lang
        assert ap[lang]["n_rows"] == int(m.sum())
        got = np.array([ap[lang][f"q_{int(round(q*100))}"] for q in QS])
        assert _rank_err(v[m], got, QS) <= 0.02


def test_sketch_query_vs_exact_on_testdata(ray_session):
    """The driver-contract sketch query stays within 2% rank error of
    the oracled exact operator on the real test table."""
    from nlshray.pipelines.queries import QUERIES
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    got = QUERIES["quantiles_sketch_by_lang"](sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["lang", "n_chars"])
    qs = [0.25, 0.5, 0.75, 0.9]
    assert sorted(got["lang"]) == sorted(docs["lang"].unique())
    for _, row in got.iterrows():
        vals = docs.loc[docs["lang"] == row["lang"], "n_chars"].values
        assert row["n_rows"] == len(vals)
        ans = [row[f"q_{int(round(q*100))}"] for q in qs]
        assert _rank_err(vals.astype(float), ans, qs) <= 0.02


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=3000,
    ),
    k=st.integers(min_value=8, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_kll_invariants_property(vals, k, seed):
    """For ANY input: weight is conserved exactly, every answer is a
    real input value, and quantiles are monotone in q."""
    v = np.array(vals, np.float64)
    sk = KLLSketch(k=k, seed=seed)
    for chunk in np.array_split(v, max(len(v) // 100, 1)):
        sk.insert(chunk)
    assert sk.n == len(v)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = sk.quantiles(qs)
    assert np.isin(got, v).all()
    assert (np.diff(got) >= 0).all()
    assert got[-1] == v.max()  # q=1.0 rule: cumweight >= total -> max
