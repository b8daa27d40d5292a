"""Grouped top-k and stratified sampling — combiner correctness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.topk import grouped_topk, stratified_sample


def _tbl(n=200, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(
                [["en", "de", "fr"][i] for i in rng.integers(0, 3, n)]
            ),
            "n_chars": pa.array(rng.integers(10, 100, n).astype(np.int64)),
        }
    )


def _pdf(ds):
    import pandas as pd

    df = ds.to_pandas()
    return df.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def test_grouped_topk_matches_pandas(ray_session):
    t = _tbl()
    got = _pdf(grouped_topk(rd.from_arrow(t), "lang", "n_chars", 4))
    df = t.to_pandas()
    want = (
        df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("lang", group_keys=False)
        .head(4)
    )
    want = want.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])


def test_grouped_topk_parallelism_independent(ray_session):
    t = _tbl(300, seed=9)
    a = _pdf(grouped_topk(rd.from_arrow(t), "lang", "n_chars", 3))
    b = _pdf(
        grouped_topk(
            rd.from_arrow(t).repartition(13), "lang", "n_chars", 3
        )
    )
    assert a.equals(b)


def test_stratified_exact_quota(ray_session):
    t = _tbl(250, seed=1)
    out = _pdf(stratified_sample(rd.from_arrow(t), "lang", 0.2, seed=42))
    df = t.to_pandas()
    sizes = df.groupby("lang").size()
    got_sizes = out.groupby("lang").size()
    for lang, n in sizes.items():
        assert got_sizes.get(lang, 0) == int(np.ceil(0.2 * n))
    # deterministic across partitioning
    out2 = _pdf(
        stratified_sample(
            rd.from_arrow(t).repartition(7), "lang", 0.2, seed=42
        )
    )
    assert out.equals(out2)


def test_grouped_quantiles_exact_vs_numpy(ray_session):
    """quantile_disc semantics: smallest value whose cumulative count
    reaches ceil(q*n), per group — checked against a direct sort."""
    from nlshray.stages.quantiles import grouped_quantiles

    t = _tbl(400, seed=3)
    qs = [0.25, 0.5, 0.75, 0.99]
    got = grouped_quantiles(rd.from_arrow(t), "lang", "n_chars", qs).to_pandas()
    df = t.to_pandas()
    # guard against a vacuous pass: every group must be present exactly once
    assert sorted(got["lang"]) == sorted(df["lang"].unique())
    for _, row in got.iterrows():
        vals = np.sort(df.loc[df["lang"] == row["lang"], "n_chars"].values)
        assert row["n_rows"] == vals.shape[0]
        for q in qs:
            want = vals[max(int(np.ceil(q * vals.shape[0])), 1) - 1]
            assert row[f"q_{int(round(q * 100))}"] == want, (row["lang"], q)


def test_grouped_quantiles_parallelism_independent(ray_session):
    from nlshray.stages.quantiles import grouped_quantiles

    t = _tbl(300, seed=11)
    a = grouped_quantiles(rd.from_arrow(t), "lang", "n_chars", [0.5, 0.9])
    b = grouped_quantiles(
        rd.from_arrow(t).repartition(13), "lang", "n_chars", [0.5, 0.9]
    )
    assert a.equals(b)


def _float_tbl(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    langs = rng.choice(["en", "de", "fr"], n)
    # heavy ties (30% exactly 0.5) + negatives: the straddling bucket
    # then holds many rows and the in-bucket rank must still be exact
    vals = np.where(rng.random(n) < 0.3, 0.5, rng.random(n) * 3 - 1)
    return pa.table({"lang": pa.array(langs), "score": pa.array(vals)})


def test_grouped_quantiles_float_exact_vs_numpy(ray_session):
    """float-domain member (VERDICT r3 #3): bucketing pre-map + targeted
    refine pass must reproduce quantile_disc exactly, including q=0/1,
    ties, and negative values."""
    from nlshray.stages.quantiles import grouped_quantiles_float

    t = _float_tbl()
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = grouped_quantiles_float(
        rd.from_arrow(t).repartition(7), "lang", "score", qs
    ).to_pandas()
    langs = t["lang"].to_numpy(zero_copy_only=False)
    vals = t["score"].to_numpy()
    assert sorted(got["lang"]) == sorted(np.unique(langs))
    for _, row in got.iterrows():
        v = np.sort(vals[langs == row["lang"]])
        assert row["n_rows"] == v.shape[0]
        for q in qs:
            want = v[max(int(np.ceil(q * v.shape[0])), 1) - 1]
            assert row[f"q_{int(round(q * 100))}"] == want, (row["lang"], q)


def test_grouped_quantiles_float_parallelism_independent(ray_session):
    from nlshray.stages.quantiles import grouped_quantiles_float

    t = _float_tbl(1200, seed=13)
    a = grouped_quantiles_float(rd.from_arrow(t), "lang", "score", [0.5, 0.9])
    b = grouped_quantiles_float(
        rd.from_arrow(t).repartition(11), "lang", "score", [0.5, 0.9]
    )
    assert a.equals(b)


def test_capped_sample_parallelism_independent(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.stages.topk import capped_sample

    rng = np.random.default_rng(3)
    n = 300
    tbl = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n)),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
        }
    )
    outs = []
    for parts in (2, 9):
        ds = rd.from_arrow(tbl).repartition(parts)
        df = (
            capped_sample(ds, "source", 20, seed=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert (outs[0].groupby("source").size() == 20).all()
    # quota larger than any group -> identity
    full = capped_sample(rd.from_arrow(tbl).repartition(3), "source", 999, seed=7)
    assert full.count() == n


def test_epoch_shuffle_rank(ray_session):
    """Global order == direct argsort of the hash keys; ranks are a
    permutation; seeds decorrelate; any partitioning, same order."""
    from nlshray.hashing import _seed_mix, splitmix64
    from nlshray.stages.shuffle import epoch_shuffle_rank

    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})

    def collect(nparts, seed):
        ds = epoch_shuffle_rank(
            rd.from_arrow(t).repartition(nparts), seed=seed
        )
        tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        return dict(
            zip(tbl["doc_id"].to_pylist(), tbl["epoch_rank"].to_pylist())
        )

    got = collect(4, seed=7)
    z = (splitmix64(ids.astype(np.uint64) ^ _seed_mix(7))
         & np.uint64((1 << 63) - 1)).astype(np.int64)
    want_order = np.lexsort((ids, z))
    want = {int(ids[d]): int(r) for r, d in enumerate(want_order)}
    assert got == want
    assert sorted(got.values()) == list(range(500))
    assert collect(9, seed=7) == got           # parallelism-independent
    other = collect(4, seed=8)
    assert other != got                        # a new epoch reorders


def test_assign_splits(ray_session):
    from nlshray.stages.topk import assign_splits

    t = pa.table({"doc_id": pa.array(np.arange(5000, dtype=np.int64))})

    def run(nparts):
        out = pa.concat_tables(
            assign_splits(
                rd.from_arrow(t).repartition(nparts), seed=7
            ).iter_batches(batch_format="pyarrow")
        ).sort_by("doc_id")
        return out["split"].to_pylist()

    s = run(3)
    assert run(9) == s                       # parallelism-independent
    frac = {k: s.count(k) / len(s) for k in ("train", "valid", "test")}
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["valid"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # growing the corpus never reassigns an existing doc
    t2 = pa.table({"doc_id": pa.array(np.arange(8000, dtype=np.int64))})
    out2 = pa.concat_tables(
        assign_splits(rd.from_arrow(t2), seed=7).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    assert out2["split"].to_pylist()[:5000] == s


def test_assign_splits_two_way(ray_session):
    """fractions summing to 1.0 (no test bucket) must not overflow."""
    from nlshray.stages.topk import assign_splits

    t = pa.table({"doc_id": pa.array(np.arange(2000, dtype=np.int64))})
    out = pa.concat_tables(
        assign_splits(
            rd.from_arrow(t), fractions=(0.9, 0.1), seed=3
        ).iter_batches(batch_format="pyarrow")
    )
    counts = {k: out["split"].to_pylist().count(k)
              for k in ("train", "valid", "test")}
    assert counts["test"] == 0
    assert abs(counts["train"] / 2000 - 0.9) < 0.03


def test_weighted_sample_parallelism_independent_and_biased(ray_session):
    """A-ES: same sample at any partitioning; heavy weights are
    overrepresented vs uniform (statistical gate on a fixed seed)."""
    import ray.data as rd
    from nlshray.stages.topk import weighted_sample

    n = 2000
    # weights: doc_id < 200 get weight 50, rest weight 1
    w = np.where(np.arange(n) < 200, 50, 1).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )

    def run(parts):
        ds = rd.from_arrow(t)
        if parts:
            ds = ds.repartition(parts)
        out = weighted_sample(ds, "w", 100, seed=9).to_pandas()
        return sorted(out["doc_id"].tolist())

    a, b = run(None), run(17)
    assert a == b and len(a) == 100
    # heavy group holds 200*50/(200*50+1800) ~ 84.7% of total weight;
    # uniform sampling would give ~10%. Gate well between the two.
    heavy = sum(1 for d in a if d < 200)
    assert heavy > 55, heavy


def test_weighted_sample_excludes_nonpositive(ray_session):
    import ray.data as rd
    from nlshray.stages.topk import weighted_sample

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "w": pa.array([0, -5, 3, 2], pa.int64()),
        }
    )
    out = weighted_sample(rd.from_arrow(t), "w", 10, seed=1).to_pandas()
    assert sorted(out["doc_id"]) == [3, 4]


def test_weighted_sample_grouped_quota_and_determinism(ray_session):
    import ray.data as rd
    from nlshray.stages.topk import weighted_sample_grouped

    n = 900
    langs = np.array(["en", "de", "fr"])[np.arange(n) % 3]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "w": pa.array(np.ones(n, np.int64)),
        }
    )

    def run(parts):
        ds = rd.from_arrow(t)
        if parts:
            ds = ds.repartition(parts)
        out = weighted_sample_grouped(ds, "lang", "w", 10, seed=4).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a, b = run(None), run(9)
    assert a.equals(b)
    assert a.groupby("lang").size().tolist() == [10, 10, 10]


def test_grouped_percent_rank_matches_pandas(ray_session):
    """pct_rank == pandas rank(method='min') percent_rank per group."""
    from nlshray.stages.quantiles import grouped_percent_rank

    t = _tbl(400, seed=21)
    got = (
        grouped_percent_rank(rd.from_arrow(t), "lang", "n_chars")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    # every row must come back exactly once
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])
    grp = df.groupby("lang")["n_chars"]
    rank_min = grp.rank(method="min")
    n = grp.transform("count")
    want = ((rank_min - 1) / (n - 1).clip(lower=1)).where(n > 1, 0.0)
    df = df.assign(pct_rank=want).sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(
        got["pct_rank"].values, df["pct_rank"].values
    )


def test_grouped_percent_rank_parallelism_independent(ray_session):
    from nlshray.stages.quantiles import grouped_percent_rank

    t = _tbl(300, seed=22)
    a = (
        grouped_percent_rank(rd.from_arrow(t), "lang", "n_chars")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        grouped_percent_rank(
            rd.from_arrow(t).repartition(11), "lang", "n_chars"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_grouped_percent_rank_singleton_group(ray_session):
    from nlshray.stages.quantiles import grouped_percent_rank

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "lang": pa.array(["en", "en", "zz"]),
            "n_chars": pa.array([5, 9, 7], pa.int64()),
        }
    )
    got = (
        grouped_percent_rank(rd.from_arrow(t), "lang", "n_chars")
        .to_pandas()
        .set_index("doc_id")["pct_rank"]
    )
    assert got[0] == 0.0 and got[1] == 1.0  # two-row group: 0 and 1
    assert got[2] == 0.0  # singleton group is 0.0 per SQL PERCENT_RANK


def test_grouped_mad_matches_numpy(ray_session):
    """med/mad = quantile_disc(0.5); outliers = |v-med| > 3*mad."""
    from nlshray.stages.quantiles import grouped_mad

    t = _tbl(500, seed=31)
    got = grouped_mad(rd.from_arrow(t), "lang", "n_chars").to_pandas()
    df = t.to_pandas()
    assert sorted(got["lang"]) == sorted(df["lang"].unique())

    def disc_med(a):
        a = np.sort(a)
        return int(a[max(int(np.ceil(0.5 * a.shape[0])), 1) - 1])

    for _, row in got.set_index("lang").iterrows():
        vals = df.loc[df["lang"] == row.name, "n_chars"].values
        med = disc_med(vals)
        mad = disc_med(np.abs(vals - med))
        assert row["med"] == med and row["mad"] == mad
        assert row["n_outliers"] == int((np.abs(vals - med) > 3 * mad).sum())
        assert row["n_rows"] == vals.shape[0]


def test_grouped_mad_parallelism_independent(ray_session):
    from nlshray.stages.quantiles import grouped_mad

    t = _tbl(300, seed=32)
    a = grouped_mad(rd.from_arrow(t), "lang", "n_chars")
    b = grouped_mad(rd.from_arrow(t).repartition(9), "lang", "n_chars")
    assert a.equals(b)
