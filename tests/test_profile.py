"""Table profiler (`stages/profile.py`)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.stages.profile import profile_table


def test_profile_nulls_and_nans(ray_session):
    t = pa.table(
        {
            "a": pa.array([1, None, 3, 7], pa.int64()),
            "b": pa.array([0.5, float("nan"), -2.25, None], pa.float64()),
            "ts": pa.array(
                [1_600_000_000_000_000, None, 1_600_000_000_500_000,
                 1_599_999_999_000_000],
                pa.timestamp("us"),
            ),
        }
    )
    got = (
        profile_table(rd.from_arrow(t).repartition(3), ["a", "b", "ts"])
        .to_pandas().set_index("column")
    )
    assert got.loc["a", "n_rows"] == 4 and got.loc["a", "n_nulls"] == 1
    assert got.loc["a", "min_v"] == 1 and got.loc["a", "max_v"] == 7
    assert got.loc["a", "sum_q"] == 11
    # NaN counts as missing for min/max/sum but not in null_count
    assert got.loc["b", "n_nulls"] == 1
    assert got.loc["b", "min_v"] == -2.25 and got.loc["b", "max_v"] == 0.5
    assert got.loc["b", "sum_q"] == int(np.floor(0.5 * 1e4)) + int(
        np.floor(-2.25 * 1e4)
    )
    assert got.loc["ts", "min_v"] == 1_599_999_999_000_000.0
    assert got.loc["ts", "sum_q"] == 0


def test_profile_parallelism_independent(ray_session):
    rng = np.random.default_rng(2)
    t = pa.table({"x": pa.array(rng.normal(size=5000), pa.float64())})

    def run(parts):
        ds = rd.from_arrow(t)
        if parts:
            ds = ds.repartition(parts)
        return profile_table(ds, ["x"]).to_pandas()

    assert run(None).equals(run(17))
