"""Sliding RANGE-window aggregate (stages/window.py) and as-of join
(stages/joins.py) — kernel goldens vs brute-force oracles plus the
boundary cases the vectorized searchsorted paths must get right
(inclusive frame ends, same-timestamp peers, unmatched left rows)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from nlshray.pipelines.dedup import to_arrow
from nlshray.stages.joins import asof_join
from nlshray.stages.window import sliding_window


def _events(rows):
    ids, users, ts, vals = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                np.array(ts, dtype="datetime64[s]").astype("datetime64[us]")
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )


def test_sliding_window_golden(ray_session):
    # user 1: ts 0, 3600, 3601, 3601 — frame is INCLUSIVE both ends:
    # the event at 3600 still sees the one at 0 (Δ=3600 exactly); the
    # pair at 3601 are peers of each other, include ts=3600, and
    # exclude ts=0 (frame start 1 > 0).
    t = _events(
        [
            (1, 1, 0, 5.0),
            (2, 1, 3600, 1.0),
            (3, 1, 3601, 2.0),
            (4, 1, 3601, 3.0),
            (5, 2, 100, 9.0),
        ]
    )
    out = to_arrow(
        sliding_window(
            rd.from_arrow(t), key="user_id", ts="ts", value="value",
            id_col="event_id", window_seconds=3600, num_partitions=2,
        )
    )
    got = {
        r["event_id"]: (r["cnt"], r["max_value"])
        for r in out.to_pylist()
    }
    assert got == {
        1: (1, 5.0),
        2: (2, 5.0),   # [0, 3600] inclusive
        3: (3, 3.0),   # {3600, 3601, 3601}
        4: (3, 3.0),   # same frame as its peer
        5: (1, 9.0),
    }


def test_sliding_window_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    users = rng.integers(0, 5, n)
    ts = np.sort(rng.integers(0, 20_000, n))
    vals = np.round(rng.normal(size=n), 3)
    t = _events(list(zip(range(n), users.tolist(), ts.tolist(), vals.tolist())))
    out = to_arrow(
        sliding_window(
            rd.from_arrow(t), key="user_id", ts="ts", value="value",
            id_col="event_id", window_seconds=1000, num_partitions=3,
        )
    )
    got = {r["event_id"]: (r["cnt"], r["max_value"]) for r in out.to_pylist()}
    for i in range(n):
        frame = (users == users[i]) & (ts >= ts[i] - 1000) & (ts <= ts[i])
        assert got[i] == (int(frame.sum()), float(vals[frame].max())), i


def test_asof_join_golden(ray_session):
    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "lts": pa.array(
                np.array([10, 20, 5, 10, 10], "datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "event_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "rts": pa.array(
                np.array([10, 10, 15, 50], "datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "rid": pa.array([7, 9, 8, 6], pa.int64()),
            "price": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
        }
    )
    out = to_arrow(
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            on="k", left_ts="lts", right_ts="rts",
            left_cols=["event_id"], right_cols=["rid", "price"],
            right_tie="rid", num_partitions=2,
        )
    )
    got = {r["event_id"]: (r["rid"], r["price"]) for r in out.to_pylist()}
    assert got == {
        100: (9, 2.5),   # ties at rts=10 -> greatest rid wins
        101: (8, 3.5),   # latest rts <= 20 is 15
        # 102: no right row at ts <= 5 -> dropped (inner)
        # 103: k=2 right row is at 50 > 10 -> dropped
        # 104: k=3 has no right rows at all -> dropped
    }
    assert out.num_rows == 2


def test_asof_join_parallelism_independent(ray_session):
    rng = np.random.default_rng(11)
    nl, nr = 300, 200
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 8, nl), pa.int64()),
            "lts": pa.array(
                rng.integers(0, 1000, nl).astype("datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "event_id": pa.array(np.arange(nl), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rng.integers(0, 8, nr), pa.int64()),
            "rts": pa.array(
                rng.integers(0, 1000, nr).astype("datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "rid": pa.array(np.arange(nr), pa.int64()),
        }
    )

    def run(nparts, nblocks):
        out = to_arrow(
            asof_join(
                rd.from_arrow(left).repartition(nblocks),
                rd.from_arrow(right),
                on="k", left_ts="lts", right_ts="rts",
                left_cols=["event_id"], right_cols=["rid"],
                right_tie="rid", num_partitions=nparts,
            )
        )
        return sorted(zip(out["event_id"].to_pylist(), out["rid"].to_pylist()))

    assert run(2, 1) == run(5, 7)


def test_range_self_join_golden(ray_session):
    from nlshray.stages.joins import range_self_join

    # user 1: ts 0, 60, 61, 61; window 60s INCLUSIVE: (1,2) in (Δ=60),
    # (1,3)/(1,4) out (Δ=61), (2,3)/(2,4)/(3,4) in (Δ<=1; equal-ts peers
    # pair exactly once)
    t = _events(
        [
            (1, 1, 0, 0.0),
            (2, 1, 60, 0.0),
            (3, 1, 61, 0.0),
            (4, 1, 61, 0.0),
            (5, 2, 0, 0.0),    # different user: no cross-user pairs
        ]
    )
    out = to_arrow(
        range_self_join(
            rd.from_arrow(t), on="user_id", ts="ts", id_col="event_id",
            window_seconds=60, num_partitions=2,
        )
    )
    got = set(zip(out["left_id"].to_pylist(), out["right_id"].to_pylist()))
    assert got == {(1, 2), (2, 3), (2, 4), (3, 4)}


def test_debounce_lag_semantics(ray_session):
    """debounce keeps a row iff the previous RAW same-key event is older
    than the gap (LAG semantics, per-key)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from nlshray.stages.window import debounce

    ts = np.array(
        ["2024-01-01T00:00", "2024-01-01T00:30", "2024-01-01T02:00",
         "2024-01-01T02:20", "2024-01-01T09:00",  # key A chain
         "2024-01-01T00:00"],                      # key B singleton
        dtype="datetime64[us]",
    )
    t = pa.table(
        {
            "event_id": pa.array(list(range(6)), pa.int64()),
            "k": pa.array(["a"] * 5 + ["b"]),
            "ts": pa.array(ts),
        }
    )
    out = debounce(
        rd.from_arrow(t), keys=["k"], ts="ts", id_col="event_id",
        min_gap_seconds=3600, num_partitions=2,
    ).take_all()
    kept = sorted(r["event_id"] for r in out)
    # id1 is 30min after id0 (dropped); id2 is 90min after id1 (kept);
    # id3 is 20min after id2 (dropped); id4 is hours later (kept)
    assert kept == [0, 2, 4, 5]
    row0 = next(r for r in out if r["event_id"] == 0)
    assert row0["ts_us"] == ts[0].astype("datetime64[us]").astype(np.int64)


def test_running_totals_vs_pandas(ray_session):
    """running_totals matches a pandas expanding-window reference on a
    random multi-user stream, including the fixed-point quantization."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from nlshray.stages.window import running_totals

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 17, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n), unit="s"
            ).astype("datetime64[us]"),
            "value": rng.normal(scale=50.0, size=n),
        }
    )
    out = running_totals(
        rd.from_pandas(df), key="user_id", ts="ts", value="value",
        id_col="event_id", num_partitions=3,
    ).take_all()
    got = (
        pd.DataFrame(out).set_index("event_id").sort_index()
    )

    ref = df.copy()
    ref["v_c"] = np.floor(ref["value"].to_numpy() * 10000.0).astype(np.int64)
    ref = ref.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ref["running_n"] = ref.groupby("user_id").cumcount() + 1
    ref["running_sum_c"] = ref.groupby("user_id")["v_c"].cumsum()
    ref = ref.set_index("event_id").sort_index()

    assert len(got) == n
    assert (got["running_n"].to_numpy() == ref["running_n"].to_numpy()).all()
    assert (
        got["running_sum_c"].to_numpy() == ref["running_sum_c"].to_numpy()
    ).all()


def test_funnel_greedy_completeness(ray_session):
    """Greedy-earliest must find every user with ANY valid ordered
    chain — checked against a brute-force existence oracle; step
    times must be the greedy ones; strict ordering enforced."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.stages.window import funnel

    rng = np.random.default_rng(21)
    steps = ["a", "b", "c"]
    rows = []
    for user in range(120):
        n = rng.integers(1, 12)
        for _ in range(n):
            rows.append(
                (
                    user,
                    str(rng.choice(["a", "b", "c", "x"])),
                    np.datetime64(1_600_000_000_000_000 +
                                  int(rng.integers(0, 1000)) * 1_000_000, "us"),
                )
            )
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    got = funnel(
        rd.from_arrow(t), key="user_id", ts="ts",
        type_col="event_type", steps=steps,
    ).to_pandas().set_index("user_id").sort_index()

    # brute force: does ANY strictly-increasing (ta < tb < tc) chain exist?
    df = t.to_pandas()
    df["us"] = df["ts"].astype("int64")
    want = set()
    greedy = {}
    for user, g in df.groupby("user_id"):
        ok = True
        t_prev = -np.inf
        times = []
        for s in steps:
            cand = g.loc[(g["event_type"] == s) & (g["us"] > t_prev), "us"]
            if cand.empty:
                ok = False
                break
            t_prev = cand.min()
            times.append(int(t_prev))
        if ok:
            want.add(user)
            greedy[user] = times
    assert set(got.index) == want
    for u in want:
        assert [got.loc[u, f"t_{i}"] for i in range(3)] == greedy[u]
    # strictness on the output itself
    assert (got["t_0"] < got["t_1"]).all() and (got["t_1"] < got["t_2"]).all()


def test_rolling_anomaly_flags_spike(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.stages.window import rolling_anomaly

    # 30 steady values then one huge spike: only the spike is flagged
    n = 31
    vals = [10.0 + 0.01 * (i % 3) for i in range(30)] + [500.0]
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([7] * n, pa.int64()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(i, "s") for i in range(n)],
                pa.timestamp("us"),
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out = (
        rolling_anomaly(
            rd.from_arrow(t),
            key="user_id", ts="ts", value="value", id_col="event_id",
            window=20, min_n=5, k=3, num_partitions=2,
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[30].is_anomaly == 1
    assert out.is_anomaly.sum() == 1
    # cold-start guard: first min_n rows never flagged
    assert (out.loc[:4].is_anomaly == 0).all()
    assert out.loc[10].n_prev == 10 and out.loc[25].n_prev == 20
