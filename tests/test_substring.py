"""Substring-duplication detection (winnowed fingerprints)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from nlshray.pipelines.dedup import to_arrow
from nlshray.stages.substring import (
    fingerprint_stage,
    rolling_window_hashes,
    substring_dup_pairs,
    winnow,
)


def test_rolling_hashes_shift_invariant():
    a = rolling_window_hashes("abcdefghij" * 10, window=20)
    b = rolling_window_hashes("XYZ" + "abcdefghij" * 10, window=20)
    # every window of a appears in b (shifted) -> hashes are a subset
    assert np.isin(a, b).all()


def test_winnow_guarantee():
    """Any substring of length >= window + w - 1 shares a fingerprint."""
    rng = np.random.default_rng(5)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 400))
    shared = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 120))
    t1 = base[:200] + shared + base[200:]
    t2 = shared  # >= 50 + 16 - 1 bytes
    f1, _ = winnow(rolling_window_hashes(t1, 50), 16)
    f2, _ = winnow(rolling_window_hashes(t2, 50), 16)
    assert np.intersect1d(f1, f2).shape[0] >= 1


def test_substring_dup_pairs(ray_session):
    rng = np.random.default_rng(11)

    def rand_text(n):
        return " ".join(
            "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 7))
            for _ in range(n)
        )

    shared_span = rand_text(40)          # ~300 chars of verbatim overlap
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        rand_text(60) + " " + shared_span,
                        shared_span + " " + rand_text(60),
                        rand_text(100),
                        rand_text(100),
                    ],
                    pa.string(),
                ),
            }
        )
    )
    pairs = to_arrow(substring_dup_pairs(docs, num_partitions=4))
    got = set(zip(pairs["left_id"].to_pylist(), pairs["right_id"].to_pylist()))
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)  # no false positives
    row = pairs.to_pylist()[0]
    assert row["n_shared_windows"] >= 2
    assert row["match_len_checked"] == 50


def test_fingerprint_stage_schema(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["hello world " * 30], pa.string()),
            }
        )
    )
    out = to_arrow(fingerprint_stage(docs))
    assert set(out.column_names) == {"band_idx", "band_hash", "doc_id"}
    assert out.num_rows >= 1
    assert (np.asarray(out["band_hash"]) >= 0).all()
