"""LSH banding planner (`functions/lshplan.py`)."""

import numpy as np
import pytest

from nlshray.config import DedupConfig
from nlshray.functions.lshplan import (
    LSHPlan,
    collision_probability,
    plan_bands,
)


def test_collision_probability_matches_simulation():
    """P(s; b, r) vs a direct MinHash simulation (fixed RNG)."""
    rng = np.random.default_rng(0)
    b, r, s = 8, 4, 0.7
    trials = 20_000
    # each of the b*r minhashes independently agrees w.p. s
    agree = rng.random((trials, b, r)) < s
    hit = agree.all(axis=2).any(axis=1).mean()
    assert abs(hit - collision_probability(s, b, r)) < 0.01


def test_plan_meets_both_gates():
    p = plan_bands(0.8, recall_target=0.95, noise_floor=0.3, fp_budget=0.01)
    assert isinstance(p, LSHPlan)
    assert p.bands * p.rows_per_band == p.num_perms
    assert collision_probability(0.8, p.bands, p.rows_per_band) >= 0.95
    assert collision_probability(0.3, p.bands, p.rows_per_band) <= 0.01
    assert p.recall_at_threshold >= 0.95
    assert p.fp_at_noise <= 0.01


def test_plan_is_cheapest():
    """No smaller perm budget admits any valid factorization."""
    p = plan_bands(0.8, recall_target=0.95, noise_floor=0.3, fp_budget=0.01)
    for perms in range(2, p.num_perms):
        for rows in range(1, perms + 1):
            if perms % rows:
                continue
            bands = perms // rows
            ok = (
                collision_probability(0.8, bands, rows) >= 0.95
                and collision_probability(0.3, bands, rows) <= 0.01
            )
            assert not ok, (perms, bands, rows)


def test_repo_default_satisfies_planner_gates():
    """The flagship's 16x8 @ threshold 0.8 sits inside the planner's
    feasible region at its documented operating point."""
    cfg = DedupConfig()
    rec = collision_probability(
        cfg.threshold, cfg.bands, cfg.rows_per_band
    )
    fp = collision_probability(0.3, cfg.bands, cfg.rows_per_band)
    assert rec >= 0.94  # LSH-miss bound; exact verify removes FPs
    assert fp <= 0.005


def test_plan_impossible_raises():
    with pytest.raises(ValueError):
        plan_bands(
            0.5, recall_target=0.999, noise_floor=0.45,
            fp_budget=1e-6, max_perms=64,
        )
    with pytest.raises(ValueError):
        plan_bands(0.5, noise_floor=0.6)  # floor above threshold
