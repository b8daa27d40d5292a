"""LSH banding parameter planner.

Picks (bands b, rows-per-band r) for MinHash LSH given the dedup
threshold and operating constraints — the knob every
`DedupConfig(bands=, rows_per_band=)` user otherwise sets by folklore.
Standard S-curve analysis (Leskovec-Rajaraman-Ullman, MMDS ch.3): a
pair with Jaccard s collides in at least one band with probability

    P(s; b, r) = 1 - (1 - s^r)^b.

`plan_bands` searches every (b, r) factorization with b*r <= max_perms
and returns the cheapest plan (fewest permutations, then fewest bands
— bands are the shuffle fan-out: each doc emits b band keys, so b IS
the candidate-generation cost multiplier) that meets BOTH gates:

- recall gate: P(threshold) >= recall_target — pairs AT the dedup
  threshold are found with at least this probability; P is monotone
  increasing in s, so everything above threshold does at least as
  well. (The flagship pipeline verifies candidates exactly, so LSH
  misses are the ONLY recall loss — this gate bounds it end-to-end.)
- noise gate: P(noise_floor) <= fp_budget — pairs at the corpus's
  background similarity stay out of the candidate stream; candidate
  volume at 100 TB is n_pairs(noise) * P(noise), the term that
  decides whether verify is a trickle or an all-to-all storm.

Pure function of its arguments, no data touched: call it at plan time
and feed the result straight into DedupConfig. The repo default
(16 x 8 at threshold 0.8) is itself reproduced by the planner's gates
— pinned in tests.
"""

from __future__ import annotations

from dataclasses import dataclass


def collision_probability(s: float, bands: int, rows: int) -> float:
    """P(some band collides) for a pair with Jaccard similarity s."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"similarity out of range: {s}")
    return 1.0 - (1.0 - s**rows) ** bands


@dataclass(frozen=True)
class LSHPlan:
    bands: int
    rows_per_band: int
    num_perms: int
    recall_at_threshold: float
    fp_at_noise: float


def plan_bands(
    threshold: float,
    recall_target: float = 0.95,
    noise_floor: float = 0.3,
    fp_budget: float = 0.05,
    max_perms: int = 512,
) -> LSHPlan:
    """Cheapest (b, r) meeting the recall and noise gates (see module
    docstring). Raises if no plan within ``max_perms`` satisfies both —
    the honest answer when the gates are contradictory (e.g. threshold
    too close to the noise floor for any S-curve to separate them)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if noise_floor >= threshold:
        raise ValueError("noise_floor must lie below threshold")
    best: LSHPlan | None = None
    for perms in range(2, max_perms + 1):
        for rows in range(1, perms + 1):
            if perms % rows:
                continue
            bands = perms // rows
            rec = collision_probability(threshold, bands, rows)
            if rec < recall_target:
                continue
            fp = collision_probability(noise_floor, bands, rows)
            if fp > fp_budget:
                continue
            cand = LSHPlan(bands, rows, perms, rec, fp)
            if (
                best is None
                or (cand.num_perms, cand.bands) < (best.num_perms, best.bands)
            ):
                best = cand
        if best is not None and best.num_perms < perms:
            break  # perms only grows; the first full sweep past best wins
    if best is None:
        raise ValueError(
            f"no (bands, rows) plan within {max_perms} perms meets "
            f"recall>={recall_target} at s={threshold} AND "
            f"fp<={fp_budget} at s={noise_floor}"
        )
    return best
