"""Pipeline configuration.

The reference scatters its knobs across argparse defaults
(``/root/reference/main.py:266-371``: hash_size=12, batch 1024/4096, k=10)
and env-var registries (``main.py:31-54``). We centralise them in one
frozen dataclass so a config hash can fingerprint checkpoint manifests.

Defaults follow the mandated dedup config: k=5 word shingles, 128
permutations, LSH banding b=16 × r=8, Jaccard threshold 0.8.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    seed: int = 42

    # --- shingling / signatures ---
    shingle_k: int = 5            # word-shingle width
    num_perms: int = 128          # MinHash permutations (sig length)
    # signature kernel: "minhash" = 128-pass permutation MinHash (the
    # oracle-replayable default); "oph" = one-permutation hashing with
    # rotation densification (ONE hash pass; the 100-TB sign-stage plan —
    # same signature shape and slot-match Jaccard estimator, ~num_perms×
    # less hash compute, slightly higher variance on short docs)
    signer: str = "minhash"
    bands: int = 16               # LSH bands (b)
    rows_per_band: int = 8        # sig slots per band (r); b*r == num_perms
    threshold: float = 0.8        # Jaccard threshold for a confirmed dup pair

    # verify stage: pairs whose *estimated* Jaccard lies inside
    # [exact_lo, exact_hi] are re-checked with exact shingle Jaccard
    # (descendant of the reference's exact-distance re-rank,
    # /root/reference/nlsh/indexer.py:84-95). Below exact_lo: rejected;
    # above exact_hi: accepted on the estimate alone.
    exact_lo: float = 0.60
    exact_hi: float = 0.95

    # --- skew handling (hot LSH bands) ---
    # buckets larger than group_cap don't emit O(n^2) pairs; policy:
    #  "star": min-id hub edges (O(n), connectivity-preserving)
    #  "salt": deterministic salted sub-buckets of <= group_cap members,
    #          full pairs within each + hub links between sub-buckets
    #          (O(n*cap), preserves connectivity AND local pair density)
    # forgone-pair counts are reported either way, never silent.
    group_cap: int = 512
    skew_policy: str = "star"

    # --- execution ---
    batch_size: int = 4096        # rows per UDF batch (reference hashes in
                                  # 4096-row batches: nlsh/indexer.py:40)
    sign_batch_size: int = 1024   # text-heavy batches are smaller
    num_cpus: int | None = None   # per-stage override; None = Ray default

    # --- clustering ---
    # driver-side union-find is used when confirmed pairs <= this count;
    # beyond it, distributed min-label propagation rounds take over.
    max_driver_pairs: int = 5_000_000

    # --- corpus-beyond-plasma auto-dispatch ---
    # dedup_docs pins the hashed corpus in the object store by default
    # (fastest at plasma-resident sizes). When the estimated corpus
    # bytes exceed this fraction of the node's plasma budget, it
    # auto-selects the text-store plan (corpus persisted once as
    # Parquet, consumers do pruned reads) the same way max_driver_pairs
    # gates driver-side union-find. 0 disables the auto gate; an
    # explicit text_store_dir argument always wins.
    text_store_auto_fraction: float = 0.5
    # plasma budget override in bytes for the gate (tests mock it);
    # 0 = read object_store_memory from ray.cluster_resources().
    text_store_plasma_budget: int = 0

    extra: dict = field(default_factory=dict, compare=False)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perms ({self.num_perms})"
            )
        if self.signer not in ("minhash", "oph"):
            raise ValueError(f"unknown signer {self.signer!r}")

    def config_hash(self) -> str:
        """Stable fingerprint used in checkpoint manifests.

        Folds in ``_KERNEL_VERSION`` so checkpoints written by an older
        hash/ID kernel invalidate cleanly — config fields alone cannot
        see a code-level change to doc ids, text hashes or signatures,
        and resuming across one would silently mix ID spaces.
        """
        d = asdict(self)
        d.pop("extra", None)
        d.pop("num_cpus", None)   # parallelism must not change results
        d["_kernel_version"] = _KERNEL_VERSION
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


# bump whenever a deterministic kernel changes its outputs:
#   1 = blake2b era (round 1)
#   2 = poly_fold hash kernels (round 2)
#   3 = ASCII-unified tokenizer + dual-hash exact groups (round 3)
_KERNEL_VERSION = 3
