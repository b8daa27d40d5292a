"""nlshray — a Ray-Data-native near-duplicate detection + clustering engine.

Built from scratch with the query/data-processing capabilities of the
reference repo ``stegben/neural-locality-sensitive-hashing`` (a single-GPU
neural-LSH ANN codebase; see SURVEY.md), re-expressed as an idiomatic
``ray.data.Dataset`` DAG: ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, groupby/sort shuffles for the wide steps.

Core pipeline (MinHash/LSH near-dup over Common-Crawl-style pages):

    pages → extract text → exact-dup pre-pass → MinHash signatures
          → LSH banding → candidate pairs (grouped shuffle, skew-capped)
          → verify (sig-estimated + exact Jaccard) → connected components
          → clusters

plus the surrounding toolbox a 100 TB training-data pipeline needs:
SimHash, exact dedup, brute-force / LSH ANN over embeddings, text quality
stats, language-ID, fingerprinting, and multimodal plumbing stubs.
"""

from nlshray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
