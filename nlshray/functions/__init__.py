"""Vectorized batch kernels (the engine's scalar-function library).

The reference's equivalent layer is its distance/loss zoo
(``/root/reference/nlsh/learning/distances.py``) — per-row math, batch
vectorized. Ours: shingling, MinHash, SimHash, Jaccard estimates, text
statistics. Everything here is numpy-over-Arrow-batch; no Ray imports.
"""
