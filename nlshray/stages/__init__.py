"""Ray Data pipeline stages.

Each stage is a function ``Dataset -> Dataset`` built from ``map_batches``
(zero-copy Arrow) / ``groupby`` / ``join``; stateful stages are callable
classes run as actor pools (reference pattern ST1, SURVEY.md §2.3).
No stage materializes the full dataset; wide steps and their shuffle keys
are documented per SURVEY.md §7.3.
"""
