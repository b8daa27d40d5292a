"""PII scrubbing: vectorized regex redaction over a text column.

The training-data analog of the reference's input normalization step
(there: vector normalization before hashing,
``/root/reference/nlsh/data.py:23-49``; here: web text must be scrubbed
of personal data before it is signed/deduped/packed). Everything runs
in Arrow's C++ RE2 kernels (``count_substring_regex`` +
``replace_substring_regex``) — zero Python per row, and because DuckDB's
``regexp_replace``/``regexp_extract_all`` are RE2 too, the whole scrub
is SQL-oracle-replayable bit-exactly.

Patterns are applied IN ORDER, each counted on the text state produced
by the previous replacement (an email's digits can otherwise be
double-counted by the phone pattern). The order and the patterns are
part of the operator's contract: callers that extend ``PII_PATTERNS``
get the same sequential semantics.

100-TB posture: stateless ``map_batches`` over the text column only —
no shuffle, no driver state; RE2 precompiles per process, so the
per-batch cost is a single linear scan per pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# (name, RE2 pattern, replacement token) — applied sequentially.
# RE2-only constructs (no backrefs / lookaround) so Arrow and DuckDB
# execute the identical automaton.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
)


def scrub_batch(texts) -> tuple[pa.Array, dict[str, np.ndarray]]:
    """Redact every ``PII_PATTERNS`` hit in a batch of texts.

    Returns ``(clean_text, counts)`` where ``counts[name][i]`` is the
    number of ``name``-pattern hits redacted from document i (counted
    just before that pattern's own replacement pass).
    """
    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    counts: dict[str, np.ndarray] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = (
            pc.count_substring_regex(arr, pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        arr = pc.replace_substring_regex(arr, pat, repl)
    return arr, counts


def pii_stage(
    docs: rd.Dataset, text_col: str = "text", keep_text: bool = True
) -> rd.Dataset:
    """``map_batches`` PII scrub: adds ``clean_text`` + per-pattern
    ``n_<name>`` count columns (drops the raw text unless asked)."""

    def fn(t: pa.Table) -> pa.Table:
        clean, counts = scrub_batch(t[text_col])
        cols: dict = {"doc_id": t["doc_id"]}
        if keep_text:
            cols[text_col] = t[text_col]
        for name, _, _ in PII_PATTERNS:
            cols[f"n_{name}"] = pa.array(counts[name])
        cols["clean_text"] = clean
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
