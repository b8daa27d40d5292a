"""Text-analysis stages: language-ID, quality scoring, token counts,
fingerprints — actor-pool ``map_batches`` over the documents table.

The stateful-class shape follows ST1 (SURVEY.md §2.3): profiles/regexes
are built once per actor in ``__init__``; batches stream through
``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.functions.textstats import batch_textstats


class TextAnalyzer:
    """Per-doc quality features + language guess + fingerprint.

    One vectorized kernel per batch (Arrow RE2 counts + segmented
    numpy); bit-identical to the scalar ``quality_features`` /
    ``detect_lang`` / ``doc_fingerprint`` reference functions (tested)."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = batch_textstats(batch["text"])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_chars": pa.array(f["n_chars"], pa.int64()),
                "n_tokens": pa.array(f["n_tokens"], pa.int64()),
                "n_ws_tokens": pa.array(f["n_ws_tokens"], pa.int64()),
                "n_pieces": pa.array(f["n_pieces"], pa.int64()),
                "mean_token_len": pa.array(f["mean_token_len"], pa.float64()),
                "punct_ratio": pa.array(f["punct_ratio"], pa.float64()),
                "stop_ratio": pa.array(f["stop_ratio"], pa.float64()),
                "digit_ratio": pa.array(f["digit_ratio"], pa.float64()),
                "quality": pa.array(f["quality"], pa.float64()),
                "lang_guess": pa.array(f["lang_guess"].tolist(), pa.string()),
                "fingerprint": pa.array(f["fingerprint"], pa.int64()),
            }
        )


def textstats_stage(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    batch_size: int = 1024,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return docs.select_columns([id_col, "text"]).map_batches(
        TextAnalyzer,
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
