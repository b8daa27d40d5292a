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

from nlshray.functions.textstats import (
    detect_lang,
    doc_fingerprint,
    piece_token_count,
    quality_features,
    whitespace_token_count,
)


class TextAnalyzer:
    """Per-doc quality features + language guess + fingerprint."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        feats = [quality_features(t) for t in texts]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_chars": pa.array([f["n_chars"] for f in feats], pa.int64()),
                "n_tokens": pa.array([f["n_tokens"] for f in feats], pa.int64()),
                "n_ws_tokens": pa.array(
                    [whitespace_token_count(t) for t in texts], pa.int64()
                ),
                "n_pieces": pa.array(
                    [piece_token_count(t) for t in texts], pa.int64()
                ),
                "mean_token_len": pa.array(
                    [f["mean_token_len"] for f in feats], pa.float64()
                ),
                "punct_ratio": pa.array(
                    [f["punct_ratio"] for f in feats], pa.float64()
                ),
                "stop_ratio": pa.array(
                    [f["stop_ratio"] for f in feats], pa.float64()
                ),
                "digit_ratio": pa.array(
                    [f["digit_ratio"] for f in feats], pa.float64()
                ),
                "quality": pa.array([f["quality"] for f in feats], pa.float64()),
                "lang_guess": pa.array(
                    [detect_lang(t) for t in texts], pa.string()
                ),
                "fingerprint": pa.array(
                    [doc_fingerprint(t) for t in texts], pa.int64()
                ),
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
