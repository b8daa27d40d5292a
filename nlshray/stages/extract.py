"""HTML -> text extraction + doc identity.

First transform of the dedup pipeline (SURVEY.md §7.1 step 2): pages
(url, warc_ts, html, lang) -> docs (doc_id, url, warc_ts, text, lang,
n_chars). The extraction is a pure function of the html bytes — no
library dependence — so the per-url byte-identical-text invariant
(BASELINE.json input_hint) is checkable against the fixture truth.

The wide ``html`` binary column is dropped here, immediately after use
(SURVEY.md §7.4.5): every downstream shuffle moves ids + signatures,
never pages.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pyarrow as pa

import ray.data

from nlshray.hashing import doc_ids_from_urls

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def extract_text(html_bytes: bytes) -> str:
    """Deterministic extraction: <p> bodies, entity-unescaped, joined
    with blank lines. Exactly inverts ``nlshray.fixtures.text_to_html``."""
    paras = _P_RE.findall(html_bytes)
    return "\n\n".join(_htmlmod.unescape(p.decode("utf-8", "replace")) for p in paras)


def _extract_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    texts = [extract_text(h) for h in batch["html"].to_pylist()]
    ids = doc_ids_from_urls(urls)
    text_arr = pa.array(texts, pa.string())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": text_arr,
            "lang": batch["lang"],
            "n_chars": pa.compute.utf8_length(text_arr).cast(pa.int64()),
        }
    )


def extract_stage(pages: ray.data.Dataset, *, batch_size: int = 1024) -> ray.data.Dataset:
    """pages -> docs. Stateless tasks; html-heavy batches kept small so a
    batch x concurrency fits worker heaps at 100 TB block sizes."""
    return pages.map_batches(
        _extract_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
