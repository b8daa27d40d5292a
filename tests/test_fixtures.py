"""Fixture-generator invariants (FIXTURES.md §1-3)."""

import numpy as np
import pyarrow as pa

from nlshray.config import DedupConfig
from nlshray.fixtures import compute_true_pairs, generate_pages
from nlshray.stages.extract import extract_text


def test_deterministic():
    a = generate_pages(200, seed=42)
    b = generate_pages(200, seed=42)
    assert a.equals(b)
    c = generate_pages(200, seed=43)
    assert not a.equals(c)


def test_schema_and_urls():
    t = generate_pages(50, seed=42)
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t["url"][0].as_py() == "https://site0.example/p/0"
    assert t["warc_ts"].type == pa.timestamp("us")
    assert t["html"].type == pa.binary()


def test_html_extraction_byte_identical(tiny_fixture):
    """The per-url invariant from BASELINE.json input_hint."""
    pages = tiny_fixture["pages"]
    for h, txt in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text(h) == txt


def test_planted_structure(tiny_fixture):
    pages = tiny_fixture["pages"]
    tp = tiny_fixture["true_pairs"]
    texts = pages["text"].to_pylist()
    # skew probe: one boilerplate text on ~5% of docs
    from collections import Counter

    top = Counter(texts).most_common(1)[0]
    assert top[1] >= int(0.04 * len(texts))
    # planted dup pairs exist, including non-exact ones
    j = tp["jaccard"].to_numpy()
    dup = tp["is_dup"].to_numpy(zero_copy_only=False)
    assert dup.sum() > 50
    assert ((j >= 0.8) & (j < 1.0)).sum() > 5     # near dups below exact
    assert ((j > 0.15) & (j < 0.6)).sum() > 5     # hard negatives present
    # canonical ordering
    assert (tp["left_id"].to_numpy() < tp["right_id"].to_numpy()).all()


def test_true_pairs_match_config_threshold(tiny_fixture):
    tp = tiny_fixture["true_pairs"]
    cfg: DedupConfig = tiny_fixture["cfg"]
    j = tp["jaccard"].to_numpy()
    dup = tp["is_dup"].to_numpy(zero_copy_only=False)
    assert ((j >= cfg.threshold) == dup).all()


def test_true_clusters_labels_are_min_ids(tiny_fixture):
    tc = tiny_fixture["true_clusters"]
    doc = tc["doc_id"].to_numpy()
    lab = tc["cluster_id"].to_numpy()
    assert (lab <= doc).all()
    # every label is itself a member of its cluster
    by_label = {}
    for d, l in zip(doc.tolist(), lab.tolist()):
        by_label.setdefault(l, []).append(d)
    for l, members in by_label.items():
        assert min(members) == l
