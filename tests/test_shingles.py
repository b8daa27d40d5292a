import numpy as np

from nlshray.functions.shingles import (
    batch_shingle_hashes,
    doc_shingle_hashes,
    exact_jaccard,
    tokenize,
)


def test_tokenize_golden():
    assert tokenize("The quick, BROWN fox!") == ["the", "quick", "brown", "fox"]
    assert tokenize("") == []
    assert tokenize("  \n\t ") == []


def test_doc_shingles_counts():
    text = " ".join(f"w{i}" for i in range(10))
    assert doc_shingle_hashes(text, 5).shape == (6,)
    # short doc -> one whole-doc shingle
    assert doc_shingle_hashes("a b c", 5).shape == (1,)
    # empty doc -> sentinel shingle, shared by all empty docs
    e1, e2 = doc_shingle_hashes("", 5), doc_shingle_hashes("   ", 5)
    assert e1.shape == (1,) and e1[0] == e2[0]


def test_unique_flag():
    text = "a b a b a b a b a b a b"
    multi = doc_shingle_hashes(text, 2)
    uniq = doc_shingle_hashes(text, 2, unique=True)
    assert multi.shape[0] > uniq.shape[0]
    assert set(uniq.tolist()) == set(multi.tolist())


def test_batch_layout_matches_per_doc():
    texts = ["a b c d e f", "", "x y"]
    flat, lengths = batch_shingle_hashes(texts, 3)
    assert lengths.tolist() == [4, 1, 1]
    off = 0
    for t, ln in zip(texts, lengths):
        single = doc_shingle_hashes(t, 3)
        assert (flat[off : off + ln] == single).all()
        off += ln


def test_exact_jaccard_goldens():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert exact_jaccard(a, b) == 2 / 6
    assert exact_jaccard(a, a) == 1.0
    assert exact_jaccard(a, np.array([9], dtype=np.uint64)) == 0.0
