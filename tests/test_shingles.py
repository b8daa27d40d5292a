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


def test_vectorized_matches_slow_reference():
    """The batch kernel (Arrow split + segmented polynomial fold) must
    equal a per-doc pure-python fold of the same spec, byte for byte."""
    import numpy as np

    from nlshray.functions.shingles import _EMPTY_SENTINEL
    from nlshray.hashing import _POLY, _seed_mix, splitmix64

    def slow_token_hash(tok, seed=0):
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in tok.encode("utf-8"):
                acc = acc * _POLY + np.uint64(b)
            return splitmix64(np.array([acc ^ _seed_mix(seed)]))[0]

    def slow_doc_shingles(text, k, seed=0):
        toks = tokenize(text)
        if not toks:
            return np.array([_EMPTY_SENTINEL], dtype=np.uint64)
        th = np.array([slow_token_hash(t, seed) for t in toks], np.uint64)

        def fold(window):
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for x in window:
                    acc = acc * _POLY + x
            return splitmix64(np.array([acc]))[0]

        if len(th) < k:
            return np.array([fold(th)], np.uint64)
        return np.array(
            [fold(th[j : j + k]) for j in range(len(th) - k + 1)], np.uint64
        )

    texts = [
        "The quick, BROWN fox! jumps over the lazy dog",
        "",
        "   \n\t ",
        "a b c",
        "one",
        "repeat token " * 30,
        "word" + "x" * 200 + " tail tokens here now five six seven",
        "punct,,,;;; !!! mixed 123 numbers_under_score and MORE",
    ]
    flat, lengths = batch_shingle_hashes(texts, 5, seed=3)
    off = 0
    for t, ln in zip(texts, lengths):
        want = slow_doc_shingles(t, 5, seed=3)
        assert want.shape[0] == ln
        assert (flat[off : off + ln] == want).all(), repr(t[:40])
        off += ln


def test_scalar_batch_tokenizer_agree_non_ascii():
    """Scalar tokenize() and the batch RE2 tokenizer share ONE ASCII
    token definition — de/fr text must produce identical token hashes
    in both paths (a divergence here silently changes query semantics
    across size-routing boundaries)."""
    from nlshray.functions.shingles import batch_token_hashes
    from nlshray.hashing import hash_str_array

    texts = [
        "Über die Brücke: größere Straßen führen östlich.",
        "Le cœur à l'épreuve — déjà vu, naïveté, garçon!",
        "mixed ascii und ünïcödé tokens",
        "日本語のテキスト with ascii islands",
    ]
    flat, counts = batch_token_hashes(texts, seed=0)
    off = 0
    for t, c in zip(texts, counts):
        toks = tokenize(t)
        assert len(toks) == c, (t, toks, c)
        want = hash_str_array(toks) if toks else np.empty(0, np.uint64)
        assert (flat[off : off + c] == want).all(), t
        off += c
