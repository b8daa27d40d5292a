"""Batch textstats kernel == scalar reference functions, bit for bit.

Corpus contract (SURVEY.md §1.2 / shingles._SPLIT_PATTERN): ASCII web
text — the RE2 ASCII character classes used by the batch kernel equal
python's unicode re classes on this data. n_chars and fingerprints are
unicode-exact regardless.
"""

import numpy as np
import pyarrow.parquet as pq

from nlshray.functions.textstats import (
    batch_textstats,
    detect_lang,
    doc_fingerprint,
    piece_token_count,
    quality_features,
    whitespace_token_count,
)

EDGE = [
    "",
    " \n\t ",
    "a",
    "1234 5678 !!!",
    "the of and to in is that it for was " * 3,
    "der die und das ist nicht ein eine mit von " * 2,
    "le la les et de des en un une est pour que",
    "x" * 300,
    "short, text. with; punct!?" ,
]


def _assert_rows_equal(f, texts):
    for i, x in enumerate(texts):
        q = quality_features(x)
        assert int(f["n_chars"][i]) == int(q["n_chars"]), (i, "n_chars")
        assert int(f["n_tokens"][i]) == int(q["n_tokens"]), (i, "n_tokens")
        assert float(f["mean_token_len"][i]) == q["mean_token_len"], i
        assert float(f["punct_ratio"][i]) == q["punct_ratio"], i
        assert float(f["stop_ratio"][i]) == q["stop_ratio"], i
        assert float(f["digit_ratio"][i]) == q["digit_ratio"], i
        assert float(f["quality"][i]) == q["quality"], i
        assert int(f["n_ws_tokens"][i]) == whitespace_token_count(x), i
        assert int(f["n_pieces"][i]) == piece_token_count(x), i
        assert f["lang_guess"][i] == detect_lang(x), (i, "lang")
        assert int(f["fingerprint"][i]) == doc_fingerprint(x), (i, "fp")


def test_batch_matches_scalar_edge_cases():
    _assert_rows_equal(batch_textstats(EDGE), EDGE)


def test_batch_matches_scalar_on_corpus():
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    texts = t["text"].to_pylist()
    _assert_rows_equal(batch_textstats(t["text"]), texts)


def test_unicode_exact_fields():
    """n_chars (codepoints) and fingerprints (raw bytes) hold beyond
    ASCII even though tokenization is ASCII-classed by contract."""
    texts = ["ünïcödé tëst", "日本語のテキスト"]
    f = batch_textstats(texts)
    for i, x in enumerate(texts):
        assert int(f["n_chars"][i]) == len(x)
        assert int(f["fingerprint"][i]) == doc_fingerprint(x)


def test_batch_matches_scalar_non_ascii():
    """de/fr/cjk text: scalar and batch kernels share ASCII character
    classes, so every stat agrees beyond ASCII too (the advisor found
    an 18-vs-24 token divergence here in round 2)."""
    texts = [
        "Über die Brücke und der Weg: größere Straßen führen östlich.",
        "Le cœur à l'épreuve — déjà vu, naïveté, garçon!",
        "a b nbsp separated words",
        "    leading unicode space",
        "日本語のテキスト 123 mixed",
    ]
    _assert_rows_equal(batch_textstats(texts), texts)


def test_token_repetition_matches_scalar_counter():
    """Repetition signals vs a collections.Counter reference on the
    same tokenizer (Gopher §A1.1 duplicate-token / top-1-gram rules)."""
    from collections import Counter

    import numpy as np

    from nlshray.functions.shingles import tokenize
    from nlshray.stages.textstats import token_repetition_arrays

    texts = [
        "spam spam spam spam eggs",
        "every token here is unique today",
        "",
        "    \t  ",
        "a a a a a a a a",
        "Mixed CASE mixed case MIXED case",
        "x",
    ]
    f = token_repetition_arrays(texts)
    for i, t in enumerate(texts):
        c = Counter(tokenize(t))
        n = sum(c.values())
        assert f["n_tokens"][i] == n, (i, t)
        assert f["n_distinct_tokens"][i] == len(c), (i, t)
        assert f["max_token_count"][i] == (max(c.values()) if c else 0)
        exp_dup = 1.0 - len(c) / n if n else 0.0
        exp_top = max(c.values()) / n if c else 0.0
        assert np.isclose(f["dup_token_frac"][i], exp_dup)
        assert np.isclose(f["top_token_frac"][i], exp_top)
        toks = tokenize(t)
        bc = Counter(zip(toks, toks[1:]))
        nb = sum(bc.values())
        assert f["n_bigrams"][i] == nb, (i, t)
        assert f["n_distinct_bigrams"][i] == len(bc)
        exp_bdup = 1.0 - len(bc) / nb if nb else 0.0
        exp_btop = max(bc.values()) / nb if bc else 0.0
        assert np.isclose(f["dup_bigram_frac"][i], exp_bdup)
        assert np.isclose(f["top_bigram_frac"][i], exp_btop)


def test_token_repetition_empty_batch():
    from nlshray.stages.textstats import token_repetition_arrays

    f = token_repetition_arrays([])
    assert f["n_tokens"].shape == (0,)


def test_token_entropy_known_values(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import token_entropy

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a a a a", "a b c d", "a a b b", "...!!!"]
            ),  # H: 0, 2, 1, (no tokens -> dropped)
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        token_entropy(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    assert list(got.index) == [1, 2, 3]
    assert got.loc[1].entropy == 0.0 and got.loc[1].n_tokens == 4
    assert got.loc[2].entropy == 2.0
    assert got.loc[3].entropy == 1.0


def test_gopher_rule_arrays_known_values():
    import pyarrow as pa

    from nlshray.stages.textstats import gopher_rule_arrays

    r = gopher_rule_arrays(
        pa.array(["the fast key... # of the", "", "a bb ccc 12"])
    )
    assert r["n_words"].tolist() == [5, 0, 4]
    assert r["mean_word_len"].tolist() == [3.0, 0.0, 8 / 4]
    # '12' has no alphabetic character
    assert r["frac_alpha_words"].tolist() == [1.0, 0.0, 0.75]
    assert r["n_stop_hits"].tolist() == [3, 0, 0]  # the, of, the
    assert r["symbol_ratio"].tolist() == [2 / 5, 0.0, 0.0]


def test_gopher_quality_filter_flags(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import gopher_quality_filter

    rng = np.random.default_rng(5)
    vocab = ["the", "of", "and", "data", "merge", "sort", "join", "scan"]
    texts = [
        " ".join(rng.choice(vocab, 80)),  # should pass every gate
        "short doc",  # fails ok_words
        " ".join(["the"] * 80),  # fails repetition (top_token_frac 1.0)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        gopher_quality_filter(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[2].ok_words == 0 and got.loc[2].keep == 0
    assert got.loc[3].ok_repetition == 0 and got.loc[3].keep == 0
    assert got.loc[1].keep == 1
