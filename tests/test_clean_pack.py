"""PII scrub, decontamination, and sequence-packing stage tests."""

import numpy as np
import pyarrow as pa

from nlshray.stages.clean import PII_PATTERNS, scrub_batch
from nlshray.stages.decontam import batch_kgram_hashes


def test_scrub_batch_redacts_and_counts():
    texts = pa.array(
        [
            "mail me at jo.doe+x@foo-bar.org today",
            "call 555-123-4567 or 555 123 4567",
            "host 192.168.0.1 and 10.0.255.3",
            "clean text with no pii at all",
            "combo a@b.io then 555-000-1111 then 1.2.3.4",
        ]
    )
    clean, counts = scrub_batch(texts)
    got = clean.to_pylist()
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE>"
    assert got[2] == "host <IP> and <IP>"
    assert got[3] == "clean text with no pii at all"
    assert got[4] == "combo <EMAIL> then <PHONE> then <IP>"
    assert counts["email"].tolist() == [1, 0, 0, 0, 1]
    assert counts["phone"].tolist() == [0, 2, 0, 0, 1]
    assert counts["ipv4"].tolist() == [0, 0, 2, 0, 1]


def test_scrub_sequential_counting():
    # the email's digits must not double-count as phone/ip: each pattern
    # counts on the PREVIOUS pattern's output
    texts = pa.array(["reach 555-123-4567@mail.com here"])
    clean, counts = scrub_batch(texts)
    assert counts["email"].tolist() == [1]
    assert counts["phone"].tolist() == [0]
    assert counts["ipv4"].tolist() == [0]
    assert clean.to_pylist() == ["reach <EMAIL> here"]


def test_batch_kgram_hashes_strict():
    from nlshray.functions.shingles import tokenize
    from nlshray.hashing import hash_str_array, shingle_hashes

    texts = ["a b c d e", "one two", "", "p q r s t u v w x"]
    k = 4
    flat, lens = batch_kgram_hashes(pa.array(texts), k)
    # strict: <k tokens -> zero grams (no whole-doc fallback)
    assert lens.tolist() == [2, 0, 0, 6]
    # bit-identical to the scalar path
    expect = []
    for t in texts:
        toks = tokenize(t)
        if len(toks) >= k:
            th = hash_str_array(toks)
            expect.append(shingle_hashes(th, k))
    np.testing.assert_array_equal(flat, np.concatenate(expect))


def test_pack_sequences_matches_numpy(ray_session):
    import ray.data as rd

    from nlshray.stages.pack import pack_sequences

    rng = np.random.default_rng(7)
    n = 400
    texts = [" ".join(["tok"] * int(rng.integers(0, 40))) for _ in range(n)]
    ids = rng.permutation(n)  # arbitrary input order
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array([texts[i] for i in ids])})
    ).repartition(7)
    out = (
        pack_sequences(ds, seq_len=64, chunk_size=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_tok = np.array([len(t.split()) for t in texts], np.int64)
    start = np.cumsum(n_tok) - n_tok
    assert out["n_tokens"].tolist() == n_tok.tolist()
    assert out["start_tok"].tolist() == start.tolist()
    first = start // 64
    last = np.where(n_tok > 0, (start + np.maximum(n_tok, 1) - 1) // 64, first)
    assert out["first_seq"].tolist() == first.tolist()
    assert out["last_seq"].tolist() == last.tolist()
    assert (
        out["n_seqs"].to_numpy() == np.where(n_tok > 0, last - first + 1, 0)
    ).all()


def test_decontam_matches_bruteforce(ray_session):
    import ray.data as rd

    from nlshray.functions.shingles import tokenize
    from nlshray.stages.decontam import decontam_stage, eval_ngram_set

    k = 3
    corpus = [
        "alpha beta gamma delta epsilon",     # 0: eval
        "unrelated words entirely here now",  # 1
        "xx alpha beta gamma yy",             # 2: shares "alpha beta gamma"
        "beta gamma delta",                   # 3: shares (exactly k tokens)
        "alpha beta zeta",                    # 4: no shared 3-gram
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(5)), "text": pa.array(corpus)}
    )
    ds = rd.from_arrow(tbl).repartition(3)

    def is_eval(did):
        return did == 0

    eval_ds = ds.filter(lambda r: r["doc_id"] == 0)
    ev = eval_ngram_set(eval_ds, k)
    out = (
        decontam_stage(ds, ev, k, is_eval_fn=is_eval)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force on strings
    def grams(t):
        toks = tokenize(t)
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    ev_set = grams(corpus[0])
    for i in range(5):
        ov = len(grams(corpus[i]) & ev_set)
        assert out.loc[i, "n_overlap"] == ov, i
        assert out.loc[i, "contaminated"] == (ov > 0 and i != 0), i
    assert out["contaminated"].tolist() == [False, False, True, True, False]


def test_duplicate_span_stats(ray_session):
    """Hand-built corpus: shared 8-gram counted once per doc, short
    docs zero spans, parallelism-independent."""
    import pyarrow as pa
    import ray.data as rd

    from nlshray.stages.decontam import duplicate_span_stats

    shared = "a b c d e f g h"
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(
                [
                    f"{shared} i j",        # 3 spans, 1 shared
                    f"{shared} z z",        # 3 spans, 1 shared
                    "q w e r t y u i o p",  # 3 spans, 0 shared
                    "short doc",             # too short: 0 spans
                    f"x {shared}",          # 2 spans, 1 shared
                ],
                pa.string(),
            ),
        }
    )

    def run(nparts):
        out = pa.concat_tables(
            duplicate_span_stats(
                rd.from_arrow(t).repartition(nparts), k=8
            ).iter_batches(batch_format="pyarrow")
        ).sort_by("doc_id")
        return out["n_spans"].to_pylist(), out["n_dup_spans"].to_pylist()

    spans, dups = run(2)
    assert spans == [3, 3, 3, 0, 2]
    assert dups == [1, 1, 0, 0, 1]
    assert run(5) == (spans, dups)
