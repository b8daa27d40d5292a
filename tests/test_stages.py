"""Stage-level tests under a live Ray session (SURVEY.md §5)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from nlshray.config import DedupConfig
from nlshray.pipelines.dedup import to_arrow
from nlshray.stages.band import band_stage
from nlshray.stages.exact import exact_map, exact_stage, reps_only
from nlshray.stages.extract import extract_stage
from nlshray.stages.pairs import candidate_pairs_stage
from nlshray.stages.sign import MinHashSigner, numpy_to_sigs, sigs_to_numpy, sign_stage

CFG = DedupConfig()


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_extract_stage(ray_session, tiny_fixture):
    pages = tiny_fixture["pages"]
    docs = to_arrow(extract_stage(rd.from_arrow(pages)))
    assert docs.num_rows == pages.num_rows
    got = dict(zip(docs["url"].to_pylist(), docs["text"].to_pylist()))
    want = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    assert got == want  # byte-identical text per url
    assert "html" not in docs.schema.names  # wide column dropped


def test_exact_stage_rep_semantics(ray_session):
    ds = _docs([(30, "same text"), (10, "same text"), (20, "other text")])
    out = to_arrow(exact_stage(ds))
    rows = {
        r["doc_id"]: (r["rep_id"], r["n_copies"])
        for r in out.to_pylist()
    }
    assert rows[30] == (10, 2)  # min doc_id is the rep
    assert rows[10] == (10, 2)
    assert rows[20] == (20, 1)
    reps = to_arrow(reps_only(exact_stage(ds)))
    assert sorted(reps["doc_id"].to_pylist()) == [10, 20]
    em = to_arrow(exact_map(exact_stage(ds)))
    assert em.schema.names == ["doc_id", "rep_id"]


def test_signer_class_direct():
    """Actor __init__ exceptions surface late — smoke the class directly
    (ray_guide pitfall)."""
    signer = MinHashSigner(CFG)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d e f g h", "a b c d e f g h"], pa.string()),
        }
    )
    out = signer(batch)
    assert out["sig"].type == pa.binary(CFG.num_perms * 8)
    sigs = sigs_to_numpy(out["sig"], CFG.num_perms)
    assert (sigs[0] == sigs[1]).all()  # identical text -> identical sig


def test_sig_roundtrip():
    m = np.arange(256, dtype=np.uint64).reshape(2, 128)
    assert (sigs_to_numpy(numpy_to_sigs(m), 128) == m).all()


def test_sign_and_band_stages(ray_session):
    ds = _docs([(1, "w1 w2 w3 w4 w5 w6 w7 w8"), (2, "different words entirely here now ok fine yes")])
    sigs = sign_stage(ds, CFG)
    bands = to_arrow(band_stage(sigs, CFG))
    assert bands.num_rows == 2 * CFG.bands
    assert set(bands.schema.names) == {"band_idx", "band_hash", "doc_id"}
    per_doc = bands.group_by("doc_id").aggregate([("band_idx", "count")])
    assert per_doc["band_idx_count"].to_pylist() == [CFG.bands, CFG.bands]


def test_candidate_pairs_grouping_golden(ray_session):
    """Descendant of the reference's test_build_index golden
    (nlsh/tests/test_indexer.py:6-26): hand band rows -> exact pair set."""
    bands = rd.from_arrow(
        pa.table(
            {
                "band_idx": pa.array([0, 0, 0, 1, 1, 0], pa.int16()),
                "band_hash": pa.array([100, 100, 100, 200, 200, 300], pa.int64()),
                "doc_id": pa.array([1, 2, 3, 1, 2, 9], pa.int64()),
            }
        )
    )
    pairs_ds, stats = candidate_pairs_stage(bands, CFG, num_partitions=4)
    pairs = to_arrow(pairs_ds)
    got = {
        (l, r): n
        for l, r, n in zip(
            pairs["left_id"].to_pylist(),
            pairs["right_id"].to_pylist(),
            pairs["n_bands"].to_pylist(),
        )
    }
    # bucket 100 -> (1,2),(1,3),(2,3); bucket 200 -> (1,2) again; 300 -> none
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    assert stats.n_buckets_hot == 2
    assert stats.max_bucket == 3


def test_candidate_pairs_cap_star_edges(ray_session):
    cfg = DedupConfig(group_cap=4)
    n = 10
    bands = rd.from_arrow(
        pa.table(
            {
                "band_idx": pa.array([0] * n, pa.int16()),
                "band_hash": pa.array([7] * n, pa.int64()),
                "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
            }
        )
    )
    pairs_ds, stats = candidate_pairs_stage(bands, cfg, num_partitions=4)
    pairs = to_arrow(pairs_ds)
    # star around min id: n-1 edges, all from doc 1
    assert pairs.num_rows == n - 1
    assert set(pairs["left_id"].to_pylist()) == {1}
    assert stats.n_capped_buckets == 1
    assert stats.pairs_forgone == (n * (n - 1) // 2) - (n - 1)


def test_candidate_pairs_salt_policy(ray_session):
    """Salt policy: sub-bucket pair emission with connectivity preserved."""
    cfg = DedupConfig(group_cap=4, skew_policy="salt")
    n = 12
    bands = rd.from_arrow(
        pa.table(
            {
                "band_idx": pa.array([0] * n, pa.int16()),
                "band_hash": pa.array([7] * n, pa.int64()),
                "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
            }
        )
    )
    pairs_ds, stats = candidate_pairs_stage(bands, cfg, num_partitions=4)
    pairs = to_arrow(pairs_ds)
    # more pairs than star (n-1), far fewer than full C(n,2)
    assert n - 1 <= pairs.num_rows < n * (n - 1) // 2
    assert stats.n_capped_buckets == 1
    # connectivity: one component over the emitted edges
    from nlshray.state.unionfind import UnionFind

    uf = UnionFind()
    for l, r in zip(pairs["left_id"].to_pylist(), pairs["right_id"].to_pylist()):
        uf.union(l, r)
    assert len(set(uf.labels(list(range(1, n + 1))))) == 1
    # deterministic
    pairs2 = to_arrow(candidate_pairs_stage(bands, cfg, num_partitions=4)[0])
    assert pairs.sort_by([("left_id", "ascending"), ("right_id", "ascending")]).equals(
        pairs2.sort_by([("left_id", "ascending"), ("right_id", "ascending")])
    )


def test_candidate_pairs_boundary_cap_multiblock(ray_session):
    """One hot band_hash spread over several input blocks: driver
    shipping is capped (VERDICT r1 #4) yet connectivity holds and the
    stitched bucket size stays EXACT via per-block unique counts."""
    cfg = DedupConfig(group_cap=4)
    n = 30
    tables = [
        pa.table(
            {
                "band_idx": pa.array([0] * 10, pa.int16()),
                "band_hash": pa.array([7] * 10, pa.int64()),
                "doc_id": pa.array(list(range(lo, lo + 10)), pa.int64()),
            }
        )
        for lo in (1, 11, 21)
    ]
    bands = rd.from_arrow(tables)
    pairs_ds, stats = candidate_pairs_stage(bands, cfg, num_partitions=4)
    pairs = to_arrow(pairs_ds)
    # exact size accounting despite capped shipping
    assert stats.max_bucket == n
    assert stats.n_capped_buckets == 1
    # capped emission: far fewer than C(30,2)=435 pairs
    assert pairs.num_rows < 3 * n
    # single component over the emitted edges
    from nlshray.state.unionfind import UnionFind

    uf = UnionFind()
    for l, r in zip(pairs["left_id"].to_pylist(), pairs["right_id"].to_pylist()):
        uf.union(l, r)
    assert len(set(uf.labels(list(range(1, n + 1))))) == 1


def test_exact_stage_hot_hash_multiblock(ray_session):
    """A single text duplicated across blocks: the distributed exact
    plan must aggregate boundary runs (one row per block edge) and still
    produce exact group sizes."""
    rows = [(i, "same text" if i % 3 == 0 else f"unique {i}") for i in range(60)]
    ds = _docs(rows)
    out = to_arrow(exact_stage(ds, driver_merge_limit=0))
    import collections

    dup = [r for r in out.to_pylist() if r["text"] == "same text"]
    assert len(dup) == 20
    reps = {r["rep_id"] for r in dup}
    assert reps == {0}
    assert all(r["n_copies"] == 20 for r in dup)
    uniq = [r for r in out.to_pylist() if r["text"] != "same text"]
    assert all(r["rep_id"] == r["doc_id"] and r["n_copies"] == 1 for r in uniq)


def test_attach_rep_second_hash_verification():
    """A text_hash-only collision (second hash disagrees) must NOT merge:
    the colliding doc stays its own representative (recall loss is
    acceptable; silently dropping a non-duplicate is not)."""
    import ray

    from nlshray.stages.exact import _attach_rep

    # group key 5: rep doc 1 with verification hash 99, copies 3.
    map_ref = ray.put(
        (
            np.array([5], np.int64),
            np.array([1], np.int64),
            np.array([3], np.int64),
            np.array([99], np.int64),
        )
    )
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text_hash": pa.array([5, 5, 5, 8], pa.int64()),
            "text_hash2": pa.array([99, 99, 77, 1], pa.int64()),
        }
    )
    out = _attach_rep(batch, map_ref=map_ref)
    rows = {
        r["doc_id"]: (r["rep_id"], r["n_copies"]) for r in out.to_pylist()
    }
    assert rows[1] == (1, 3)       # true member
    assert rows[2] == (1, 3)       # true member
    assert rows[3] == (3, 1)       # fold collision: NOT merged
    assert rows[4] == (4, 1)       # not in any group


def test_exact_stage_dual_hash_end_to_end(ray_session):
    """Identical texts still merge through both plans with the dual-hash
    group map (the verification hash must agree for real duplicates)."""
    rows = [(i, f"text {i % 4}") for i in range(1, 25)]
    for kwargs in ({}, {"driver_merge_limit": 0}):
        out = to_arrow(exact_stage(_docs(rows), **kwargs))
        got = {r["doc_id"]: r["rep_id"] for r in out.to_pylist()}
        for i in range(1, 25):
            assert got[i] == 1 + (i - 1) % 4, (kwargs, i)


def test_extract_batched_kernel_byte_identical():
    """VERDICT r2 #6: the concatenated-buffer extraction kernel must be
    byte-identical to per-doc extract_text on well-formed html AND on
    adversarial tag soup (dangling <p>, nesting, split entities, bad
    utf-8, boundary traps)."""
    import random

    from nlshray.stages.extract import _extract_texts_batched, extract_text

    cases = [
        b"<p>a", b"<p>b</p>", b"", b"<p>x</p><p>dangling",
        b"no paras at all", b"<p>ent &amp; x &lt;tag&gt;</p><p>two</p>",
        b"<p>almost</p", b"><p>lead</p>", b"<p>&am</p><p>p;</p>",
        "<p>unicode éß</p>".encode(), b"<p>bad \xff bytes</p>",
        b"<p>nested <p>inner</p> tail</p>", b"</p>close<p>q</p>",
        b"<p></p>", b"<p>", b"</p>", b"<p><p><p>deep</p>", b"xxx", b"<",
    ]
    got = _extract_texts_batched(pa.array(cases, pa.binary()))
    assert got == [extract_text(h) for h in cases]

    random.seed(1)
    frags = [b"<p>", b"</p>", b"<p", b"p>", b"&amp;", b"txt ",
             b"\xc3\xa9", b"\xff", b"\n"]
    fuzz = [
        b"".join(random.choice(frags) for _ in range(random.randint(0, 30)))
        for _ in range(500)
    ]
    got = _extract_texts_batched(pa.array(fuzz, pa.binary()))
    assert got == [extract_text(h) for h in fuzz]


def test_token_frequency_spectrum_mass_and_parallelism(ray_session):
    """Spectrum mass equals totals: sum(c * n_tokens) = total token
    occurrences, sum(n_tokens) = distinct tokens; identical at any
    partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.stages.spectrum import token_frequency_spectrum

    rng = np.random.default_rng(13)
    vocab = np.array(["w%d" % i for i in range(50)])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 60)))
        for _ in range(300)
    ]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = token_frequency_spectrum(rd.from_arrow(t)).to_pandas()
    toks = np.concatenate([s.split() for s in texts])
    uniq, cnts = np.unique(toks, return_counts=True)
    assert int((got["occur_count"] * got["n_tokens"]).sum()) == len(toks)
    assert int(got["n_tokens"].sum()) == len(uniq)
    occ, freq = np.unique(cnts, return_counts=True)
    assert got["occur_count"].tolist() == occ.tolist()
    assert got["n_tokens"].tolist() == freq.tolist()

    got2 = token_frequency_spectrum(
        rd.from_arrow(t).repartition(11)
    ).to_pandas()
    assert got.equals(got2)
