"""Operator-stage tests: ANN, SimHash, textstats, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from nlshray.config import DedupConfig
from nlshray.functions.simhash import hamming_distance, simhash_text
from nlshray.functions.textstats import (
    detect_lang,
    doc_fingerprint,
    quality_features,
    whitespace_token_count,
)
from nlshray.metrics import recall_at_k
from nlshray.pipelines.dedup import to_arrow
from nlshray.stages.ann import (
    embedding_near_dup,
    knn_bruteforce,
    knn_lsh,
    normalize_embeddings,
)
from nlshray.stages.multimodal import MediaDecoder, decode_stage, sniff_format
from nlshray.stages.simhash import simhash_dedup

CFG = DedupConfig()
SF = "/root/testdata/sf0.001"


# ---------------- textstats ----------------

def test_whitespace_token_count():
    assert whitespace_token_count("a b  c") == 3
    assert whitespace_token_count("  ") == 0
    assert whitespace_token_count("") == 0


def test_quality_features_shape():
    f = quality_features("The quick brown fox jumps over the lazy dog. " * 10)
    assert f["n_tokens"] == 90
    assert 0 < f["quality"] <= 1
    assert 0 <= f["stop_ratio"] <= 1


def test_detect_lang():
    en = "the cat and the dog are in the house with all of them"
    de = "der hund und die katze sind in dem haus mit der frau"
    fr = "le chat et le chien sont dans la maison avec les enfants"
    assert detect_lang(en) == "en"
    assert detect_lang(de) == "de"
    assert detect_lang(fr) == "fr"
    assert detect_lang("") == "und"


def test_fingerprint_stability():
    t = "some document text for fingerprinting purposes here"
    assert doc_fingerprint(t) == doc_fingerprint(t)
    assert doc_fingerprint(t) != doc_fingerprint("entirely other words here")
    assert 0 <= doc_fingerprint("x") < 2**63


# ---------------- simhash ----------------

def test_simhash_similarity_preserving():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base + "tail words"
    far = "completely different content about astronomy physics " * 10
    h = np.array([simhash_text(base)], dtype=np.uint64)
    hn = np.array([simhash_text(near)], dtype=np.uint64)
    hf = np.array([simhash_text(far)], dtype=np.uint64)
    assert hamming_distance(h, hn)[0] < hamming_distance(h, hf)[0]
    assert simhash_text(base) == simhash_text(base)


def test_simhash_dedup_stage(ray_session):
    # vocabulary-rich docs (simhash margins need many distinct tokens;
    # tiny vocabularies make bit votes degenerate)
    rng = np.random.default_rng(3)
    words = [f"tok{i}{c}" for i, c in enumerate("abcdefghij" * 12)]
    base_words = list(rng.choice(words, size=150))
    near_words = base_words.copy()
    near_words[10] = "changedword"
    other_words = list(rng.choice([w + "x" for w in words], size=150))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        " ".join(base_words),
                        " ".join(near_words),
                        " ".join(other_words),
                    ],
                    pa.string(),
                ),
            }
        )
    )
    pairs = to_arrow(simhash_dedup(docs, max_hamming=3, num_partitions=4))
    got = set(
        zip(pairs["left_id"].to_pylist(), pairs["right_id"].to_pylist())
    )
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


# ---------------- ANN ----------------

def _emb_ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet")


def _query(ds, n=3):
    import pyarrow.compute as pc

    rows = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return q, np.array([r["vec_id"] for r in rows], dtype=np.int64)


def test_knn_bruteforce_exact(ray_session):
    ds = _emb_ds()
    q, qids = _query(ds)
    out = to_arrow(knn_bruteforce(ds, q, qids, k=5))
    assert out.num_rows == 15
    # matches a numpy oracle
    ids, m = [], []
    for r in ds.take_all():
        ids.append(r["vec_id"])
        m.append(r["embedding"])
    ids = np.array(ids)
    m = np.array(m, dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ m.T
    for qi, qid in enumerate(qids):
        s = sims[qi].copy()
        s[ids == qid] = -np.inf
        want = set(ids[np.argsort(-s)[:5]].tolist())
        got = set(
            out.filter(
                pa.compute.equal(out["query_id"], int(qid))
            )["neighbor_id"].to_pylist()
        )
        assert got == want


def test_knn_lsh_recall_floor(ray_session):
    ds = _emb_ds()
    q, qids = _query(ds)
    bf = to_arrow(knn_bruteforce(ds, q, qids, k=10))
    lsh = to_arrow(knn_lsh(ds, q, qids, k=10, n_planes=8, multiprobe=3))
    recalls = []
    for qid in qids:
        want = bf.filter(pa.compute.equal(bf["query_id"], int(qid)))[
            "neighbor_id"
        ].to_numpy()
        got = lsh.filter(pa.compute.equal(lsh["query_id"], int(qid)))[
            "neighbor_id"
        ].to_numpy()
        recalls.append(recall_at_k(want, got))
    # near-random embeddings: theory-bounded, not near-1 (queries.py note)
    assert float(np.mean(recalls)) >= 0.2


def test_embedding_near_dup_strategies_agree_on_high_threshold(ray_session):
    ds = _emb_ds()
    bf = to_arrow(embedding_near_dup(ds, threshold=0.4, strategy="bruteforce"))
    bf_pairs = set(zip(bf["left_id"].to_pylist(), bf["right_id"].to_pylist()))
    lsh = to_arrow(
        embedding_near_dup(ds, threshold=0.4, strategy="lsh", n_planes=6)
    )
    lsh_pairs = set(
        zip(lsh["left_id"].to_pylist(), lsh["right_id"].to_pylist())
    )
    # lsh finds a subset of the exact pairs
    assert lsh_pairs <= bf_pairs
    assert (bf["left_id"].to_numpy() < bf["right_id"].to_numpy()).all()


def test_normalize_embeddings_unit(ray_session):
    ds = _emb_ds()
    out = normalize_embeddings(ds, mode="unit")
    row = out.take(1)[0]
    assert abs(np.linalg.norm(row["embedding"]) - 1.0) < 1e-5


def test_normalize_embeddings_zscore(ray_session):
    ds = _emb_ds()
    out = normalize_embeddings(ds, mode="zscore")
    m = np.array([r["embedding"] for r in out.take_all()], dtype=np.float64)
    assert np.abs(m.mean(axis=0)).max() < 1e-4
    assert np.abs(m.std(axis=0) - 1).max() < 1e-3


# ---------------- multimodal ----------------

def test_sniff_format():
    assert sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert sniff_format(b"\xff\xd8\xffxxx") == "jpeg"
    assert sniff_format(b"<html><body>") == "html"
    assert sniff_format(b"garbage") == "unknown"


def test_decoder_stub_raises_without_fake():
    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode(b"payload")


def test_decode_stage_plumbing(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(
                    [b"\x89PNG\r\n\x1a\n" + b"a" * 50, b"\xff\xd8\xff" + b"b" * 99],
                    pa.binary(),
                ),
            }
        )
    )
    out = to_arrow(decode_stage(ds, fake=True, feature_dim=8))
    assert out.column_names == ["item_id", "n_bytes", "format", "features"]
    assert out["format"].to_pylist() == ["png", "jpeg"]
    assert out["n_bytes"].to_pylist() == [58, 102]
    feats = out["features"].combine_chunks()
    assert len(feats[0]) == 8
    # deterministic across runs
    out2 = to_arrow(decode_stage(ds, fake=True, feature_dim=8))
    assert out.equals(out2)


# ---------------- real library-free codecs ----------------

def test_wav_roundtrip_and_features():
    from nlshray.functions.media import audio_features, decode_wav, encode_wav

    t = np.linspace(0, 1, 16000, endpoint=False)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = encode_wav(sig, 16000)
    assert sniff_format(data) == "wav"
    out, rate = decode_wav(data)
    assert rate == 16000
    # 16-bit quantization + 32767/32768 scale asymmetry
    np.testing.assert_allclose(out, sig, atol=1 / 12000)
    f = audio_features(out, n_windows=8)
    assert f.shape == (8,)
    # constant-amplitude sine: every window RMS ~ 0.5/sqrt(2)
    np.testing.assert_allclose(f, 0.5 / np.sqrt(2), atol=0.01)


def test_bmp_ppm_roundtrip_and_resize():
    from nlshray.functions.media import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert sniff_format(encode_bmp(img)) == "bmp"
    assert sniff_format(encode_ppm(img)) == "ppm"
    small = resize_nearest(img, 3, 2)
    assert small.shape == (3, 2, 3)
    big = resize_nearest(img, 14, 10)
    assert (resize_nearest(big, 7, 5) == img).all()  # exact 2x inverse


def test_decode_stage_real_formats(ray_session):
    """wav/bmp/ppm payloads decode for REAL (no fake flag) while a jpeg
    in the same batch still requires the stub."""
    from nlshray.functions.media import encode_bmp, encode_ppm, encode_wav

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    sig = (0.25 * np.sin(np.linspace(0, 50, 800))).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [encode_wav(sig), encode_bmp(img), encode_ppm(img)],
                    pa.binary(),
                ),
            }
        )
    )
    out = to_arrow(decode_stage(ds, fake=False, feature_dim=10))
    assert out["format"].to_pylist() == ["wav", "bmp", "ppm"]
    feats = out["features"].combine_chunks()
    assert all(len(feats[i]) == 10 for i in range(3))
    # same image through bmp and ppm yields identical features
    assert feats[1].values.to_pylist() == feats[2].values.to_pylist()


def test_resize_stage(ray_session):
    from nlshray.functions.media import decode_ppm, encode_bmp
    from nlshray.stages.multimodal import resize_stage

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    ds = rd.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(
                    [encode_bmp(img), b"\xff\xd8\xff" + b"j" * 20], pa.binary()
                ),
            }
        )
    )
    out = to_arrow(resize_stage(ds, out_h=4, out_w=4))
    assert out["resized"].to_pylist() == [True, False]
    resized = decode_ppm(out["payload"].combine_chunks()[0].as_py())
    assert resized.shape == (4, 4, 3)


def test_simhash_batch_matches_scalar():
    from nlshray.functions.simhash import simhash_batch, simhash_text

    texts = [
        "the cat sat on the mat",
        "",
        "   ",
        "one",
        "repeat repeat repeat distinct words here",
        "The Cat SAT on, the mat!",
    ]
    got = simhash_batch(texts, seed=5)
    want = np.array([simhash_text(t, seed=5) for t in texts], dtype=np.uint64)
    assert (got == want).all()


def test_hamming_u64_matches_bin():
    from nlshray.stages.ann import _hamming_u64

    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 62, size=7).astype(np.int64)
    b = rng.integers(0, 1 << 62, size=9).astype(np.int64)
    got = _hamming_u64(a, b)
    for i in range(7):
        for j in range(9):
            assert got[i, j] == bin(int(a[i]) ^ int(b[j])).count("1")


def test_knn_lsh_prunes_and_matches_mask_after_score(ray_session):
    """VERDICT r2 #2: the bucketed member must (a) return the same top-k
    as the old mask-after-score formulation and (b) actually score a
    strict subset of the corpus (the index saves FLOPs)."""
    from nlshray.stages.ann import (
        _l2norm,
        _hamming_u64,
        hyperplane_buckets,
        make_planes,
    )

    ds = _emb_ds()
    q, qids = _query(ds)
    n_planes, multiprobe, k = 8, 1, 5
    lsh = to_arrow(
        knn_lsh(ds, q, qids, k=k, n_planes=n_planes, multiprobe=multiprobe)
    )

    # inline mask-after-score oracle (the round-2 semantics)
    ids, m = [], []
    for r in ds.take_all():
        ids.append(r["vec_id"])
        m.append(r["embedding"])
    ids = np.array(ids, dtype=np.int64)
    m = np.array(m, dtype=np.float64)
    planes = make_planes(n_planes, m.shape[1], 42)
    qn = _l2norm(q.copy())
    pmask = _hamming_u64(
        hyperplane_buckets(qn, planes), hyperplane_buckets(m, planes)
    ) <= multiprobe
    sims = np.where(pmask, qn @ _l2norm(m.copy()).T, -np.inf)
    sims = np.where(ids[None, :] == qids[:, None], -np.inf, sims)
    frac = pmask.any(axis=0).mean()
    assert frac < 0.9, f"no pruning happened (candidate fraction {frac})"
    for qi, qid in enumerate(qids):
        s = sims[qi]
        order = np.lexsort((ids, -s))[:k]
        want = [int(ids[o]) for o in order if s[o] > -np.inf]
        sel = lsh.filter(pa.compute.equal(lsh["query_id"], int(qid)))
        got = sel["neighbor_id"].to_pylist()
        assert sorted(got) == sorted(want), (qid, got, want)


def test_embedding_novelty_brute_vs_manual(ray_session):
    """embedding_novelty (brute plan) == manual any-hit filter; the LSH
    plan returns a superset (misses only lose filtering, never novel
    docs) and agrees exactly when every near pair shares a bucket."""
    from nlshray.stages.ann import embedding_novelty

    ds = _emb_ds()
    tbl = to_arrow(ds)
    ids = tbl["vec_id"].to_numpy()
    M = np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()])
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    seen_m, new_m = ids % 2 == 0, ids % 2 == 1
    import pyarrow as pa_
    import ray.data as rd_

    seen = rd_.from_arrow(tbl.filter(pa_.array(seen_m)))
    new = rd_.from_arrow(tbl.filter(pa_.array(new_m)))
    thr = 0.4
    sims = M[new_m] @ M[seen_m].T
    manual = set(ids[new_m][~(sims >= thr).any(axis=1)].tolist())

    bf = to_arrow(embedding_novelty(new, seen, thr, strategy="bruteforce"))
    assert set(bf["vec_id"].to_pylist()) == manual

    lsh = to_arrow(
        embedding_novelty(new, seen, thr, strategy="lsh", n_planes=6)
    )
    assert set(lsh["vec_id"].to_pylist()) >= manual  # recall-safe direction


def test_embedding_novelty_empty_seen(ray_session):
    from nlshray.stages.ann import embedding_novelty

    ds = _emb_ds()
    tbl = to_arrow(ds)
    import pyarrow as pa_
    import ray.data as rd_

    empty = rd_.from_arrow(tbl.slice(0, 0))
    out = to_arrow(embedding_novelty(ds, empty, 0.4, strategy="bruteforce"))
    assert out.num_rows == tbl.num_rows


def test_png_roundtrip_all_filters():
    from nlshray.functions.media import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(5, 7), (6, 4, 3), (3, 9, 4)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for f in range(5):
            assert np.array_equal(
                decode_png(encode_png(img, filter_type=f)), img
            ), (shape, f)


def test_png_palette_and_corruption():
    import struct
    import zlib

    from nlshray.functions.media import MediaFormatError, decode_png, encode_png

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got.shape == (2, 2, 3) and tuple(got[0, 1]) == (0, 255, 0)
    # a flipped bit anywhere fails the CRC, never returns wrong pixels
    bad = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
    bad[-5] ^= 1
    with pytest.raises(MediaFormatError):
        decode_png(bytes(bad))


def test_png_through_media_decoder():
    from nlshray.functions.media import encode_png, image_features

    img = np.random.default_rng(3).integers(0, 256, (8, 6, 3)).astype(np.uint8)
    dec = MediaDecoder(fake=False, feature_dim=8)
    feats = dec._decode(encode_png(img, filter_type=2))
    assert np.allclose(feats, image_features(img, bins=6))


def test_gif_roundtrip_and_decoder():
    from nlshray.functions.media import (
        MediaFormatError,
        decode_gif,
        encode_gif,
        image_features,
    )

    rng = np.random.default_rng(5)
    for ncolor in (4, 200):
        colors = rng.integers(0, 256, (ncolor, 3)).astype(np.uint8)
        img = colors[rng.integers(0, ncolor, (23, 17))]
        for il in (False, True):
            assert np.array_equal(
                decode_gif(encode_gif(img, interlace=il)), img
            ), (ncolor, il)
    # LZW table hits 4096 -> clear/reset path
    colors = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    big = colors[rng.integers(0, 256, (80, 90))]
    gif = encode_gif(big)
    assert np.array_equal(decode_gif(gif), big)
    # decoder stage consumes it
    dec = MediaDecoder(fake=False, feature_dim=8)
    assert np.allclose(dec._decode(gif), image_features(big, bins=6))
    with pytest.raises(MediaFormatError):
        decode_gif(b"GIF89a" + b"\x00" * 4)


def test_resize_stage_png_gif(ray_session):
    import ray

    from nlshray.functions.media import (
        decode_ppm,
        encode_gif,
        encode_png,
        resize_nearest,
    )
    from nlshray.stages.multimodal import resize_stage

    rng = np.random.default_rng(11)
    colors = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    img = colors[rng.integers(0, 16, (9, 7))]
    gray = rng.integers(0, 256, (6, 5)).astype(np.uint8)
    ds = rd.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [encode_png(img, filter_type=1), encode_gif(img),
                     encode_png(gray)],
                    pa.binary(),
                ),
            }
        )
    )
    out = pa.concat_tables(
        ray.get(resize_stage(ds, out_h=4, out_w=4).to_arrow_refs())
    ).sort_by("item_id")
    assert out["resized"].to_pylist() == [True, True, True]
    want = resize_nearest(img, 4, 4)
    for i in (0, 1):
        got = decode_ppm(out["payload"][i].as_py())
        assert np.array_equal(got, want)
    got_gray = decode_ppm(out["payload"][2].as_py())
    assert np.array_equal(got_gray[:, :, 0], resize_nearest(gray, 4, 4))


def test_resize_and_decode_robust_to_bad_payloads(ray_session):
    """Unsupported variants/truncated containers pass through the
    resizer (resized=False) and fall to stub features in the decoder —
    never a crashed Ray task (code-review findings r4)."""
    import struct
    import zlib

    import ray

    from nlshray.functions.media import decode_ppm, encode_gif, resize_nearest
    from nlshray.stages.multimodal import resize_stage

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    # interlaced PNG: valid container, variant decode_png refuses
    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00ab\x00cd"))
        + chunk(b"IEND", b"")
    )
    gray = np.arange(30, dtype=np.uint8).reshape(6, 5)
    pgm = f"P5 5 6 255\n".encode() + gray.tobytes()
    truncated_gif = encode_gif(np.zeros((4, 4, 3), np.uint8))[:14]
    ds = rd.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [interlaced, pgm, truncated_gif], pa.binary()
                ),
            }
        )
    )
    out = pa.concat_tables(
        ray.get(resize_stage(ds, out_h=3, out_w=3).to_arrow_refs())
    ).sort_by("item_id")
    assert out["resized"].to_pylist() == [False, True, False]
    got = decode_ppm(out["payload"][1].as_py())
    assert np.array_equal(got[:, :, 0], resize_nearest(gray, 3, 3))
    # decoder: same payloads fall through to deterministic stub features
    dec = MediaDecoder(fake=True, feature_dim=4)
    for p in (interlaced, truncated_gif):
        assert dec._decode(p).shape == (4,)


def test_band_stats_matches_bruteforce(ray_session):
    """band_stats (LSH collision diagnostics) == a driver-side numpy
    recompute from the same signatures, and every band sees every rep."""
    import numpy as np
    import pyarrow as pa

    from nlshray.hashing import MASK63, band_hashes
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.pipelines.queries import CFG, NPARTS, QUERIES, _pq
    from nlshray.stages.exact import exact_stage
    from nlshray.stages.sign import sign_stage, sigs_to_numpy

    sf = "/root/testdata/sf0.001"
    got = to_arrow(QUERIES["band_stats"](sf)).sort_by("band")
    assert got["band"].to_pylist() == list(range(CFG.bands))

    docs = _pq(sf, "documents", columns=["doc_id", "text"])
    rep = to_arrow(exact_stage(docs, num_partitions=NPARTS))
    rep = rep.filter(
        pa.compute.equal(rep["doc_id"], rep["rep_id"])
    ).select(["doc_id", "text"])
    import ray.data as rd

    sigs = to_arrow(sign_stage(rd.from_arrow(rep), CFG))
    m = sigs_to_numpy(sigs["sig"], CFG.num_perms)
    bh = (band_hashes(m, CFG.bands, CFG.rows_per_band) & np.uint64(MASK63)).astype(
        np.int64
    )
    n_reps = m.shape[0]
    assert got["n_docs"].to_pylist() == [n_reps] * CFG.bands
    for b in range(CFG.bands):
        _, cnt = np.unique(bh[:, b], return_counts=True)
        assert got["n_buckets"][b].as_py() == cnt.size
        assert got["max_bucket"][b].as_py() == int(cnt.max())
        assert got["n_cand_pairs"][b].as_py() == int((cnt * (cnt - 1) // 2).sum())


def test_gram_frequency_stats_matches_bruteforce(ray_session):
    """token-bigram rarity == a whole-corpus numpy recompute, including
    short-doc zeros and the hapax/repeated split."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.pipelines.dedup import to_arrow
    from nlshray.stages.decontam import batch_kgram_hashes, gram_frequency_stats

    texts = [
        "alpha beta gamma alpha beta",   # repeats "alpha beta" bigram
        "alpha beta delta",              # shares "alpha beta"
        "zeta",                          # 1 token -> 0 bigrams
        "",                              # empty -> 0 bigrams
        "unique words only here now",
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    got = (
        to_arrow(gram_frequency_stats(rd.from_arrow(t).repartition(3), k=2))
        .sort_by("doc_id")
    )

    flat, lens = batch_kgram_hashes(t["text"], 2)
    _, inv, cnt = np.unique(flat, return_inverse=True, return_counts=True)
    occ_cnt = cnt[inv]
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    for i in range(5):
        sl = slice(starts[i], starts[i] + lens[i])
        assert got["n_grams"][i].as_py() == int(lens[i])
        assert got["freq_sum"][i].as_py() == int(occ_cnt[sl].sum())
        assert got["n_hapax"][i].as_py() == int((occ_cnt[sl] == 1).sum())
    # doc 0's "alpha beta" occurs 3x corpus-wide (twice in doc0, once in doc1)
    assert got["n_grams"].to_pylist()[2:4] == [0, 0]
    assert got["freq_sum"][0].as_py() > got["n_grams"][0].as_py()


def test_semantic_dup_pairs_kmeans_semdedup(ray_session):
    """SemDeDup member: within-cluster pairs are a subset of brute-force
    pairs, find every planted near-dup on clustered geometry, and the
    output is parallelism-independent (hash-sampled fit + fixed-iter
    Lloyd => same centroids regardless of partitioning)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nlshray.fixtures import generate_embeddings
    from nlshray.pipelines.dedup import to_arrow
    from nlshray.stages.ann import embedding_near_dup

    X = generate_embeddings(480, n_clusters=8)
    rng = np.random.default_rng(7)
    dups = X[:40] + 0.02 * rng.standard_normal((40, X.shape[1]))
    M = np.vstack([X, dups])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(M)), pa.int64()),
            "embedding": pa.array(
                [list(r) for r in M], pa.list_(pa.float64())
            ),
        }
    )

    def pairs(ds, **kw):
        got = to_arrow(embedding_near_dup(ds, threshold=0.95, **kw))
        return set(
            zip(got["left_id"].to_pylist(), got["right_id"].to_pylist())
        )

    brute = pairs(rd.from_arrow(t).repartition(4), strategy="bruteforce")
    km = pairs(
        rd.from_arrow(t).repartition(4),
        strategy="kmeans", n_clusters=8, fit_sample_frac=0.5,
    )
    assert len(brute) == 40          # exactly the planted dups
    assert km <= brute
    assert len(km) / len(brute) >= 0.95
    km2 = pairs(
        rd.from_arrow(t).repartition(9),
        strategy="kmeans", n_clusters=8, fit_sample_frac=0.5,
    )
    assert km == km2


def test_source_similarity_known_overlap(ray_session, tmp_path):
    """source_similarity on a hand-built corpus with known vocabulary
    overlaps: srcA={a,b,c}, srcB={b,c,d}, srcC={x}. Jaccard(A,B)=2/4,
    (A,C)=(B,C)=0; duplicate tokens within/across docs of one source
    must not inflate set sizes."""
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import source_similarity

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a b c", "b c b", "b c d d", "x x"]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["srcA", "srcA", "srcB", "srcC"]),
            "n_chars": pa.array([5, 5, 7, 3], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = source_similarity(str(tmp_path))
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in got.to_pylist()
    }
    assert set(rows) == {("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")}
    ab = rows[("srcA", "srcB")]
    assert ab["n_common"] == 2 and ab["n_union"] == 4
    assert ab["jaccard_ppm"] == 500_000
    assert rows[("srcA", "srcC")]["n_common"] == 0
    assert rows[("srcB", "srcC")]["n_union"] == 4  # {b,c,d} U {x}


def test_heavy_hitter_tokens_cms_exact(ray_session):
    """CountMin candidate pass + exact second pass: output equals a
    direct count at any sketch width — including w=64, where every
    cell collides and the sketch passes nearly the whole vocabulary
    through (the exact pass must still filter it to the true set) —
    and is independent of block layout."""
    from collections import Counter

    from nlshray.stages.heavy import heavy_hitter_tokens

    rng = np.random.default_rng(11)
    vocab = [f"w{i:04d}" for i in range(3000)]
    docs = []
    for i in range(300):
        toks = list(rng.choice(vocab, size=40))
        if i % 3 == 0:
            toks += ["hot_alpha"] * 5
        if i % 5 == 0:
            toks += ["hot_beta"] * 4
        docs.append(" ".join(toks))
    truth = Counter()
    for dtext in docs:
        truth.update(dtext.split())
    thr = 60
    want = sorted(
        ((n, t) for t, n in truth.items() if n >= thr),
        key=lambda x: (-x[0], x[1]),
    )
    assert len(want) >= 2  # both planted heavies survive the threshold
    t = pa.table({"text": pa.array(docs, pa.string())})
    for width in (1 << 14, 64):
        got = heavy_hitter_tokens(
            rd.from_arrow(t).repartition(7), threshold=thr, w=width
        ).take_all()
        assert [(r["n"], r["tok"]) for r in got] == want, width
    got2 = heavy_hitter_tokens(
        rd.from_arrow(t).repartition(2), threshold=thr
    ).take_all()
    assert [(r["n"], r["tok"]) for r in got2] == want


def test_cross_near_dups_equals_union_plan(ray_session):
    """Decontamination join: the probe-bucket-broadcast plan must equal
    the semantic definition — run the flagship dedup over the UNION and
    keep cross-side pairs expanded through the exact-dup rep map. Also:
    planted exact and near cross dups are found, and the result is
    independent of block layout."""
    from collections import defaultdict

    from nlshray.pipelines.dedup import dedup_docs
    from nlshray.stages.crossdup import cross_near_dups

    cfg = DedupConfig()
    rng = np.random.default_rng(23)
    vocab = [f"tok{i}" for i in range(400)]
    corpus = [" ".join(rng.choice(vocab, 60)) for _ in range(120)]
    corpus[11] = corpus[3]  # corpus-internal exact dup group
    probes = []
    probes.append(corpus[3])                       # exact cross dup (x2 members)
    near = corpus[7].split()
    near[0] = "CHANGED"
    probes.append(" ".join(near))                  # near cross dup
    probes.append(" ".join(rng.choice(vocab, 60))) # unrelated
    texts = corpus + probes
    ids = list(range(len(texts)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "is_probe": pa.array([i >= len(corpus) for i in ids]),
        }
    )

    got_t = to_arrow(
        cross_near_dups(rd.from_arrow(t).repartition(5), cfg)
    )
    got = set(
        zip(got_t["corpus_id"].to_pylist(), got_t["probe_id"].to_pylist())
    )

    # semantic definition: union dedup + cross-side expansion
    res = dedup_docs(
        rd.from_arrow(t.select(["doc_id", "text"])), cfg, num_partitions=4
    )
    docs_rep = to_arrow(res.docs)
    members = defaultdict(list)
    for d, r in zip(
        docs_rep["doc_id"].to_pylist(), docs_rep["rep_id"].to_pylist()
    ):
        members[r].append(d)
    is_probe = {i: i >= len(corpus) for i in ids}
    want = set()
    for r, mem in members.items():  # exact cross: within one text group
        cs = [m for m in mem if not is_probe[m]]
        ps = [m for m in mem if is_probe[m]]
        want.update((c, p) for c in cs for p in ps)
    pairs_t = to_arrow(res.pairs)
    for a, b in zip(
        pairs_t["left_id"].to_pylist(), pairs_t["right_id"].to_pylist()
    ):
        for ra, rb in ((a, b), (b, a)):
            cs = [m for m in members[ra] if not is_probe[m]]
            ps = [m for m in members[rb] if is_probe[m]]
            want.update((c, p) for c in cs for p in ps)
    assert got == want
    # planted dups found: exact pair for both members of the dup group,
    # near pair for the perturbed probe
    p_exact, p_near = len(corpus), len(corpus) + 1
    assert (3, p_exact) in got and (11, p_exact) in got
    assert (7, p_near) in got
    assert not any(p == len(corpus) + 2 for _, p in got)  # unrelated clean

    # block-layout independence
    got2_t = to_arrow(cross_near_dups(rd.from_arrow(t).repartition(2), cfg))
    assert got_t.equals(got2_t)


def test_collocations_pmi_known_values(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import collocations_pmi

    # "a b" x6 within docs, plus filler; bigrams never cross docs
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(
                [
                    "a b a b a b c",
                    "a b a b a b d",
                    "c d c d c d c d c",
                    "x",
                ]
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        collocations_pmi(str(tmp_path), min_count=5)
        .to_pandas()
        .sort_values(["word_a", "word_b"])
        .reset_index(drop=True)
    )
    # corpus: tokens a=6,b=6,c=6,d=5,x=1 (n_tok=24); bigram instances:
    # doc0 6, doc1 6, doc2 8 -> n_bg=20; "a b" 6, "d c" 4, "c d" 5 ...
    ab = got[(got.word_a == "a") & (got.word_b == "b")].iloc[0]
    assert ab.n_ab == 6 and ab.n_a == 6 and ab.n_b == 6
    want = np.log((6 / 20.0) / ((6 / 24.0) * (6 / 24.0)))
    assert ab.pmi == np.round(want * 1e6) / 1e6
    assert (got.n_ab >= 5).all()

    # deterministic across re-runs (fresh Dataset, fresh exchange)
    got2 = (
        collocations_pmi(str(tmp_path), min_count=5)
        .to_pandas()
        .sort_values(["word_a", "word_b"])
        .reset_index(drop=True)
    )
    assert got.equals(got2)


def test_source_divergence_jsd_known_values(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import source_divergence_jsd

    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["a a b", "a a b", "c c d", "a b c d"]),
            "source": pa.array(["s1", "s1", "s2", "s3"]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        source_divergence_jsd(str(tmp_path))
        .to_pandas()
        .set_index(["src_a", "src_b"])
        .sort_index()
    )
    assert len(got) == 3  # 3 source pairs

    def jsd(p, q):
        m = (p + q) / 2
        terms = []
        for d, x in ((p, p), (q, q)):
            with np.errstate(divide="ignore", invalid="ignore"):
                v = np.where(d > 0, d * np.log(d / m), 0.0)
            terms.append(v)
        return 0.5 * terms[0].sum() + 0.5 * terms[1].sum()

    # vocab order a,b,c,d; s1=[4,2,0,0]/6, s2=[0,0,2,1]/3, s3=[1,1,1,1]/4
    p1 = np.array([4, 2, 0, 0]) / 6
    p2 = np.array([0, 0, 2, 1]) / 3
    p3 = np.array([1, 1, 1, 1]) / 4
    for (a, b), want in ((("s1", "s2"), jsd(p1, p2)),
                         (("s1", "s3"), jsd(p1, p3)),
                         (("s2", "s3"), jsd(p2, p3))):
        # micro-nat per-term quantization: within 1 micro-nat per token
        assert abs(got.loc[(a, b)].jsd - want) < 5e-6, (a, b)
    # disjoint supports (s1 vs s2) hit the ln(2) ceiling
    assert abs(got.loc[("s1", "s2")].jsd - np.log(2)) < 5e-6


def test_dsir_resampled_prefers_target_like_docs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import dsir_resampled

    # target slice (src0) speaks {alpha,beta}; the crawl (srcZ) speaks
    # {gamma,delta}; two crawl docs written in the target vocabulary
    # must score > 0 and pure-crawl docs must not.
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta alpha beta alpha", "src0"))
    for i in range(20, 60):
        rows.append((i, "gamma delta gamma delta gamma", "srcZ"))
    rows.append((100, "alpha beta alpha alpha beta", "srcZ"))
    rows.append((101, "beta alpha beta beta alpha", "srcZ"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        dsir_resampled(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    assert got.loc[100].selected == 1 and got.loc[101].selected == 1
    assert got.loc[100].dsir_micro > 0
    crawl = got.loc[20:60]
    assert (crawl.selected == 0).all()
    assert (crawl.dsir_micro < 0).all()
    assert (got.n_feats == 5).all()


def test_user_retention_cohorts_known_values(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import user_retention_cohorts

    def ts(day, h=12):
        return np.datetime64(f"2024-01-{day:02d}T{h:02d}:00:00", "us")

    # u1 joins day 1, active days 1,2,3; u2 joins day 2, active 2;
    # u3 joins day 1 (evening), active 1 and 3
    rows = [
        (1, ts(1)), (1, ts(2)), (1, ts(3)), (1, ts(3, 14)),
        (2, ts(2)), (2, ts(2, 15)),
        (3, ts(1, 20)), (3, ts(3)),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        user_retention_cohorts(str(tmp_path))
        .to_pandas()
        .set_index(["cohort_day", "day"])
        .sort_index()
    )
    want = {
        ("2024-01-01", "2024-01-01"): 2,  # u1, u3
        ("2024-01-01", "2024-01-02"): 1,  # u1
        ("2024-01-01", "2024-01-03"): 2,  # u1, u3
        ("2024-01-02", "2024-01-02"): 1,  # u2
    }
    assert len(got) == len(want)
    for k, v in want.items():
        assert got.loc[k].n_users == v, k


def test_mixture_weights_rebalances(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import mixture_weights

    # big source 90% of tokens, small source 10%: alpha<1 must boost
    # the small one (boost > 1) and damp the big one (boost < 1)
    rows = [(i, "tok " * 9, "big") for i in range(90)]
    rows += [(100 + i, "tok " * 9, "small") for i in range(10)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1].strip() for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = mixture_weights(str(tmp_path)).to_pandas().set_index("source")
    assert abs(got.weight.sum() - 1.0) < 1e-5
    assert got.loc["small"].boost > 1.0 > got.loc["big"].boost
    assert got.loc["big"].n_tokens == 90 * 9


def test_events_markov_transitions_known_values(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import events_markov_transitions

    def ts(i):
        return np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(i, "m")

    # u1: a->b->a ; u2: a->b  =>  a->b n=2 P=1.0 ; b->a n=1 P=1.0
    rows = [(1, 1, ts(0), "a"), (2, 1, ts(1), "b"), (3, 1, ts(2), "a"),
            (4, 2, ts(0), "a"), (5, 2, ts(1), "b")]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        events_markov_transitions(str(tmp_path))
        .to_pandas()
        .set_index(["from_type", "to_type"])
        .sort_index()
    )
    assert len(got) == 2
    assert got.loc[("a", "b")].n == 2 and got.loc[("a", "b")].prob == 1.0
    assert got.loc[("b", "a")].n == 1 and got.loc[("b", "a")].prob == 1.0


def test_source_token_entropy_known_values(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import source_token_entropy

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d", "a a a a"]),
            "source": pa.array(["uni", "const"]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = source_token_entropy(str(tmp_path)).to_pandas().set_index("source")
    # uniform over 4 tokens -> ln 4; constant -> 0
    assert abs(got.loc["uni"].entropy - np.log(4)) < 5e-6
    assert got.loc["const"].entropy == 0.0
    assert got.loc["uni"].vocab == 4 and got.loc["const"].vocab == 1


def test_part_pair_support_known_values(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import part_pair_support

    # orders: {1,2,3}, {1,2}, {1,2} (one duplicated lineitem), {3}
    rows = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2),
            (12, 1), (12, 2), (12, 2), (13, 3)]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = (
        part_pair_support(str(tmp_path))
        .to_pandas()
        .set_index(["part_a", "part_b"])
        .sort_index()
    )
    # (1,2) in 3 orders; (1,3)/(2,3) only once -> below min_support=2
    assert len(got) == 1
    assert got.loc[(1, 2)].n_orders == 3


def test_q6_revenue_empty_filter_and_known(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import q6_forecast_revenue

    t = pa.table(
        {
            "l_shipdate": pa.array(
                [np.datetime64("1996-06-01T00:00:00", "us"),
                 np.datetime64("1995-06-01T00:00:00", "us")],
                pa.timestamp("us"),
            ),
            "l_discount": pa.array([0.06, 0.06]),
            "l_quantity": pa.array([10.0, 10.0]),
            "l_extendedprice": pa.array([100.0, 100.0]),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = q6_forecast_revenue(str(tmp_path)).to_pandas()
    # only the 1996 row qualifies: 100.00 * 0.06 = 6.0
    assert got.n_items[0] == 1
    assert got.revenue[0] == 6.0


def test_rfm_scores_quintiles(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import orders_rfm_scores

    # 10 customers, one order each, strictly increasing totalprice:
    # m_score must be the exact quintile 1,1,2,2,3,3,4,4,5,5
    n = 10
    t = pa.table(
        {
            "o_custkey": pa.array(range(n), pa.int64()),
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_orderdate": pa.array(
                [np.datetime64("2001-01-01T00:00:00", "us")] * n,
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([float(100 * (i + 1)) for i in range(n)]),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    got = (
        orders_rfm_scores(str(tmp_path)).to_pandas()
        .sort_values("c_custkey").reset_index(drop=True)
    )
    assert got.m_score.tolist() == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    # identical recency/frequency -> everyone shares the lowest score
    assert (got.r_score == 1).all() and (got.f_score == 1).all()
    assert (got.frequency == 1).all()


def test_tiered_dedup_report_each_tier_catches(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import tiered_dedup_report

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab, 120))
    near = base.rsplit(" ", 2)[0] + " changed token"
    rows = [
        (0, base),               # rep
        (1, base),               # exact dup of 0      -> tier 1
        (2, base.upper()),       # casefold dup of 0   -> tier 2
        (3, "x  y\tz"),          # whitespace-collapse dup of 4 -> tier 2
        (4, "x y z"),
        (5, near),               # near dup of 0       -> tier 3
        (6, " ".join(rng.choice([w + "q" for w in vocab], 120))),  # unique
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        tiered_dedup_report(str(tmp_path))
        .to_pandas()
        .set_index("tier")
    )
    assert got.loc["exact"].n_in == 7 and got.loc["exact"].n_removed == 1
    assert got.loc["normalized"].n_in == 6
    assert got.loc["normalized"].n_removed == 2  # docs 2 and 3
    assert got.loc["near_dup"].n_in == 4
    assert got.loc["near_dup"].n_removed == 1  # doc 5
    assert got.loc["near_dup"].n_out == 3


def test_events_late_arrivals_flags_out_of_order(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nlshray.pipelines.queries import events_late_arrivals

    H = 3_600_000_000  # 1h in us

    def ts(us):
        return np.datetime64(0, "us") + np.timedelta64(int(us), "us")

    # arrival order = event_id. Watermark delay 600s. Event 3 arrives
    # AFTER the stream reached hour 2, but belongs to hour 0 -> late.
    # Event 4 belongs to hour 2 (watermark hour) -> on time.
    rows = [
        (1, ts(0)),            # hour 0
        (2, ts(2 * H + 10)),   # hour 2 -> watermark = 2h+10us-600s
        (3, ts(H - 1)),        # hour 0, window end 1h <= watermark -> LATE
        (4, ts(2 * H + 20)),   # hour 2, window end 3h > watermark -> ok
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["x"] * 4),
            "value": pa.array([0.0] * 4),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        events_late_arrivals(str(tmp_path))
        .to_pandas()
        .set_index("window_start_us")
        .sort_index()
    )
    assert got.loc[0].n_events == 2 and got.loc[0].n_late == 1
    assert got.loc[2 * H].n_events == 2 and got.loc[2 * H].n_late == 0
