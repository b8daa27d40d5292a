"""Baseline JPEG codec: roundtrip fidelity, container handling, and
MediaDecoder/ImageResizer integration."""

import numpy as np
import pytest

from nlshray.functions.jpeg import decode_jpeg, encode_jpeg
from nlshray.functions.media import MediaFormatError


def _gradient(h=48, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return ((np.sin(x / 9) + np.cos(y / 7)) * 60 + 128).clip(0, 255).astype(np.uint8)


def test_flat_image_exact():
    flat = np.full((20, 30), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert out.shape == (20, 30)
    assert np.array_equal(out, flat)


def test_gray_roundtrip_quality_ladder():
    img = _gradient()
    prev_err = 256.0
    for q in (50, 75, 90, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        err = float(np.abs(out.astype(int) - img.astype(int)).max())
        assert out.shape == img.shape and out.dtype == np.uint8
        assert err <= prev_err + 1  # fidelity is monotone-ish in quality
        prev_err = err
    assert prev_err <= 2  # q95 on a smooth image is near-lossless


def test_rgb_444_roundtrip():
    g = _gradient()
    rgb = np.stack([g, np.roll(g, 5, 0), 255 - g], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6


def test_rgb_420_subsampled_roundtrip():
    g = _gradient(40, 40)
    rgb = np.stack([g, g, g], axis=-1)  # gray-in-RGB: chroma flat -> tight
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_restart_markers_decode_identical():
    g = _gradient(33, 41)  # non-multiple-of-8 edges
    rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], axis=-1)
    plain = decode_jpeg(encode_jpeg(rgb, quality=90))
    with_rst = decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_deterministic_bytes():
    img = _gradient(24, 24)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_progressive_rejected():
    """SOF2 (progressive) must raise, not decode garbage."""
    img = _gradient(16, 16)
    enc = bytearray(encode_jpeg(img, quality=90))
    i = enc.find(b"\xff\xc0")
    assert i > 0
    enc[i + 1] = 0xC2
    with pytest.raises(MediaFormatError):
        decode_jpeg(bytes(enc))


def test_truncated_raises_format_error():
    enc = encode_jpeg(_gradient(16, 16), quality=90)
    from nlshray.functions.media import decode_jpeg as guarded

    with pytest.raises(MediaFormatError):
        guarded(enc[: len(enc) // 2])
    with pytest.raises(MediaFormatError):
        guarded(b"\xff\xd8\xff\xee junk")


def test_media_decoder_jpeg(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from nlshray.stages.multimodal import decode_stage, sniff_format

    imgs = [_gradient(16 + 8 * i, 24) for i in range(4)]
    payloads = [encode_jpeg(im, quality=90) for im in imgs]
    assert all(sniff_format(p) == "jpeg" for p in payloads)
    t = pa.table({"item_id": list(range(4)), "payload": payloads})
    out = decode_stage(rd.from_arrow(t), concurrency=1).take_all()
    assert len(out) == 4
    for row in out:
        assert row["format"] == "jpeg"
        assert np.isfinite(np.asarray(row["features"], dtype=np.float64)).all()


def test_image_resizer_jpeg(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from nlshray.functions.media import decode_ppm
    from nlshray.stages.multimodal import resize_stage

    g = _gradient(32, 48)
    rgb = np.stack([g, 255 - g, g], axis=-1)
    t = pa.table({"item_id": [0], "payload": [encode_jpeg(rgb, quality=95)]})
    out = resize_stage(rd.from_arrow(t), out_h=8, out_w=12, concurrency=1).take_all()
    resized = decode_ppm(out[0]["payload"])
    assert resized.shape == (8, 12, 3)
