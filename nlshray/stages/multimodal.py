"""Multimodal stages: binary payload columns through actor pools.

Image/audio/video ride as ``binary`` columns with typed metadata.
Decoding is REAL for the formats pure numpy + stdlib can carry — WAV
PCM, BMP, PPM/PGM (numpy/struct), PNG (stdlib zlib inflate + per-row
unfilter), GIF (pure-Python LZW) and baseline JPEG (numpy DCT +
per-image Huffman; ``nlshray.functions.jpeg``) — producing real
feature vectors (audio per-window RMS, image histogram+moments).
Formats whose codecs are genuinely out of reach here (mp3/webm,
progressive JPEG) stay clearly stubbed: ``NotImplementedError``
unless ``fake=True`` substitutes a deterministic hash-derived vector so
the plumbing is exercised end-to-end either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nlshray.hashing import splitmix64

_MAGICS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"BM", "bmp"),
    (b"P5", "pgm"),
    (b"P6", "ppm"),
    (b"ID3", "mp3"),
    (b"\x1aE\xdf\xa3", "webm"),
    (b"<html", "html"),
    (b"<!doc", "html"),
]

# formats with a real stdlib-only decoder in nlshray.functions.media
DECODABLE = frozenset({"wav", "bmp", "ppm", "pgm", "png", "gif", "jpeg"})


def _image_decoders() -> dict:
    """format -> decode fn for every image member of DECODABLE — the
    ONE dispatch map MediaDecoder and ImageResizer both use (a second
    hand-maintained copy is how pgm silently fell out of the resizer)."""
    from nlshray.functions.media import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_ppm,
    )

    return {
        "bmp": decode_bmp,
        "ppm": decode_ppm,
        "pgm": decode_ppm,
        "png": decode_png,
        "gif": decode_gif,
        "jpeg": decode_jpeg,
    }


def sniff_format(data: bytes) -> str:
    head = data[:16]
    if head.startswith(b"RIFF"):
        return "wav" if data[8:12] == b"WAVE" else "riff"
    low = head[:5].lower()
    for magic, name in _MAGICS:
        probe = low if name == "html" else head
        if probe.startswith(magic):
            return name
    return "unknown"


class MediaDecoder:
    """Actor-pool UDF over a binary payload column.

    ``feature_dim``-length deterministic fake features when ``fake=True``
    (hash-seeded, stable across workers); NotImplementedError otherwise —
    swap ``_decode`` for a real library (PIL/av/soundfile) on a cluster
    that has one.
    """

    def __init__(self, payload_col: str = "payload", fake: bool = False,
                 feature_dim: int = 16):
        self.payload_col = payload_col
        self.fake = fake
        self.feature_dim = feature_dim

    def _decode(self, data: bytes) -> np.ndarray:
        from nlshray.functions.media import (
            MediaFormatError,
            audio_features,
            decode_wav,
            image_features,
        )

        fmt = sniff_format(data)
        try:
            if fmt == "wav":
                samples, _rate = decode_wav(data)
                return audio_features(samples, n_windows=self.feature_dim)
            dec = _image_decoders().get(fmt)
            if dec is not None:
                return image_features(dec(data), bins=self.feature_dim - 2)
        except MediaFormatError:
            pass   # malformed container -> fall through to stub handling
        if not self.fake:
            raise NotImplementedError(
                f"decoding {fmt!r} requires a codec library not present in "
                "this environment (real decoders cover "
                "wav/bmp/ppm/pgm/png/gif/baseline-jpeg); "
                "pass fake=True for deterministic stub features"
            )
        seed = np.frombuffer(
            data[:8].ljust(8, b"\0"), dtype=np.uint64
        ) ^ np.uint64(len(data))
        vals = splitmix64(
            seed + np.arange(self.feature_dim, dtype=np.uint64)
        )
        return (vals >> np.uint64(11)).astype(np.float32) / np.float32(1 << 53)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = np.stack([self._decode(p) for p in payloads])
        fmt = [sniff_format(p) for p in payloads]
        out = batch.drop_columns([self.payload_col])
        out = out.append_column(
            "n_bytes", pa.array([len(p) for p in payloads], pa.int64())
        )
        out = out.append_column("format", pa.array(fmt, pa.string()))
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.feature_dim
            ),
        )


def decode_stage(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "payload",
    fake: bool = False,
    feature_dim: int = 16,
    batch_size: int = 64,       # binary payloads are wide -> small batches
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "fake": fake,
            "feature_dim": feature_dim,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool UDF: decode (bmp/ppm/pgm) -> nearest-neighbor resize ->
    re-encode PPM. The 'resize at ingest' stage of an image curation
    pipeline, real end-to-end for the library-free formats."""

    def __init__(self, out_h: int, out_w: int, payload_col: str = "payload"):
        self.out_h = out_h
        self.out_w = out_w
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from nlshray.functions.media import (
            MediaFormatError,
            encode_ppm,
            resize_nearest,
        )

        decoders = _image_decoders()
        out_payloads, ok = [], []
        for data in batch[self.payload_col].to_pylist():
            dec = decoders.get(sniff_format(data))
            img = None
            if dec is not None:
                try:
                    img = dec(data)
                except MediaFormatError:
                    img = None  # unsupported variant/corrupt: pass through
            if img is not None:
                if img.ndim == 2:          # gray -> RGB for the PPM sink
                    img = np.stack([img] * 3, axis=-1)
                img = img[:, :, :3]        # drop alpha
                out_payloads.append(
                    encode_ppm(resize_nearest(img, self.out_h, self.out_w))
                )
                ok.append(True)
            else:
                out_payloads.append(data)
                ok.append(False)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column(self.payload_col, pa.array(out_payloads, pa.binary()))
        return out.append_column("resized", pa.array(ok, pa.bool_()))


def resize_stage(
    ds: ray.data.Dataset,
    *,
    out_h: int,
    out_w: int,
    payload_col: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "out_h": out_h,
            "out_w": out_w,
            "payload_col": payload_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
