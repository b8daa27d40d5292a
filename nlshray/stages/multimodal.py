"""Multimodal plumbing: opaque binary payload columns through actor pools.

Image/audio/video ride as ``binary`` columns with typed metadata. The
decode libraries are NOT in this environment, so the decode kernel is a
clearly-marked stub: format sniffing and byte accounting are REAL
(pure-python magic-byte inspection); pixel/sample decoding raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic hash-derived feature vector so the Ray-side plumbing —
schema, actor pool, batch sizing, output layout — is fully exercised by
tests and ready for a real decoder drop-in.
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
    (b"RIFF", "riff"),       # wav/avi container
    (b"ID3", "mp3"),
    (b"\x1aE\xdf\xa3", "webm"),
    (b"<html", "html"),
    (b"<!doc", "html"),
]


def sniff_format(data: bytes) -> str:
    head = data[:16]
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
        if not self.fake:
            raise NotImplementedError(
                "media decoding requires an image/audio library not present "
                "in this environment; pass fake=True for the deterministic "
                "stub features"
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
