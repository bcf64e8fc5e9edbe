"""Multimodal (image/audio/video) stages over opaque binary columns.

The Ray-side plumbing is real — typed schemas, actor-pool
``map_batches`` stages sized for large binary payloads (small
``batch_size``), metadata passthrough — but the decode kernels are
STUBBED: the imaging/audio libraries are not in this environment, so
each stage either raises ``NotImplementedError`` (``backend="real"``)
or produces a deterministic fake derived from the payload bytes
(``backend="fake"``, the default, used by tests to exercise the
pipeline shape end-to-end).

Schema conventions:
    images:  (id, image:binary, ...)  -> + width:int32, height:int32,
             channels:int32, features:list<float>[dim]
    audio:   (id, audio:binary, ...)  -> + duration_ms:int64,
             sample_rate:int32, features:list<float>[dim]
    video:   (id, video:binary, ...)  -> one output row per sampled
             frame: (id, frame_index:int32, frame:binary)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..util import fixed_pool


def _digest_floats(payload: bytes, dim: int, salt: bytes) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes."""
    out = np.empty(dim, dtype=np.float64)
    h = b""
    i = 0
    while i < dim:
        h = hashlib.blake2b(salt + h + payload[:64], digest_size=32).digest()
        block = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        take = min(dim - i, len(block))
        out[i:i + take] = block[:take] / 255.0 - 0.5
        i += take
    return out


class ImageDecoder:
    """Actor-pool stage: decode + resize + feature-extract images.

    ``__init__`` is where a real backend would load its model once per
    actor; ``__call__`` handles one Arrow batch.
    """

    def __init__(self, *, backend: str = "fake", feature_dim: int = 16,
                 image_column: str = "image", id_column: str = "id"):
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.backend = backend
        self.feature_dim = feature_dim
        self.image_column = image_column
        self.id_column = id_column
        if backend == "real":
            # e.g. PIL/torchvision model load would go here (once per actor)
            raise NotImplementedError(
                "no imaging library in this environment; use backend='fake'")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column(self.image_column).to_pylist()
        n = len(payloads)
        w = np.empty(n, dtype=np.int32)
        h = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.feature_dim), dtype=np.float64)
        for i, p in enumerate(payloads):
            p = p or b""
            d = hashlib.blake2b(p, digest_size=8).digest()
            w[i] = 64 + d[0] % 192   # fake decoded dims
            h[i] = 64 + d[1] % 192
            feats[i] = _digest_floats(p, self.feature_dim, b"img")
        return pa.table({
            self.id_column: tbl.column(self.id_column),
            "width": pa.array(w),
            "height": pa.array(h),
            "channels": pa.array(np.full(n, 3, dtype=np.int32)),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.feature_dim),
        })


class AudioFeaturizer:
    """Actor-pool stage: audio decode + frame-level features (stub)."""

    def __init__(self, *, backend: str = "fake", feature_dim: int = 8,
                 audio_column: str = "audio", id_column: str = "id"):
        self.backend = backend
        self.feature_dim = feature_dim
        self.audio_column = audio_column
        self.id_column = id_column
        if backend == "real":
            raise NotImplementedError(
                "no audio library in this environment; use backend='fake'")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column(self.audio_column).to_pylist()
        n = len(payloads)
        dur = np.empty(n, dtype=np.int64)
        feats = np.empty((n, self.feature_dim), dtype=np.float64)
        for i, p in enumerate(payloads):
            p = p or b""
            dur[i] = 100 + (len(p) * 37) % 60_000  # fake duration
            feats[i] = _digest_floats(p, self.feature_dim, b"aud")
        return pa.table({
            self.id_column: tbl.column(self.id_column),
            "duration_ms": pa.array(dur),
            "sample_rate": pa.array(np.full(n, 16_000, dtype=np.int32)),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.feature_dim),
        })


def decode_images(ds: ray.data.Dataset, *, concurrency=2, batch_size: int = 64,
                  **kwargs) -> ray.data.Dataset:
    """Image decode as an actor pool; small batches keep
    payload x concurrency within worker heaps (large binaries)."""
    if kwargs.get("backend") == "real":  # fail fast on the driver
        raise NotImplementedError(
            "no imaging library in this environment; use backend='fake'")
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs=kwargs, batch_size=batch_size,
        batch_format="pyarrow", concurrency=fixed_pool(concurrency), num_cpus=1,
    )


def extract_audio_features(ds: ray.data.Dataset, *, concurrency=2,
                           batch_size: int = 64, **kwargs) -> ray.data.Dataset:
    if kwargs.get("backend") == "real":
        raise NotImplementedError(
            "no audio library in this environment; use backend='fake'")
    return ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs=kwargs, batch_size=batch_size,
        batch_format="pyarrow", concurrency=fixed_pool(concurrency), num_cpus=1,
    )


def sample_video_frames(
    ds: ray.data.Dataset, *, every_n: int = 10, max_frames: int = 8,
    video_column: str = "video", id_column: str = "id",
    backend: str = "fake", batch_size: int = 16,
) -> ray.data.Dataset:
    """Frame sampling: one output row per sampled frame (flat_map
    shape). The fake backend slices the payload deterministically."""
    if backend == "real":
        raise NotImplementedError(
            "no video library in this environment; use backend='fake'")

    def fn(tbl: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for vid, payload in zip(tbl.column(id_column).to_pylist(),
                                tbl.column(video_column).to_pylist()):
            payload = payload or b""
            nframes = min(max_frames, max(len(payload) // max(every_n, 1), 1))
            step = max(len(payload) // max(nframes, 1), 1)
            for f in range(nframes):
                ids.append(vid)
                fidx.append(f)
                frames.append(payload[f * step:(f + 1) * step])
        return pa.table({
            id_column: pa.array(ids),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
