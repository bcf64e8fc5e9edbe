"""Multimodal (image/audio/video) stages over opaque binary columns.

The Ray-side plumbing is real — typed schemas, actor-pool
``map_batches`` stages sized for large binary payloads (small
``batch_size``), metadata passthrough — and the ``backend="real"``
decode kernels are implemented for the formats feasible with the
standard library alone:

- images: PNG (zlib inflate + all five scanline filters, 8-bit
  gray / gray+alpha / RGB / RGBA, non-interlaced) decoded with
  numpy; a matching pure-python encoder (:func:`png_encode`) exists
  for tests and synthetic corpora. JPEG/WebP/AVIF need an imaging
  library that is not in this environment and raise with a clear
  message.
- audio: RIFF/WAV with 8- or 16-bit integer PCM parsed directly
  (header walk + numpy frombuffer); :func:`wav_encode` is the
  matching writer. Compressed codecs raise.
- video: a length-prefixed concatenated-frame container
  (:func:`video_container_encode`, magic ``PRVC``) — the honest
  stdlib-only stand-in for a real demuxer: frame payloads are opaque
  blobs (e.g. PNG-encoded frames), the container parse + sampling
  logic is real and tested.

``backend="fake"`` (deterministic features from payload bytes) is kept
for pipeline-shape tests that don't care about pixel values.

Schema conventions:
    images:  (id, image:binary, ...)  -> + width:int32, height:int32,
             channels:int32, features:list<float>[dim]
    audio:   (id, audio:binary, ...)  -> + duration_ms:int64,
             sample_rate:int32, features:list<float>[dim]
    video:   (id, video:binary, ...)  -> one output row per sampled
             frame: (id, frame_index:int32, frame:binary)

Real feature recipes (documented so oracles can recompute them):
    image features = [mean_c/255 for each channel] +
                     [std_c/255 for each channel (population)] +
                     [4x4 block-mean grayscale/255 (16 values)]
                     truncated / zero-padded to ``feature_dim``.
    audio features = [mean, rms, max_abs, zero_crossing_rate] +
                     [4 FFT band energy fractions]
                     over samples normalized to [-1, 1),
                     truncated / zero-padded to ``feature_dim``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

import ray.data

from ..util import fixed_pool

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PRVC_MAGIC = b"PRVC"

# ------------------------------------------------------------------ PNG


def png_encode(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit, filter 0 rows, one IDAT chunk).

    ``pixels``: (h, w) grayscale or (h, w, c) with c in {1, 2, 3, 4}.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG -> (h, w, c) uint8 array.

    Pure zlib + numpy: IHDR/IDAT walk, inflate, then scanline
    unfiltering (all five PNG filter types; None/Sub/Up vectorized —
    Sub as a per-lane prefix sum — Average/Paeth rows fall back to a
    per-byte loop, the genuinely sequential left+above recurrences).
    """
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = channels = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(
            stride, dtype=np.int64)
        if f == 0:
            line = cur
        elif f == 1:  # Sub: per byte-lane prefix sum, mod 256
            # recon[x] = raw[x] + recon[x-bpp] telescopes to a running
            # sum over each byte lane; int64 cumsum then & 0xFF is the
            # mod-256 wraparound (libpng's most common filter — keep
            # it vectorized, not a per-byte loop)
            line = cur.reshape(width, bpp).cumsum(axis=0).ravel() & 0xFF
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 3:  # Average
            # recon[x] = cur[x] + (recon[x-bpp] + prev[x]) >> 1 — the
            # floor-halving makes the left recurrence non-associative,
            # so no scan/prefix-sum form exists; run it over plain
            # Python ints (lists), which beats per-byte numpy scalar
            # indexing ~3x (measured 5.3 -> 1.8 ms per 64x64x3)
            cb = rows[y, 1:].tolist()
            pb = out[y - 1].tolist() if y else [0] * stride
            lb = [0] * stride
            for x in range(stride):
                a = lb[x - bpp] if x >= bpp else 0
                lb[x] = (cb[x] + ((a + pb[x]) >> 1)) & 0xFF
            line = lb
        elif f == 4:  # Paeth
            # same sequential left+above recurrence (the predictor
            # depends on recon[x-bpp]); Python-int loop with the
            # predictor inlined (measured 11.0 -> 3.2 ms per 64x64x3)
            cb = rows[y, 1:].tolist()
            pb = out[y - 1].tolist() if y else [0] * stride
            lb = [0] * stride
            for x in range(stride):
                if x >= bpp:
                    a = lb[x - bpp]
                    c = pb[x - bpp]
                else:
                    a = c = 0
                b = pb[x]
                pa_ = abs(b - c)          # |p - a| with p = a + b - c
                pb_ = abs(a - c)
                pc_ = abs(a + b - 2 * c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c)
                lb[x] = (cb[x] + pred) & 0xFF
            line = lb
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line  # numpy assignment casts the int64/list row
    return out.reshape(height, width, channels)


def _image_features(px: np.ndarray, dim: int) -> np.ndarray:
    """The documented real-image feature recipe (see module docstring)."""
    h, w, c = px.shape
    x = px.astype(np.float64)
    feats = [x[:, :, i].mean() / 255.0 for i in range(c)]
    feats += [x[:, :, i].std() / 255.0 for i in range(c)]
    gray = x.mean(axis=2)
    ys = np.linspace(0, h, 5).astype(np.int64)
    xs = np.linspace(0, w, 5).astype(np.int64)
    for i in range(4):
        for j in range(4):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            feats.append(block.mean() / 255.0)
    out = np.zeros(dim, dtype=np.float64)
    out[:min(dim, len(feats))] = feats[:dim]
    return out


# ------------------------------------------------------------------ WAV


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000,
               sample_width: int = 2) -> bytes:
    """Minimal RIFF/WAV PCM writer. ``samples``: (n,) mono or (n, ch);
    int16 for sample_width=2, uint8 for sample_width=1."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    nch = s.shape[1]
    dt = np.int16 if sample_width == 2 else np.uint8
    payload = s.astype(dt).tobytes()
    byte_rate = sample_rate * nch * sample_width
    fmt = struct.pack("<HHIIHH", 1, nch, sample_rate, byte_rate,
                      nch * sample_width, 8 * sample_width)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV integer-PCM parse -> (samples normalized to [-1, 1) as
    float64 of shape (nframes, nch), sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt_tag = nch = rate = bits = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_tag, nch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body)
        elif tag == b"data":
            payload = body
    if fmt_tag is None or payload is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    if fmt_tag != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV format tag={fmt_tag} bits={bits} "
            "(integer PCM 8/16-bit only)")
    if bits == 16:
        x = np.frombuffer(payload[:len(payload) & ~1],
                          dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    nframes = len(x) // nch
    return x[:nframes * nch].reshape(nframes, nch), rate


def _audio_features(x: np.ndarray, dim: int) -> np.ndarray:
    """The documented real-audio feature recipe (see module docstring);
    ``x`` is (nframes, nch) normalized samples."""
    mono = x.mean(axis=1) if x.size else np.zeros(1)
    feats = [float(mono.mean()),
             float(np.sqrt(np.mean(mono * mono))),
             float(np.abs(mono).max() if mono.size else 0.0)]
    if len(mono) > 1:
        signs = np.signbit(mono)
        feats.append(float(np.count_nonzero(signs[1:] != signs[:-1])
                           / (len(mono) - 1)))
    else:
        feats.append(0.0)
    spec = np.abs(np.fft.rfft(mono)) ** 2
    total = spec.sum()
    edges = np.linspace(0, len(spec), 5).astype(np.int64)
    for i in range(4):
        band = spec[edges[i]:max(edges[i + 1], edges[i] + 1)]
        feats.append(float(band.sum() / total) if total > 0 else 0.0)
    out = np.zeros(dim, dtype=np.float64)
    out[:min(dim, len(feats))] = feats[:dim]
    return out


# ------------------------------------------------------- video container


def video_container_encode(frames: list[bytes]) -> bytes:
    """Length-prefixed concatenated-frame container (magic ``PRVC``):
    the stdlib stand-in for a demuxable video file. Frame payloads are
    opaque (typically PNG-encoded frames)."""
    parts = [_PRVC_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def video_container_decode(data: bytes) -> list[bytes]:
    if data[:4] != _PRVC_MAGIC:
        raise ValueError("not a PRVC container (real video demuxing "
                         "needs a codec library absent here)")
    (n,) = struct.unpack_from("<I", data, 4)
    pos, frames = 8, []
    for _ in range(n):
        (length,) = struct.unpack_from("<I", data, pos)
        frames.append(data[pos + 4:pos + 4 + length])
        pos += 4 + length
    return frames


# ------------------------------------------------------------- fake path


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


# ---------------------------------------------------------------- stages


class ImageDecoder:
    """Actor-pool stage: decode + feature-extract images.

    ``backend="real"`` decodes PNG payloads (:func:`png_decode`) and
    emits the documented feature recipe; ``backend="fake"`` keeps the
    deterministic pseudo-features for shape-only tests. Per-actor
    state (here: nothing heavier than the numpy import) belongs in
    ``__init__`` — a model-based featurizer would load its weights
    once per actor in the same spot.
    """

    def __init__(self, *, backend: str = "fake", feature_dim: int = 16,
                 image_column: str = "image", id_column: str = "id"):
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.backend = backend
        self.feature_dim = feature_dim
        self.image_column = image_column
        self.id_column = id_column

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column(self.image_column).to_pylist()
        n = len(payloads)
        w = np.empty(n, dtype=np.int32)
        h = np.empty(n, dtype=np.int32)
        ch = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.feature_dim), dtype=np.float64)
        for i, p in enumerate(payloads):
            p = p or b""
            if self.backend == "real":
                px = png_decode(p)
                h[i], w[i], ch[i] = px.shape
                feats[i] = _image_features(px, self.feature_dim)
            else:
                d = hashlib.blake2b(p, digest_size=8).digest()
                w[i] = 64 + d[0] % 192   # fake decoded dims
                h[i] = 64 + d[1] % 192
                ch[i] = 3
                feats[i] = _digest_floats(p, self.feature_dim, b"img")
        return pa.table({
            self.id_column: tbl.column(self.id_column),
            "width": pa.array(w),
            "height": pa.array(h),
            "channels": pa.array(ch),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.feature_dim),
        })


class AudioFeaturizer:
    """Actor-pool stage: audio decode + clip-level features.

    ``backend="real"`` parses RIFF/WAV integer PCM
    (:func:`wav_decode`) and emits the documented feature recipe."""

    def __init__(self, *, backend: str = "fake", feature_dim: int = 8,
                 audio_column: str = "audio", id_column: str = "id"):
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.backend = backend
        self.feature_dim = feature_dim
        self.audio_column = audio_column
        self.id_column = id_column

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column(self.audio_column).to_pylist()
        n = len(payloads)
        dur = np.empty(n, dtype=np.int64)
        rate = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.feature_dim), dtype=np.float64)
        for i, p in enumerate(payloads):
            p = p or b""
            if self.backend == "real":
                x, sr = wav_decode(p)
                rate[i] = sr
                dur[i] = int(round(len(x) / sr * 1000.0))
                feats[i] = _audio_features(x, self.feature_dim)
            else:
                dur[i] = 100 + (len(p) * 37) % 60_000  # fake duration
                rate[i] = 16_000
                feats[i] = _digest_floats(p, self.feature_dim, b"aud")
        return pa.table({
            self.id_column: tbl.column(self.id_column),
            "duration_ms": pa.array(dur),
            "sample_rate": pa.array(rate),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.feature_dim),
        })


def decode_images(ds: ray.data.Dataset, *, concurrency=2, batch_size: int = 64,
                  **kwargs) -> ray.data.Dataset:
    """Image decode as an actor pool; small batches keep
    payload x concurrency within worker heaps (large binaries)."""
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs=kwargs, batch_size=batch_size,
        batch_format="pyarrow", concurrency=fixed_pool(concurrency), num_cpus=1,
    )


def extract_audio_features(ds: ray.data.Dataset, *, concurrency=2,
                           batch_size: int = 64, **kwargs) -> ray.data.Dataset:
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
    shape). ``backend="real"`` demuxes the PRVC container and keeps
    frames at ORIGINAL indices 0, every_n, 2*every_n, ... (at most
    ``max_frames``); the fake backend slices the payload bytes
    deterministically."""
    if backend not in ("fake", "real"):
        raise ValueError(backend)

    def fn(tbl: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for vid, payload in zip(tbl.column(id_column).to_pylist(),
                                tbl.column(video_column).to_pylist()):
            payload = payload or b""
            if backend == "real":
                all_frames = video_container_decode(payload)
                step = max(every_n, 1)
                for f in range(0, len(all_frames), step):
                    if f // step >= max_frames:
                        break
                    ids.append(vid)
                    fidx.append(f)
                    frames.append(all_frames[f])
            else:
                nframes = min(max_frames,
                              max(len(payload) // max(every_n, 1), 1))
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
