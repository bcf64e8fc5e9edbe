"""Vectorized deterministic hashing helpers shared by dedup stages.

String hashing uses polars' vectorized 64-bit hash (seeded, stable
within a polars version/process fleet — fine for intra-run shuffles and
bucketing; results that must be stable across library upgrades should
persist doc ids, not raw hashes). Integer mixing uses splitmix64, which
is fully deterministic everywhere.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

_U64 = np.uint64


def hash_strings(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of a string array -> uint64 ndarray."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        s = pl.from_arrow(arr)
        return s.hash(seed=seed).to_numpy().astype(_U64, copy=False)
    except AttributeError:
        # A Ray task cancellation (KeyboardInterrupt) can land mid
        # `import polars` in a reused worker process, leaving a
        # half-initialized module in sys.modules whose lazy re-exports
        # are missing (`polars._reexport has no attribute 'Series'`).
        # Purge and re-import once, then retry — the hash values are
        # identical, only the module state was broken.
        s = _reimport_polars().from_arrow(arr)
        return s.hash(seed=seed).to_numpy().astype(_U64, copy=False)


def _reimport_polars():
    global pl
    import importlib
    import sys

    for name in [m for m in list(sys.modules)
                 if m == "polars" or m.startswith("polars.")]:
        del sys.modules[name]
    pl = importlib.import_module("polars")
    return pl


def stable_hash_strings(arr: pa.Array | pa.ChunkedArray,
                        seed: int = 0) -> np.ndarray:
    """Version-stable vectorized 64-bit string hash -> uint64 ndarray.

    A fixed algorithm over the raw utf8 bytes (8-byte little-endian
    words mixed with splitmix64, length folded in at the end), built
    only from numpy ops — identical output across polars/pyarrow/numpy
    versions. Use this (NOT ``hash_strings``) whenever the hash is
    persisted to disk, e.g. the doc-store bucket routing.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=_U64)
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset:arr.offset + n + 1]
    lens = np.diff(offsets)
    total = int(offsets[-1] - offsets[0])
    nwords = max(int(np.ceil(lens.max() / 8)), 1) if total else 1
    mat = np.zeros((n, nwords * 8), dtype=np.uint8)
    if total:
        flat = np.frombuffer(buffers[2], dtype=np.uint8)[
            offsets[0]:offsets[-1]]
        row_idx = np.repeat(np.arange(n), lens)
        col_idx = np.arange(total) - np.repeat(offsets[:-1] - offsets[0], lens)
        mat[row_idx, col_idx] = flat
    words = mat.view("<u8").reshape(n, nwords)
    with np.errstate(over="ignore"):
        acc = np.full(n, _U64(seed) ^ _U64(0x9E3779B97F4A7C15), dtype=_U64)
        for w in range(nwords):
            # only strings that actually reach word w mix it in, so the
            # result is independent of the batch's max length
            covered = lens > w * 8
            if not covered.any():
                break
            acc = np.where(covered, splitmix64(acc ^ words[:, w]), acc)
        acc = splitmix64(acc ^ lens.astype(_U64))
    return acc


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (splitmix64 finalizer), vectorized."""
    x = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def combine_hashes(*parts: np.ndarray) -> np.ndarray:
    """Order-sensitive combination of equal-length uint64 arrays."""
    acc = np.zeros_like(parts[0], dtype=_U64)
    with np.errstate(over="ignore"):
        for p in parts:
            acc = splitmix64(acc ^ p.astype(_U64, copy=False))
    return acc


def window_hashes(token_hashes: np.ndarray, offsets: np.ndarray, w: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling w-token window hashes per document.

    ``token_hashes`` is the flattened per-token hash array; ``offsets``
    (len ndocs+1) delimits documents. Returns (window_hash_flat,
    window_offsets): docs with fewer than w tokens get a single window
    over all their tokens (empty docs get none).

    Vectorized: the w shifted slices are mixed with position-dependent
    multipliers; windows that would cross a document boundary are
    dropped by masking against the offsets.
    """
    n = len(token_hashes)
    ndocs = len(offsets) - 1
    doc_lens = np.diff(offsets)
    if n == 0:
        return np.empty(0, dtype=_U64), np.zeros(ndocs + 1, dtype=np.int64)
    # windows starting at every flat position with w tokens available
    nwin = max(n - w + 1, 0)
    with np.errstate(over="ignore"):
        acc = np.zeros(nwin, dtype=_U64)
        for j in range(w):
            mult = splitmix64(np.array([j + 1], dtype=_U64))[0]
            acc = splitmix64(acc ^ (token_hashes[j:j + nwin] * mult))
    # a window at flat position p belongs to doc d iff p+w <= offsets[d+1]
    starts = np.arange(nwin, dtype=np.int64)
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + w <= offsets[doc_of + 1]
    win_per_doc = np.bincount(doc_of[valid], minlength=ndocs)
    out_hashes = [acc[valid]]
    # short docs (0 < len < w): one window over the whole doc
    short = np.flatnonzero((doc_lens > 0) & (doc_lens < w))
    if short.size:
        short_hashes = np.empty(short.size, dtype=_U64)
        for i, d in enumerate(short):
            seg = token_hashes[offsets[d]:offsets[d + 1]]
            with np.errstate(over="ignore"):
                a = _U64(0)
                for j, h in enumerate(seg):
                    mult = splitmix64(np.array([j + 1], dtype=_U64))[0]
                    a = splitmix64(np.array([a ^ (h * mult)], dtype=_U64))[0]
            short_hashes[i] = a
        win_per_doc[short] = 1
        # interleave in document order
        all_h = np.empty(int(win_per_doc.sum()), dtype=_U64)
        out_off = np.concatenate([[0], np.cumsum(win_per_doc)])
        pos = out_off[:-1].copy()
        # place long-doc windows
        for d, h in zip(doc_of[valid], acc[valid]):
            all_h[pos[d]] = h
            pos[d] += 1
        for i, d in enumerate(short):
            all_h[pos[d]] = short_hashes[i]
            pos[d] += 1
        return all_h, out_off
    out_off = np.concatenate([[0], np.cumsum(win_per_doc)])
    return out_hashes[0], out_off
