"""Document-length norm quantization, Lucene-faithful.

Lucene's BM25Similarity stores each document's length (number of index
terms) compressed to ONE byte at index time (SmallFloat.intToByte4) and
decompresses it at query time (SmallFloat.byte4ToInt), so scores depend
on the *quantized* length while avgdl uses exact totals. Replicating
this quantization is required for score-identity with the reference's
Lucene-default BM25 (see SURVEY.md §2.6; reference scoring config at
/root/reference/patapsco/retrieve.py:86-115).

The encoding: values below 24 are exact; above, a 3-bit mantissa with
implicit leading bit + 5-bit shift, offset so the byte space is fully
used (24 free values + 232 normal values).
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only supports positive values")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07        # drop the implicit leading bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4      # == 24


def int_to_byte4(i: int) -> int:
    """Lucene SmallFloat.intToByte4 (returns 0..255)."""
    if i < 0:
        raise ValueError("only supports positive values")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Lucene SmallFloat.byte4ToInt (b in 0..255)."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


# Decode table: norm byte -> quantized doc length (float64 for scoring)
DECODE_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float64)

# Encode: quantized lengths are monotone, so searchsorted gives the byte
_BOUNDARIES = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array -> uint8 norm bytes.

    Lengths above the max encodable value saturate at byte 255 (Lucene
    lengths are ints and never exceed it in practice).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    idx = np.searchsorted(_BOUNDARIES, lengths, side="right") - 1
    return np.clip(idx, 0, 255).astype(np.uint8)
