"""Posting codec + norm quantization unit tests (no Ray needed)."""
import numpy as np
import pytest

from patapsco_ray.index.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from patapsco_ray.index.norms import (
    byte4_to_int,
    encode_lengths,
    int_to_byte4,
)


@pytest.mark.parametrize("bits", [7, 14, 21, 35, 63])
def test_varint_roundtrip(bits):
    rng = np.random.default_rng(bits)
    vals = rng.integers(0, 2**bits, size=1000).astype(np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty_and_zero():
    assert varint_encode(np.array([], dtype=np.uint64)).size == 0
    z = np.array([0], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(z)), z)


def test_postings_roundtrip_and_block_select():
    rng = np.random.default_rng(7)
    n = 1000
    ords = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 500, size=n).astype(np.int64)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    enc = encode_postings(ords, tfs, norms)
    o2, t2 = decode_postings(enc["postings"], enc["block_offsets"], enc["block_counts"])
    assert np.array_equal(o2, ords)
    assert np.array_equal(t2, tfs)
    o3, _ = decode_postings(
        enc["postings"], enc["block_offsets"], enc["block_counts"], [2, 5]
    )
    assert np.array_equal(
        o3, np.concatenate([ords[2 * 128:3 * 128], ords[5 * 128:6 * 128]])
    )
    # block-max metadata consistency
    assert enc["block_last"][-1] == ords[-1]
    assert max(enc["block_max_tf"]) == tfs.max()


def test_norms_lucene_smallfloat():
    # values < 24 exact (Lucene SmallFloat NUM_FREE_VALUES == 24)
    assert [byte4_to_int(b) for b in range(24)] == list(range(24))
    assert int_to_byte4(2**31 - 1) == 255
    assert byte4_to_int(int_to_byte4(41)) == 40  # quantizes down
    prev = -1
    for i in list(range(200)) + [10**4, 10**6, 2**31 - 1]:
        b = int_to_byte4(i)
        d = byte4_to_int(b)
        assert d <= i
        assert int_to_byte4(d) == b  # idempotent
        assert b >= prev  # monotone
        prev = b


def test_encode_lengths_vectorized_matches_scalar():
    lens = np.array([0, 1, 5, 23, 24, 39, 40, 41, 42, 100, 1000, 10**6])
    enc = encode_lengths(lens)
    for length, b in zip(lens, enc):
        assert b == int_to_byte4(int(length))
