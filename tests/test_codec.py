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


def test_bulk_encoder_matches_per_term():
    """encode_postings_bulk must be byte-identical to per-term
    encode_postings (same blobs, offsets, block metadata)."""
    import numpy as np

    from patapsco_ray.index.codec import (
        decode_postings,
        encode_postings,
        encode_postings_bulk,
    )

    rng = np.random.default_rng(7)
    for _ in range(10):
        T = int(rng.integers(1, 30))
        offs = [0]
        ords_all, tfs_all, norms_all, per_term = [], [], [], []
        for _t in range(T):
            df = int(rng.integers(1, 400))
            o = np.sort(rng.choice(5000, size=df, replace=False)).astype(np.int64)
            tf = rng.integers(1, 50, size=df).astype(np.int64)
            nb = rng.integers(0, 256, size=df).astype(np.uint8)
            per_term.append(encode_postings(o, tf, nb))
            ords_all.append(o)
            tfs_all.append(tf)
            norms_all.append(nb)
            offs.append(offs[-1] + df)
        enc = encode_postings_bulk(
            np.concatenate(ords_all), np.concatenate(tfs_all),
            np.concatenate(norms_all), np.array(offs, dtype=np.int64))
        tbo = enc["term_byte_offsets"]
        bo = 0
        for t in range(T):
            blob = enc["data"][tbo[t]:tbo[t + 1]]
            assert blob == per_term[t]["postings"]
            nb_t = enc["blocks_per_term"][t]
            sl = slice(bo, bo + nb_t)
            for key in ("block_offsets", "block_counts", "block_last",
                        "block_max_tf", "block_min_norm"):
                assert list(enc[key][sl]) == per_term[t][key], key
            o2, t2 = decode_postings(blob, list(enc["block_offsets"][sl]),
                                     list(enc["block_counts"][sl]))
            assert (o2 == ords_all[t]).all() and (t2 == tfs_all[t]).all()
            bo += nb_t
