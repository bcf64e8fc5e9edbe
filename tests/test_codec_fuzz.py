"""Hypothesis fuzz for the posting codec: round-trip identity and
bulk/per-term agreement under arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from patapsco_ray.index.codec import (
    decode_postings,
    encode_postings,
    encode_postings_bulk,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    enc = varint_encode(arr)
    dec = varint_decode(enc, count=len(values))
    assert (dec == arr).all()


posting_lists = st.lists(
    st.tuples(st.integers(0, 1_000_000), st.integers(1, 10_000)),
    min_size=1, max_size=500, unique_by=lambda t: t[0],
)


@given(posting_lists)
@settings(max_examples=60, deadline=None)
def test_postings_roundtrip(pairs):
    pairs.sort()
    ords = np.array([o for o, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    norms = ((ords * 7) % 256).astype(np.uint8)
    enc = encode_postings(ords, tfs, norms)
    o2, t2 = decode_postings(enc["postings"], enc["block_offsets"],
                             enc["block_counts"])
    assert (o2 == ords).all() and (t2 == tfs).all()
    # block metadata invariants
    assert enc["block_last"][-1] == ords[-1]
    assert sum(enc["block_counts"]) == len(ords)
    assert max(enc["block_max_tf"]) == tfs.max()


@given(st.lists(posting_lists, min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_bulk_matches_per_term(terms):
    offs = [0]
    ords_all, tfs_all, norms_all, per = [], [], [], []
    for pairs in terms:
        pairs.sort()
        o = np.array([x for x, _ in pairs], dtype=np.int64)
        t = np.array([x for _, x in pairs], dtype=np.int64)
        nb = ((o * 13) % 256).astype(np.uint8)
        per.append(encode_postings(o, t, nb))
        ords_all.append(o)
        tfs_all.append(t)
        norms_all.append(nb)
        offs.append(offs[-1] + len(o))
    enc = encode_postings_bulk(
        np.concatenate(ords_all), np.concatenate(tfs_all),
        np.concatenate(norms_all), np.array(offs, dtype=np.int64))
    tbo = enc["term_byte_offsets"]
    for i, p in enumerate(per):
        assert enc["data"][tbo[i]:tbo[i + 1]] == p["postings"]
