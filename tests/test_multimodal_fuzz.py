"""Property tests: codec roundtrips + chunk-layout invariants."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from patapsco_ray.functions.multimodal import (
    png_decode, png_encode, wav_decode, wav_encode,
    video_container_decode, video_container_encode,
)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 2, 3, 4]),
       st.integers(0, 2**32 - 1))
def test_png_roundtrip_fuzz(h, w, c, seed):
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w, c)).astype(np.uint8)
    assert (png_decode(png_encode(px)) == px).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 200), st.sampled_from([1, 2]),
       st.sampled_from([1, 2]), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_fuzz(n, nch, width, seed):
    rng = np.random.default_rng(seed)
    if width == 2:
        s = rng.integers(-32768, 32768, (n, nch)).astype(np.int16)
    else:
        s = rng.integers(0, 256, (n, nch)).astype(np.uint8)
    x, sr = wav_decode(wav_encode(s, 8000, width))
    assert x.shape == (n, nch) and sr == 8000


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=12))
def test_container_roundtrip_fuzz(frames):
    assert video_container_decode(video_container_encode(frames)) == frames


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 300), st.integers(2, 50), st.integers(0, 48),
       st.integers(0, 2**31 - 1))
def test_chunk_layout_invariants(ntok, chunk_size, overlap, seed):
    from patapsco_ray.functions.chunking import chunk_documents
    import ray.data

    if overlap >= chunk_size:
        overlap = chunk_size - 1
    stride = chunk_size - overlap
    text = " ".join(f"t{i}" for i in range(ntok))
    ds = ray.data.from_arrow(pa.table({"doc_id": [0], "text": [text]}))
    got = chunk_documents(ds, chunk_size=chunk_size, overlap=overlap,
                          include_text=True).to_pandas()
    if ntok == 0:
        # empty docs yield no chunks (to_pandas of a fully-empty
        # Dataset drops columns; the Arrow schema itself is pinned)
        assert len(got) == 0
        return
    got = got.sort_values("chunk_index").reset_index(drop=True)
    # starts are exactly the stride grid below ntok
    assert got["start_token"].tolist() == list(range(0, ntok, stride))
    # every token covered exactly by the union of [start, start+n)
    covered = set()
    for s, n in zip(got["start_token"], got["n_tokens"]):
        assert n >= 1 and s + n <= ntok
        covered.update(range(s, s + n))
    assert covered == set(range(ntok))
    # chunk text matches the token slice
    toks = text.split()
    for s, n, t in zip(got["start_token"], got["n_tokens"],
                       got["chunk_text"]):
        assert t == " ".join(toks[s:s + n])
