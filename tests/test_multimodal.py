"""Real multimodal decode backends (functions/multimodal.py):
stdlib PNG / WAV / PRVC-container codecs + the actor-pool pipelines."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from patapsco_ray.functions.multimodal import (
    _PNG_SIG,
    AudioFeaturizer,
    ImageDecoder,
    decode_images,
    extract_audio_features,
    png_decode,
    png_encode,
    sample_video_frames,
    video_container_decode,
    video_container_encode,
    wav_decode,
    wav_encode,
)

# ------------------------------------------------------------- codecs


@pytest.mark.parametrize("shape", [(8, 8, 3), (5, 7, 1), (4, 4, 4),
                                   (3, 9, 2), (1, 1, 3)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, shape).astype(np.uint8)
    assert (png_decode(png_encode(px)) == px).all()


def _encode_with_filters(px, filts):
    """Hand-filtered PNG writer exercising decode filters 1-4."""
    h, w, c = px.shape
    bpp, stride = c, w * c
    flat = px.reshape(h, stride).astype(np.int64)
    rows = []
    for y, f in enumerate(filts):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur.copy()
            enc[bpp:] = (cur[bpp:] - cur[:-bpp]) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - ((a + prev[x]) >> 1)) % 256
        else:
            def paeth(a, b, cc):
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                if pa_ <= pb and pa_ <= pc_:
                    return a
                return b if pb <= pc_ else cc
            enc = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cc = prev[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - paeth(int(a), int(prev[x]),
                                         int(cc))) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
    raw = b"".join(rows)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c],
                       0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filts", [[1] * 6, [2] * 6, [3] * 6, [4] * 6,
                                   [0, 1, 2, 3, 4, 1]])
def test_png_unfilter_all_types(filts):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
    assert (png_decode(_encode_with_filters(px, filts)) == px).all()


def test_png_rejects_junk():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JFIF not png")


def test_wav_roundtrip():
    rng = np.random.default_rng(5)
    s = rng.integers(-2000, 2000, 64).astype(np.int16)
    x, sr = wav_decode(wav_encode(s, 8000, 2))
    assert sr == 8000 and x.shape == (64, 1)
    assert np.allclose(x[:, 0], s / 32768.0)
    s2 = rng.integers(0, 256, (50, 2)).astype(np.uint8)
    x2, sr2 = wav_decode(wav_encode(s2, 44100, 1))
    assert x2.shape == (50, 2) and sr2 == 44100
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"OggS not wav")


def test_video_container_roundtrip():
    frames = [b"abc", b"", bytes(range(200, 256))]
    assert video_container_decode(video_container_encode(frames)) == frames
    with pytest.raises(ValueError, match="PRVC"):
        video_container_decode(b"\x00\x00\x00\x18ftypmp42")


# ------------------------------------------------- real decode pipelines


def test_image_decoder_real_features():
    """Feature recipe check on a known image: constant channels."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 100
    px[:, :, 1] = 200
    px[:, :, 2] = 0
    dec = ImageDecoder(backend="real", feature_dim=16)
    out = dec(pa.table({"id": [1], "image": [png_encode(px)]}))
    assert out.column("width")[0].as_py() == 8
    assert out.column("height")[0].as_py() == 8
    assert out.column("channels")[0].as_py() == 3
    f = np.asarray(out.column("features")[0].as_py())
    assert f[0] == pytest.approx(100 / 255)   # mean_r
    assert f[1] == pytest.approx(200 / 255)   # mean_g
    assert f[2] == pytest.approx(0.0)         # mean_b
    assert np.allclose(f[3:6], 0.0)           # stds of constants
    # 4x4 gray thumbnail: gray = 100 everywhere
    assert np.allclose(f[6:16], 100 / 255)


def test_audio_featurizer_real():
    sr = 8000
    t = np.arange(64)
    s = (1000 * np.sign(np.sin(2 * np.pi * t / 8))).astype(np.int16)
    feat = AudioFeaturizer(backend="real", feature_dim=8)
    out = feat(pa.table({"id": [1], "audio": [wav_encode(s, sr, 2)]}))
    assert out.column("sample_rate")[0].as_py() == sr
    assert out.column("duration_ms")[0].as_py() == round(64 / sr * 1000)
    f = np.asarray(out.column("features")[0].as_py())
    x = s / 32768.0
    assert f[0] == pytest.approx(x.mean())
    assert f[1] == pytest.approx(np.sqrt((x * x).mean()))
    assert f[2] == pytest.approx(np.abs(x).max())


def test_real_pipelines_end_to_end(ray_session):
    rng = np.random.default_rng(11)
    pngs, wavs, vids = [], [], []
    for i in range(6):
        pngs.append(png_encode(
            rng.integers(0, 256, (4 + i, 5, 3)).astype(np.uint8)))
        wavs.append(wav_encode(
            rng.integers(-500, 500, 32 + i).astype(np.int16), 16000, 2))
        vids.append(video_container_encode(
            [bytes([i, f]) * 4 for f in range(i + 1)]))
    ds = ray.data.from_arrow(pa.table({
        "id": list(range(6)),
        "image": pa.array(pngs, pa.binary()),
        "audio": pa.array(wavs, pa.binary()),
        "video": pa.array(vids, pa.binary())}))
    img = decode_images(ds, backend="real", concurrency=1).to_pandas()
    assert img["height"].tolist() == [4, 5, 6, 7, 8, 9]
    assert (img["width"] == 5).all() and (img["channels"] == 3).all()
    aud = extract_audio_features(ds, backend="real",
                                 concurrency=1).to_pandas()
    assert aud["duration_ms"].tolist() == [2] * 6
    assert (aud["sample_rate"] == 16000).all()
    vid = sample_video_frames(ds, backend="real", every_n=2,
                              max_frames=2).to_pandas()
    # doc i has i+1 frames; sampled original indices {0, 2} & < i+1
    got = vid.groupby("id")["frame_index"].apply(list).to_dict()
    assert got == {0: [0], 1: [0], 2: [0, 2], 3: [0, 2],
                   4: [0, 2], 5: [0, 2]}
    row = vid[(vid.id == 3) & (vid.frame_index == 2)]["frame"].iloc[0]
    assert bytes(row) == bytes([3, 2]) * 4


def test_video_demux_composes_with_png_decode(ray_session):
    """The intended multimodal composition: PRVC demux emits PNG
    frames that decode_images consumes directly."""
    rng = np.random.default_rng(21)
    vids = []
    for i in range(3):
        frames = [png_encode(rng.integers(0, 256, (4, 4, 3))
                             .astype(np.uint8)) for _ in range(i + 2)]
        vids.append(video_container_encode(frames))
    ds = ray.data.from_arrow(pa.table({
        "id": [0, 1, 2], "video": pa.array(vids, pa.binary())}))
    sampled = sample_video_frames(ds, backend="real", every_n=1,
                                  max_frames=4)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"id": t.column("id"),
                         "image": t.column("frame")})

    frames_ds = sampled.map_batches(rename, batch_format="pyarrow")
    dec = decode_images(frames_ds, backend="real",
                        concurrency=1).to_pandas()
    assert len(dec) == 2 + 3 + 4
    assert (dec["width"] == 4).all() and (dec["height"] == 4).all()
    assert (dec["channels"] == 3).all()
