"""pack_sequences (greedy token-budget packing) and shuffle_by_hash
(deterministic hash-order global shuffle)."""
import numpy as np
import pyarrow as pa
import ray.data

from patapsco_ray.functions import pack_sequences, shuffle_by_hash
from patapsco_ray.functions.hashing import splitmix64


def _ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _greedy(ns, budget):
    """Reference scalar greedy packer."""
    out, pid, pos, acc = [], 0, 0, 0
    for i, n in enumerate(ns):
        if i > 0 and acc + n > budget:
            pid, pos, acc = pid + 1, 0, 0
        out.append((pid, pos))
        acc += n
        pos += 1
    return out


def test_pack_sequences_matches_scalar_greedy(ray_session):
    rng = np.random.default_rng(7)
    rows = [{"doc_id": i, "grp": f"g{i % 3}",
             "text": " ".join(["tok"] * int(rng.integers(0, 9)))}
            for i in range(60)]
    got = pack_sequences(
        _ds(rows), budget=10, group_column="grp").to_pandas()
    got = got.sort_values(["grp", "doc_id"]).reset_index(drop=True)
    for g in ["g0", "g1", "g2"]:
        sub = got[got.grp == g]
        ns = list(sub.n_tokens)
        want = _greedy(ns, 10)
        assert list(zip(sub.pack_id, sub.pack_pos)) == want
        # every pack except possibly per-doc overflows fits the budget
        sums = sub.groupby("pack_id").n_tokens.sum()
        for p, s in sums.items():
            if s > 10:
                assert len(sub[sub.pack_id == p]) == 1  # oversize alone


def test_pack_oversize_and_zero_token_docs(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c"},          # 3
        {"doc_id": 1, "text": ""},               # 0 rides along
        {"doc_id": 2, "text": " ".join("x" * 1 for _ in range(9))},  # 9 > 4
        {"doc_id": 3, "text": "d e"},            # 2
        {"doc_id": 4, "text": "f g h"},          # 3 -> overflow at 4
    ]
    got = pack_sequences(_ds(rows), budget=4).to_pandas()
    got = got.sort_values("doc_id")
    assert list(got.pack_id) == [0, 0, 1, 2, 3]
    assert list(got.pack_pos) == [0, 1, 0, 0, 0]
    assert list(got.n_tokens) == [3, 0, 9, 2, 3]


def test_pack_precomputed_tokens_column(ray_session):
    rows = [{"doc_id": i, "n": v} for i, v in enumerate([5, 5, 5, 1])]
    got = pack_sequences(
        _ds(rows), budget=10, tokens_column="n").to_pandas()
    got = got.sort_values("doc_id")
    assert list(got.pack_id) == [0, 0, 1, 1]


def test_shuffle_by_hash_deterministic_order(ray_session):
    rows = [{"doc_id": i} for i in range(200)]
    out = shuffle_by_hash(_ds(rows), seed=3).to_pandas()
    keys = np.arange(200, dtype=np.uint64)
    salt = splitmix64(np.array([3], dtype=np.uint64))[0]
    h = splitmix64(keys ^ salt)
    want = np.argsort(h, kind="stable")
    assert list(out.doc_id) == list(want)
    assert list(out.shuffle_key) == list(np.sort(h))
    # a different seed gives a different permutation; same seed repeats
    out2 = shuffle_by_hash(_ds(rows), seed=4).to_pandas()
    assert list(out2.doc_id) != list(out.doc_id)
    out3 = shuffle_by_hash(_ds(rows), seed=3).to_pandas()
    assert list(out3.doc_id) == list(out.doc_id)
