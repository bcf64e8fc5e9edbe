"""Deterministic hash-based sampling.

``sample_by_hash`` keeps a row iff ``splitmix64(uint64(key) ^ salt) <
floor(rate * 2^64)`` — the standard reproducible-subset primitive for
training-data pipelines: the decision depends only on (key, seed,
rate), so re-runs, resumed runs and different cluster shapes select
the SAME rows, and disjoint seeds give independent samples. One
``map_batches`` stage, no shuffle, no RNG state.

splitmix64 is pure 64-bit arithmetic, so the driver oracle re-derives
the EXACT hash in DuckDB SQL (wrapping multiplication via HUGEINT
split-multiply — see ``splitmix64_sql``) and the sampled id set is
value-checked, not merely count-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .hashing import splitmix64, stable_hash_strings

_U64 = np.uint64
_GOLDEN = 0x9E3779B97F4A7C15


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return min(int(rate * float(2**64)), 2**64)


def _salt(seed: int) -> int:
    return int(splitmix64(np.array([seed], dtype=_U64))[0])


def sample_by_hash(
    ds: ray.data.Dataset,
    *,
    rate: float,
    key_column: str = "doc_id",
    seed: int = 0,
) -> ray.data.Dataset:
    """Keep rows whose key hashes under the rate threshold.

    Integer keys hash as ``splitmix64(uint64(key) ^ splitmix64(seed))``
    (SQL-reproducible); string keys go through the version-stable
    string hash first (same determinism guarantees, not expressible in
    SQL)."""
    thr = _threshold(rate)
    salt = _salt(seed)

    def fn(tbl: pa.Table) -> pa.Table:
        col = tbl.column(key_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            keys = np.asarray(col.to_numpy(zero_copy_only=False)
                              ).astype(_U64)
        else:
            keys = stable_hash_strings(col.cast(pa.string()))
        with np.errstate(over="ignore"):
            h = splitmix64(keys ^ _U64(salt))
        if thr >= 2**64:
            mask = np.ones(len(h), dtype=bool)
        else:
            mask = h < _U64(thr)
        return tbl.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: ray.data.Dataset,
    *,
    rates: dict[str, float],
    strata_column: str = "lang",
    key_column: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: each row's keep decision is
    the :func:`sample_by_hash` predicate with the RATE chosen by its
    stratum value (language balancing, per-source downsampling, ...).

    Same scale shape as ``sample_by_hash``: one shuffle-free
    ``map_batches``; the per-row threshold is a dictionary-encode +
    ``take`` over the (tiny) set of distinct strata in the batch, so
    the hot path stays fully vectorized. Because the hash ignores the
    stratum, RAISING a stratum's rate strictly grows its sample
    (nested subsets — the property that makes re-mixing reproducible).
    """
    salt = _salt(seed)
    thr_map = {str(k): _threshold(r) for k, r in rates.items()}
    default_thr = _threshold(default_rate)

    def fn(tbl: pa.Table) -> pa.Table:
        col = tbl.column(key_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            keys = np.asarray(col.to_numpy(zero_copy_only=False)
                              ).astype(_U64)
        else:
            keys = stable_hash_strings(col.cast(pa.string()))
        with np.errstate(over="ignore"):
            h = splitmix64(keys ^ _U64(salt))
        strata = tbl.column(strata_column)
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        enc = strata.cast(pa.string()).dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        dthr = [thr_map.get(v, default_thr) if v is not None
                else default_thr for v in dvals]
        # rate==1.0 -> threshold 2^64 doesn't fit uint64: full-keep flag
        thr_arr = np.array([min(t, 2**64 - 1) for t in dthr], dtype=_U64)
        full_arr = np.array([t >= 2**64 for t in dthr], dtype=bool)
        idx = np.asarray(
            pc.fill_null(enc.indices, 0).to_numpy(zero_copy_only=False),
            dtype=np.int64)
        null_mask = np.asarray(enc.indices.is_null().to_numpy(
            zero_copy_only=False), dtype=bool)
        mask = full_arr[idx] | (h < thr_arr[idx])
        if null_mask.any():
            if default_thr >= 2**64:
                mask[null_mask] = True
            else:
                mask[null_mask] = h[null_mask] < _U64(default_thr)
        return tbl.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample_sql(
    key_expr: str,
    strata_expr: str,
    rates: dict[str, float],
    seed: int = 0,
    default_rate: float = 0.0,
) -> str:
    """The WHERE predicate matching :func:`stratified_sample` for
    integer keys (shared by the driver oracle): one splitmix64 hash,
    CASE-selected per-stratum threshold."""
    salt = _salt(seed)
    hashed = splitmix64_sql(
        f"CAST(xor(CAST({key_expr} AS UBIGINT), "
        f"CAST({salt} AS UBIGINT)) AS HUGEINT)")
    arms = " ".join(
        f"WHEN '{k}' THEN {_threshold(r)}::HUGEINT"
        for k, r in sorted(rates.items()))
    case = (f"(CASE {strata_expr} {arms} "
            f"ELSE {_threshold(default_rate)}::HUGEINT END)")
    return f"({hashed}) < {case}"


def splitmix64_sql(expr: str) -> str:
    """DuckDB expression computing splitmix64 of a non-negative BIGINT
    expression, bit-exact with :func:`..hashing.splitmix64`.

    All arithmetic runs in HUGEINT mod 2^64; the wrapping 64x64
    multiply splits the left operand into 32-bit halves so no
    intermediate exceeds 2^96 (HUGEINT holds 127 bits). XOR-shift
    steps use integer division for the right shift and the identity
    a XOR b = a + b - 2*(a AND b) is avoided by DuckDB's native
    xor() on BIGINT via back-casting — instead we stay in HUGEINT and
    express XOR of the shifted value with bit arithmetic-free
    ``xor(CAST(... AS UBIGINT), ...)`` on 64-bit-safe values."""
    M = "18446744073709551616"  # 2^64
    H = "4294967296"            # 2^32

    def mod(e: str) -> str:
        return f"(({e}) % {M}::HUGEINT)"

    def xor_shift(e: str, s: int) -> str:
        # values are already < 2^64: cast to UBIGINT for xor/shift
        return (f"CAST(xor(CAST({e} AS UBIGINT), "
                f"CAST(({e}) // {1 << s} AS UBIGINT)) AS HUGEINT)")

    def mulmod(a: str, c: int) -> str:
        return mod(f"(({a}) % {H}) * {c}::HUGEINT "
                   f"+ (((({a}) // {H}) * {c}::HUGEINT) % {H}) * {H}")

    z = mod(f"CAST({expr} AS HUGEINT) + {_GOLDEN}::HUGEINT")
    z = f"({xor_shift(z, 30)})"
    z = mulmod(z, 0xBF58476D1CE4E5B9)
    z = f"({xor_shift(z, 27)})"
    z = mulmod(z, 0x94D049BB133111EB)
    z = f"({xor_shift(z, 31)})"
    return z


def shuffle_by_hash(
    ds: ray.data.Dataset,
    *,
    key_column: str = "doc_id",
    seed: int = 0,
    hash_column: str = "shuffle_key",
) -> ray.data.Dataset:
    """Deterministic global shuffle: order rows by
    ``splitmix64(uint64(key) ^ splitmix64(seed))``.

    The training-order shuffle for emitting examples: unlike
    ``Dataset.random_shuffle`` the permutation depends only on
    (key, seed) — re-runs, resumes and different cluster shapes
    produce the SAME order, and changing ``seed`` gives an
    independent permutation. Implemented as one shuffle-free
    ``map_batches`` computing the hash column followed by
    ``Dataset.sort`` on it — Ray's sample-based range-partitioned
    sort, the one deliberate all-to-all this operator is FOR (a
    global shuffle cannot move less than all the data); downstream
    ``write_parquet`` then emits range-partitioned files whose
    lexical file order IS the training order. The hash column is
    kept in the output so order is externally checkable (the driver
    oracle re-derives it bit-exactly in SQL via
    :func:`splitmix64_sql`)."""
    salt = _salt(seed)

    def fn(tbl: pa.Table) -> pa.Table:
        tbl = tbl.replace_schema_metadata(None)
        col = tbl.column(key_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            keys = np.asarray(col.to_numpy(zero_copy_only=False)
                              ).astype(_U64)
        else:
            keys = stable_hash_strings(col.cast(pa.string()))
        with np.errstate(over="ignore"):
            h = splitmix64(keys ^ _U64(salt))
        return tbl.append_column(hash_column, pa.array(h))

    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    ).sort(hash_column)


def sample_by_hash_sql(key_expr: str, rate: float, seed: int = 0) -> str:
    """The WHERE predicate matching :func:`sample_by_hash` for integer
    keys (shared by the driver oracle)."""
    thr = _threshold(rate)
    salt = _salt(seed)
    hashed = splitmix64_sql(
        f"CAST(xor(CAST({key_expr} AS UBIGINT), "
        f"CAST({salt} AS UBIGINT)) AS HUGEINT)")
    return f"({hashed}) < {thr}::HUGEINT"
