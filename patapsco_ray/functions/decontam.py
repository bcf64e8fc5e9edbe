"""Benchmark decontamination: n-gram overlap against a probe set.

A standard large-scale training-data stage (the reference has no
analogue — this extends the engine the way exact/minhash dedup do):
given a SMALL probe corpus (a benchmark/test set), flag or drop every
training document sharing at least ``min_matches`` distinct
``ngram_size``-token n-grams with it.

Shape for 100 TB: the probe side is small BY DEFINITION (test sets are
thousands-to-millions of rows), so its distinct n-gram hash set is
collected once, sorted, and broadcast via ``ray.put``; the training
corpus then streams through ONE ``map_batches`` — no shuffle, no
materialization of the big side, and the per-batch check is a single
``np.searchsorted`` over the sorted probe hashes. A probe set larger
than ``max_probe_ngrams`` raises with a clear message (at that point
it is not a probe set — partition it and run per shard).

Tokenization and shingling follow the dedup family conventions
(:mod:`.dedup`): lowercase, single-space split, empty tokens dropped,
and documents shorter than the n-gram size contribute their whole
token sequence as one n-gram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .textstats import _seg_count, _tokens
from .hashing import hash_strings

_SEED = 3  # same shingle-hash stream as dedup._distinct_shingles


def _doc_ngram_hashes(
    tbl: pa.Table, text_column: str, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row DISTINCT w-token n-gram hashes.

    Returns (row_idx, hashes, per_row_distinct_count): ``row_idx``
    aligns each hash with its batch row (ascending), and
    ``per_row_distinct_count`` has one entry per batch row (0 for
    token-less rows)."""
    n = tbl.num_rows
    texts = tbl.column(text_column)
    flat, parent, nonempty = _tokens(texts)
    counts = _seg_count(parent, nonempty, n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    kept = flat.filter(pa.array(nonempty)) if parent.size else flat
    total = int(offsets[-1])
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64),
                np.zeros(n, dtype=np.int64))
    nwin = max(total - w + 1, 0)
    starts = np.arange(nwin, dtype=np.int64)
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + w <= offsets[doc_of + 1]
    vstarts = starts[valid]
    vdocs = doc_of[valid]
    if vstarts.size:
        parts = [kept.take(pa.array(vstarts + j)) for j in range(w)]
        sep = pa.array([" "] * len(vstarts), pa.string())
        shing = pc.binary_join_element_wise(*parts, sep)
    else:
        shing = pa.array([], pa.string())
    doc_lens = np.diff(offsets)
    short = np.flatnonzero((doc_lens > 0) & (doc_lens < w))
    if short.size:
        extra = []
        for d in short:
            seg = kept.slice(offsets[d], doc_lens[d]).to_pylist()
            extra.append(" ".join(seg))
        sh_arr = (shing.combine_chunks()
                  if isinstance(shing, pa.ChunkedArray) else shing)
        shing = pa.concat_arrays([sh_arr, pa.array(extra, pa.string())])
        vdocs = np.concatenate([vdocs, short])
    if len(shing) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64),
                np.zeros(n, dtype=np.int64))
    sh_arr = (shing.combine_chunks()
              if isinstance(shing, pa.ChunkedArray) else shing)
    h = hash_strings(sh_arr, seed=_SEED)
    # distinct (row, hash)
    order = np.lexsort((h, vdocs))
    vd, hh = vdocs[order], h[order]
    first = np.ones(vd.size, dtype=bool)
    if vd.size > 1:
        first[1:] = (vd[1:] != vd[:-1]) | (hh[1:] != hh[:-1])
    vd, hh = vd[first], hh[first]
    return vd, hh, np.bincount(vd, minlength=n).astype(np.int64)


def _probe_hashes(
    probes: ray.data.Dataset, text_column: str, w: int,
    max_probe_ngrams: int,
) -> np.ndarray:
    """Collect the probe set's distinct n-gram hashes, sorted."""

    def batch_hashes(tbl: pa.Table) -> pa.Table:
        _, hh, _ = _doc_ngram_hashes(tbl, text_column, w)
        return pa.table({"h": pa.array(np.unique(hh).view(np.int64))})

    parts = [b.column("h").to_numpy(zero_copy_only=False)
             for b in probes.map_batches(
                 batch_hashes, batch_format="pyarrow",
                 zero_copy_batch=True).iter_batches(batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    out = np.unique(np.concatenate(parts))
    if out.size > max_probe_ngrams:
        raise ValueError(
            f"probe set has {out.size} distinct {w}-gram hashes > "
            f"max_probe_ngrams={max_probe_ngrams}; that is a corpus, "
            "not a probe set — shard it and decontaminate per shard")
    return out.view(np.uint64)


class _ContaminationChecker:
    """map_batches actor: broadcast probe hashes held once per actor."""

    def __init__(self, probe_ref, id_column: str, text_column: str,
                 w: int, mode: str, min_matches: int):
        self.probe = np.sort(ray.get(probe_ref))
        self.id_column = id_column
        self.text_column = text_column
        self.w = w
        self.mode = mode
        self.min_matches = min_matches

    def __call__(self, tbl: pa.Table) -> pa.Table:
        vd, hh, n_ngrams = _doc_ngram_hashes(tbl, self.text_column, self.w)
        matched = np.zeros(tbl.num_rows, dtype=np.int64)
        if hh.size and self.probe.size:
            pos = np.searchsorted(self.probe, hh)
            pos[pos == self.probe.size] = 0
            hit = self.probe[pos] == hh
            if hit.any():
                matched += np.bincount(vd[hit], minlength=tbl.num_rows)
        if self.mode == "check":
            return pa.table({
                self.id_column: tbl.column(self.id_column),
                "n_matched": pa.array(matched),
                "n_ngrams": pa.array(n_ngrams),
            })
        keep = matched < self.min_matches
        return tbl.filter(pa.array(keep))


def ngram_contamination(
    docs: ray.data.Dataset,
    probes: ray.data.Dataset,
    *,
    ngram_size: int = 8,
    id_column: str = "doc_id",
    text_column: str = "text",
    probe_text_column: str | None = None,
    max_probe_ngrams: int = 50_000_000,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Per-document contamination report against a probe corpus.

    Returns (``id_column``, n_matched, n_ngrams): the count of the
    document's DISTINCT n-grams found in the probe set, and its total
    distinct n-gram count (0 for token-less documents). A document is
    contaminated when ``n_matched > 0`` (or a caller-chosen higher
    bar)."""
    ref = ray.put(_probe_hashes(
        probes, probe_text_column or text_column, ngram_size,
        max_probe_ngrams))
    from ..util import fixed_pool

    return docs.map_batches(
        _ContaminationChecker,
        fn_constructor_kwargs={
            "probe_ref": ref, "id_column": id_column,
            "text_column": text_column, "w": ngram_size,
            "mode": "check", "min_matches": 1,
        },
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=fixed_pool(concurrency),
    )


def decontaminate(
    docs: ray.data.Dataset,
    probes: ray.data.Dataset,
    *,
    ngram_size: int = 8,
    id_column: str = "doc_id",
    text_column: str = "text",
    probe_text_column: str | None = None,
    min_matches: int = 1,
    max_probe_ngrams: int = 50_000_000,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Drop every document sharing >= ``min_matches`` distinct n-grams
    with the probe set; survivors stream through with ALL their
    columns (one map, no shuffle)."""
    ref = ray.put(_probe_hashes(
        probes, probe_text_column or text_column, ngram_size,
        max_probe_ngrams))
    from ..util import fixed_pool

    return docs.map_batches(
        _ContaminationChecker,
        fn_constructor_kwargs={
            "probe_ref": ref, "id_column": id_column,
            "text_column": text_column, "w": ngram_size,
            "mode": "filter", "min_matches": min_matches,
        },
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=fixed_pool(concurrency),
    )
