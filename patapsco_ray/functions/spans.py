"""Duplicate n-gram span detection and removal (substring-level dedup).

Document-level dedup (exact/minhash/simhash, :mod:`.dedup`) misses the
dominant duplication mode in web corpora: long REPEATED SPANS inside
otherwise-distinct pages (boilerplate, quoted paragraphs, syndicated
text). Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022) remove every 50-token span appearing more than once
in the corpus via a suffix array; the scalable shuffle-friendly
equivalent implemented here detects duplicated FIXED-LENGTH token
windows by hashing — every length->=n duplicated span is a run of
duplicated n-token windows, so window hashing recovers the same
maximal regions with resolution ``n``.

Semantics (mirrored exactly by the SQL oracle in ``__ray_entry__``):

- tokens: lowercase, split on single spaces, empties dropped (the
  dedup-family convention, :func:`..functions.textstats._tokens`);
- windows: every ``n``-token window, 0-based start position over the
  filtered token sequence; documents with fewer than ``n`` tokens
  contribute no windows;
- a window is duplicated when its n-gram occurs >= 2 times in the
  corpus IN TOTAL (two occurrences inside one document count —
  self-repetition is duplication too);
- spans: per document, duplicated windows that overlap OR touch merge
  ([s1,e1) and [s2,e2) merge when ``s2 <= e1``); the outputs are the
  merged maximal ``(doc, span_start, span_end)`` token ranges.

Shape for 100 TB:

- pass 1 pre-aggregates inside each batch (``np.unique`` with counts)
  so only distinct ``(hash, count)`` rows enter the one shuffle — a
  hash-partitioned ``groupby.map_groups`` whose per-partition fold is
  a single ``np.add.reduceat`` (NOT ``groupby(h).sum``: window hashes
  are nearly all distinct, and Ray's per-key aggregation over a
  corpus-token-count-sized key space measured 15x slower);
- pass 2 is adaptive (the dedup-family pattern): when the duplicated
  n-gram set fits ``max_broadcast_ngrams`` it is broadcast once via
  ``ray.put`` (sorted uint64, 8 B/ngram) and the corpus streams
  through one shuffle-free ``map_batches``; above the cap the window
  table is inner-joined against the duplicated-hash table
  (hash-partitioned, nothing driver-side) and spans are merged
  vectorized per coarse hash partition — one Python call per
  partition, never per document.

Duplication is decided by 64-bit n-gram hash equality, like the rest
of the hash-dedup family: at ~1e13 windows the expected number of
colliding window pairs is ~1e6 (birthday bound), i.e. a vanishing
false-duplicate rate that standard large-scale pipelines accept.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _hash_part
from .hashing import hash_strings
from .textstats import _seg_count, _tokens

_LOG = logging.getLogger(__name__)

_SEED = 3  # the shingle-hash stream shared with dedup/decontam
_SPAN_PARTS = 64  # coarse partitions for the distributed merge
_AGG_PARTS = 256  # pass-1 count-fold partitions (~1M rows each at 3M
# docs; at larger corpora raise via _dup_hash_table(agg_partitions=)
# so one partition's distinct (h, c) rows stay ~100 MB)


def _windows(tbl: pa.Table, text_column: str, w: int):
    """All ``w``-token windows of a batch.

    Returns ``(row_idx, start_pos, hashes)`` in row-major,
    position-ascending order (the order the span merge relies on).
    Rows with fewer than ``w`` tokens contribute no windows.
    """
    n = tbl.num_rows
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=np.uint64))
    texts = tbl.column(text_column)
    flat, parent, nonempty = _tokens(texts)
    counts = _seg_count(parent, nonempty, n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])
    if total < w:
        return empty
    kept = flat.filter(pa.array(nonempty)) if parent.size else flat
    starts = np.arange(total - w + 1, dtype=np.int64)
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + w <= offsets[doc_of + 1]
    vstarts = starts[valid]
    if not vstarts.size:
        return empty
    vdocs = doc_of[valid]
    parts = [kept.take(pa.array(vstarts + j)) for j in range(w)]
    sep = pa.array([" "] * len(vstarts), pa.string())
    grams = pc.binary_join_element_wise(*parts, sep)
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    h = hash_strings(grams, seed=_SEED)
    return vdocs, vstarts - offsets[vdocs], h


def _merge_runs(docs: np.ndarray, pos: np.ndarray, w: int):
    """Merge row-major position-sorted duplicated windows into maximal
    spans. All windows share length ``w`` so ends are monotone within a
    row and a new span starts exactly when the gap to the previous
    window exceeds ``w``. Returns ``(starts_at, span_start, span_end)``
    where ``starts_at`` indexes the first window of each span (so
    ``docs[starts_at]`` is each span's row).
    """
    if docs.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    brk = np.ones(docs.size, dtype=bool)
    brk[1:] = (docs[1:] != docs[:-1]) | (pos[1:] > pos[:-1] + w)
    starts_at = np.flatnonzero(brk)
    ends_at = np.concatenate([starts_at[1:], [docs.size]]) - 1
    return starts_at, pos[starts_at], pos[ends_at] + w


def _dup_hash_table(docs: ray.data.Dataset, text_column: str, w: int,
                    agg_partitions: int = _AGG_PARTS) -> ray.data.Dataset:
    """(h:int64) table of n-gram hashes occurring >= 2 times corpus-wide.

    Batch combiner first (distinct hash + count per batch), then ONE
    shuffle: the (h, c) rows are hash-partitioned on ``h % P`` and each
    partition folds its counts with a single ``np.add.reduceat`` pass.
    A ``groupby("h").sum("c")`` is the same shuffle but pays Ray's
    per-key aggregation over ~every window hash in the corpus (window
    hashes are nearly all distinct — ~93 windows/doc at w=50 means the
    key cardinality tracks the corpus token count): measured 1,371 s at
    3M docs / 280M keys vs ~90 s for this partitioned reduceat shape."""

    def partial(tbl: pa.Table) -> pa.Table:
        _, _, h = _windows(tbl, text_column, w)
        uh, c = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uh.view(np.int64)),
            "c": pa.array(c.astype(np.int64)),
            "hpart": pa.array((uh % np.uint64(agg_partitions))
                              .astype(np.int64)),
        })

    def dups_in_part(grp: pa.Table) -> pa.Table:
        h = grp.column("h").to_numpy(zero_copy_only=False)
        c = grp.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, cs = h[order], c[order]
        brk = np.ones(hs.size, dtype=bool)
        brk[1:] = hs[1:] != hs[:-1]
        firsts = np.flatnonzero(brk)
        sums = np.add.reduceat(cs, firsts) if firsts.size else cs[:0]
        return pa.table({"h": pa.array(hs[firsts][sums >= 2])})

    return (docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("hpart")
            .map_groups(dups_in_part, batch_format="pyarrow"))


class _SpanFinder:
    """map_batches actor for the broadcast path: the sorted duplicated
    hash array is fetched once per actor, each batch pays one
    ``np.searchsorted`` probe."""

    def __init__(self, dup_ref, id_column: str, text_column: str, w: int,
                 mode: str):
        self.dup = ray.get(dup_ref)
        self.id_column = id_column
        self.text_column = text_column
        self.w = w
        self.mode = mode

    def _hits(self, tbl: pa.Table):
        vdocs, pos, h = _windows(tbl, self.text_column, self.w)
        if h.size == 0 or self.dup.size == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        loc = np.searchsorted(self.dup, h)
        loc[loc == self.dup.size] = 0
        hit = self.dup[loc] == h
        return vdocs[hit], pos[hit]

    def __call__(self, tbl: pa.Table) -> pa.Table:
        vdocs, pos = self._hits(tbl)
        if self.mode == "spans":
            starts_at, s, e = _merge_runs(vdocs, pos, self.w)
            ids = tbl.column(self.id_column).take(pa.array(vdocs[starts_at]))
            return pa.table({self.id_column: ids,
                             "span_start": pa.array(s, pa.int64()),
                             "span_end": pa.array(e, pa.int64())})
        return _remove_covered(tbl, self.text_column, self.w, vdocs, pos)


def _remove_covered(tbl: pa.Table, text_column: str, w: int,
                    vdocs: np.ndarray, pos: np.ndarray) -> pa.Table:
    """Rewrite ``text_column`` with every token covered by a duplicated
    window removed; all other columns pass through untouched."""
    n = tbl.num_rows
    texts = tbl.column(text_column)
    flat, parent, nonempty = _tokens(texts)
    counts = _seg_count(parent, nonempty, n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])
    # rebuild from the ORIGINAL-case tokens (matching is lowercased,
    # output text is not): same split -> same positions and the same
    # nonempty mask, since lowercasing never empties a token
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    raw_flat = pc.list_flatten(pc.split_pattern(texts, " "))
    kept = raw_flat.filter(pa.array(nonempty)) if parent.size else raw_flat
    # interval-diff trick: +1 at each covered-window start, -1 past its
    # end, cumsum > 0 == covered — no per-span loop
    cover = np.zeros(total + 1, dtype=np.int64)
    if vdocs.size:
        starts_flat = offsets[vdocs] + pos
        np.add.at(cover, starts_flat, 1)
        np.add.at(cover, starts_flat + w, -1)
    keep_tok = np.cumsum(cover[:total]) == 0
    new_counts = (np.bincount(parent[nonempty][keep_tok] if parent.size
                              else np.empty(0, dtype=np.int64),
                              minlength=n)
                  if total else np.zeros(n, dtype=np.int64))
    # wait-free rebuild: list array over surviving tokens, joined by ' '
    new_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(new_counts, out=new_offsets[1:])
    surv = kept.filter(pa.array(keep_tok)) if total else kept
    if isinstance(surv, pa.ChunkedArray):
        surv = surv.combine_chunks()
    lists = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), surv)
    new_text = pc.binary_join(lists, " ")
    out = {name: (new_text if name == text_column else tbl.column(name))
           for name in tbl.column_names}
    return pa.table(out)


def duplicate_spans(
    docs: ray.data.Dataset,
    *,
    ngram_size: int = 50,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_broadcast_ngrams: int = 20_000_000,
    join_partitions: int | None = None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Maximal duplicated-span token ranges per document.

    Returns ``(id_column, span_start, span_end)`` — 0-based token
    indices, end exclusive — for every maximal merged run of
    ``ngram_size``-token windows whose n-gram occurs >= 2 times in the
    corpus. See the module docstring for exact semantics and the
    adaptive broadcast/join execution shape.
    """
    from ..util import fixed_pool
    from .windows import _field_type, _pin

    if join_partitions is None:
        from ..util import auto_join_partitions

        join_partitions = auto_join_partitions()
    dup = _dup_hash_table(docs, text_column, ngram_size).materialize()
    n_dup = dup.count()
    idt = _field_type(docs, id_column)
    schema = pa.schema([(id_column, idt), ("span_start", pa.int64()),
                        ("span_end", pa.int64())])
    if n_dup == 0:
        return ray.data.from_arrow(schema.empty_table())

    if n_dup <= max_broadcast_ngrams:
        arr = np.sort(np.concatenate([
            b.column("h").to_numpy(zero_copy_only=False)
            for b in dup.iter_batches(batch_format="pyarrow")
            if b.num_rows]).view(np.uint64))
        ref = ray.put(arr)
        return docs.map_batches(
            _SpanFinder,
            fn_constructor_kwargs={
                "dup_ref": ref, "id_column": id_column,
                "text_column": text_column, "w": ngram_size,
                "mode": "spans"},
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=fixed_pool(concurrency),
        ).map_batches(_pin(schema), batch_format="pyarrow")

    _LOG.info(
        "duplicate_spans: %d duplicated n-grams > max_broadcast_ngrams=%d"
        " — using a hash-partitioned inner join", n_dup,
        max_broadcast_ngrams)

    def emit(tbl: pa.Table) -> pa.Table:
        vdocs, pos, h = _windows(tbl, text_column, ngram_size)
        ids = tbl.column(id_column).take(pa.array(vdocs))
        return pa.table({id_column: ids,
                         "pos": pa.array(pos, pa.int64()),
                         "h": pa.array(h.view(np.int64))})

    win_schema = pa.schema([(id_column, idt), ("pos", pa.int64()),
                            ("h", pa.int64())])
    wins = docs.map_batches(emit, batch_format="pyarrow",
                            zero_copy_batch=True).map_batches(
        _pin(win_schema), batch_format="pyarrow")
    pinned = dup.map_batches(_pin(pa.schema([("h", pa.int64())])),
                             batch_format="pyarrow")
    matched = wins.join(pinned, join_type="inner",
                        num_partitions=join_partitions, on=("h",))

    def part_of(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "part", _hash_part(tbl.column(id_column), _SPAN_PARTS, seed=7))

    def merge_part(grp: pa.Table) -> pa.Table:
        ids = grp.column(id_column).combine_chunks()
        pos = grp.column("pos").to_numpy(zero_copy_only=False)
        # vectorized doc grouping inside the partition: dictionary-
        # encode ids to dense codes, lexsort (code, pos), merge runs
        codes = _codes(ids)
        order = np.lexsort((pos, codes))
        starts_at, s, e = _merge_runs(codes[order], pos[order], ngram_size)
        return pa.table({
            id_column: ids.take(pa.array(order[starts_at])),
            "span_start": pa.array(s, pa.int64()),
            "span_end": pa.array(e, pa.int64())})

    return (matched.map_batches(part_of, batch_format="pyarrow")
            .groupby("part").map_groups(merge_part, batch_format="pyarrow")
            .map_batches(_pin(schema), batch_format="pyarrow"))


def remove_duplicate_spans(
    docs: ray.data.Dataset,
    *,
    ngram_size: int = 50,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_broadcast_ngrams: int = 20_000_000,
    join_partitions: int | None = None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Rewrite every document with its duplicated spans deleted.

    Tokens covered by ANY duplicated ``ngram_size``-window are removed
    and the survivors re-joined with single spaces (a fully-covered
    document keeps an empty string); all other columns stream through
    untouched. Broadcast path under ``max_broadcast_ngrams``; above it
    the spans come from :func:`duplicate_spans`'s join path and are
    attached back onto the documents with a left_outer join — no
    driver-side state either way.
    """
    from ..util import fixed_pool

    if join_partitions is None:
        from ..util import auto_join_partitions

        join_partitions = auto_join_partitions()
    dup = _dup_hash_table(docs, text_column, ngram_size).materialize()
    n_dup = dup.count()
    if n_dup == 0:
        return docs
    if n_dup <= max_broadcast_ngrams:
        arr = np.sort(np.concatenate([
            b.column("h").to_numpy(zero_copy_only=False)
            for b in dup.iter_batches(batch_format="pyarrow")
            if b.num_rows]).view(np.uint64))
        ref = ray.put(arr)
        return docs.map_batches(
            _SpanFinder,
            fn_constructor_kwargs={
                "dup_ref": ref, "id_column": id_column,
                "text_column": text_column, "w": ngram_size,
                "mode": "remove"},
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=fixed_pool(concurrency),
        )

    _LOG.info(
        "remove_duplicate_spans: %d duplicated n-grams > "
        "max_broadcast_ngrams=%d — joining spans back per document",
        n_dup, max_broadcast_ngrams)
    spans = duplicate_spans(
        docs, ngram_size=ngram_size, id_column=id_column,
        text_column=text_column,
        max_broadcast_ngrams=max_broadcast_ngrams,
        join_partitions=join_partitions, concurrency=concurrency)
    joined = docs.join(spans, join_type="left_outer",
                       num_partitions=join_partitions, on=(id_column,))

    def part_of(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "part", _hash_part(tbl.column(id_column), _SPAN_PARTS, seed=7))

    cols = docs.schema().names

    def apply_part(grp: pa.Table) -> pa.Table:
        # a document appears once per span (left_outer fan-out) or once
        # with a null span; collapse to one row per doc in sorted-code
        # order, then cover each doc's tokens per span
        if grp.num_rows == 0:
            return grp.select(cols)
        ids = grp.column(id_column).combine_chunks()
        codes = _codes(ids)
        valid_arr = pc.is_valid(
            grp.column("span_start").combine_chunks()).to_numpy(
            zero_copy_only=False)
        s = np.where(valid_arr, pc.fill_null(
            grp.column("span_start"), 0).to_numpy(zero_copy_only=False), 0)
        e = np.where(valid_arr, pc.fill_null(
            grp.column("span_end"), 0).to_numpy(zero_copy_only=False), 0)
        order = np.lexsort((s, codes))
        sc = codes[order]
        newdoc = np.concatenate([[True], sc[1:] != sc[:-1]])
        # one base row per doc, in the SAME sorted-code order the span
        # row_of ranks use
        base = grp.select(cols).take(pa.array(order[newdoc]))
        row_of = np.cumsum(newdoc) - 1
        valid = valid_arr[order]
        exp_docs, exp_pos = _expand_spans(
            row_of[valid], s[order][valid].astype(np.int64),
            e[order][valid].astype(np.int64))
        # spans are variable-width, so cover them as width-1 windows
        return _remove_covered(base, text_column, 1, exp_docs, exp_pos)

    return (joined.map_batches(part_of, batch_format="pyarrow")
            .groupby("part").map_groups(apply_part, batch_format="pyarrow"))


def _codes(ids: pa.Array) -> np.ndarray:
    """Dense int64 group codes for an id array (dictionary indices)."""
    enc = pc.dictionary_encode(ids)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False)


def _expand_spans(rows: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Expand [start, end) spans into unit-width cover positions,
    vectorized (repeat + ranges via cumsum)."""
    widths = (ends - starts).astype(np.int64)
    widths = np.maximum(widths, 0)
    total = int(widths.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    exp_rows = np.repeat(rows, widths)
    offs = np.concatenate([[0], np.cumsum(widths)[:-1]])
    idx = np.arange(total, dtype=np.int64) - np.repeat(offs, widths)
    exp_pos = np.repeat(starts, widths) + idx
    return exp_rows, exp_pos
