"""Posting-list codec: delta-gap + varint, block-structured.

Replaces the Lucene index format the reference delegates to
(/root/reference/patapsco/index.py:20-91, DOCS_AND_FREQS — doc ids and
term frequencies, no positions) with our own compressed layout:

Per term, postings (segment-local doc ordinal, tf) are sorted by
ordinal and split into blocks of ``BLOCK_SIZE``. Each block is
independently decodable:

    varint(first_ordinal) varint(gap)...   # ordinals, delta-gap coded
    varint(tf)...                          # frequencies

Block-max metadata (last ordinal, max tf, min norm byte) is kept
per-block alongside byte offsets so a scorer can skip blocks whose
BM25 upper bound cannot reach the current top-k threshold
(block-max WAND style) and so blocks can be decoded independently.

Both encode and decode are numpy-vectorized (no per-posting Python
loop): encoding fills bytes group-by-group over at most 10 7-bit
groups; decoding splits on stop bytes and accumulates groups.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varint_encode(values: np.ndarray, return_ends: bool = False):
    """Encode an unsigned array as a concatenated LEB128 byte stream.
    ``return_ends=True`` additionally returns the CUMULATIVE byte end
    position of every value (int64; needed to slice a bulk-encoded
    stream — returning ends instead of lengths lets the caller skip a
    second full-length cumsum, which is expensive on this VM where
    fresh-page writes run ~200 MB/s).

    Accepts uint32 input directly (no upcast copy); other dtypes are
    converted, and uint64 input whose max fits 32 bits is narrowed —
    posting deltas/tfs are far below 2^32, and uint32 halves the
    memory traffic of every pass below.
    """
    v = np.asarray(values)
    if v.dtype != np.uint32 and v.dtype != np.uint64:
        v = v.astype(np.uint64)
    if v.size == 0:
        empty = np.empty(0, dtype=np.uint8)
        return (empty, np.empty(0, dtype=np.int64)) if return_ends else empty
    if v.dtype == np.uint64 and int(v.max()) < (1 << 32):
        v = v.astype(np.uint32)
    if v.dtype == np.uint32:
        one = np.uint32(1)
        seven_f = np.uint32(0x7F)
        max_groups = 5
    else:
        one = np.uint64(1)
        seven_f = np.uint64(0x7F)
        max_groups = 10
    # number of 7-bit groups per value (1..max, fits uint8); stop as
    # soon as no value needs another group (typical postings need 1-3)
    nb = np.ones(v.shape, dtype=np.uint8)
    for g in range(1, max_groups):
        m = v >= (one << type(one)(7 * g))
        if not m.any():
            break
        nb += m
    ends = np.cumsum(nb, dtype=np.int64)
    starts = ends - nb
    # every output byte is written exactly once below -> empty, not zeros
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    # first byte of every value (no mask needed)
    first = (v & seven_f).astype(np.uint8)
    if max_nb > 1:
        first |= (nb > 1).astype(np.uint8) << 7
    out[starts] = first
    for g in range(1, max_nb):
        mask = nb > g
        chunk = (v[mask] >> type(one)(7 * g)) & seven_f
        cont = (nb[mask] > g + 1).astype(np.uint8) << 7
        out[starts[mask] + g] = chunk.astype(np.uint8) | cont
    if return_ends:
        return out, ends
    return out


def varint_decode(data: np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte stream back to a uint64 array."""
    b = np.asarray(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    if count is not None:
        ends = ends[:count]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    values = np.zeros(ends.shape, dtype=np.uint64)
    max_len = int(lengths.max())
    for g in range(max_len):
        mask = lengths > g
        chunk = b[starts[mask] + g].astype(np.uint64) & np.uint64(0x7F)
        values[mask] |= chunk << np.uint64(7 * g)
    return values


def encode_postings(ordinals: np.ndarray, tfs: np.ndarray, norms: np.ndarray):
    """Encode one term's postings into block blobs + block-max metadata.

    Args:
        ordinals: sorted segment-local doc ordinals (int64)
        tfs: term frequencies (int64), parallel to ordinals
        norms: per-posting norm BYTES (uint8) of the containing doc
            (used only for the block-max min-norm metadata)

    Returns dict with: postings (bytes), block_offsets, block_counts,
    block_last, block_max_tf, block_min_norm (python lists).
    """
    n = len(ordinals)
    ordinals = np.asarray(ordinals, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)
    blobs = []
    offsets, counts, lasts, max_tfs, min_norms = [], [], [], [], []
    pos = 0
    for start in range(0, n, BLOCK_SIZE):
        stop = min(start + BLOCK_SIZE, n)
        block_ords = ordinals[start:stop]
        deltas = np.empty(stop - start, dtype=np.uint64)
        deltas[0] = block_ords[0]
        deltas[1:] = np.diff(block_ords).astype(np.uint64)
        blob = np.concatenate(
            [varint_encode(deltas), varint_encode(tfs[start:stop].astype(np.uint64))]
        )
        offsets.append(pos)
        counts.append(stop - start)
        lasts.append(int(block_ords[-1]))
        max_tfs.append(int(tfs[start:stop].max()))
        min_norms.append(int(norms[start:stop].min()) if norms.size else 0)
        blobs.append(blob)
        pos += blob.size
    return {
        "postings": np.concatenate(blobs).tobytes() if blobs else b"",
        "block_offsets": offsets,
        "block_counts": counts,
        "block_last": lasts,
        "block_max_tf": max_tfs,
        "block_min_norm": min_norms,
    }


def decode_postings(
    blob: bytes,
    block_offsets,
    block_counts,
    blocks: list[int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode (all or selected) blocks of a term's postings.

    Returns (ordinals int64, tfs int64). ``blocks`` selects block
    indices (ascending) for block-max skipping; None decodes all.
    """
    buf = np.frombuffer(blob, dtype=np.uint8)
    nblocks = len(block_offsets)
    if blocks is None:
        # full decode: ONE vectorized varint pass over the whole blob,
        # then a reset-cumsum over block boundaries. The per-block loop
        # below costs ~2650 numpy calls for a df=340k term; this path
        # is two.
        counts = np.asarray(block_counts, dtype=np.int64)
        n = int(counts.sum())
        if n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        vals = varint_decode(buf, count=2 * n)
        # stream layout per block i (start s_i, count c_i): values
        # [2*s_i, s_i+e_i) are deltas, [s_i+e_i, 2*e_i) are tfs
        ends = np.cumsum(counts)
        starts = ends - counts
        p = np.arange(n)
        s_of_p = np.repeat(starts, counts)
        e_of_p = np.repeat(ends, counts)
        deltas = vals[p + s_of_p].astype(np.int64)
        tfs = vals[p + e_of_p].astype(np.int64)
        cs = np.cumsum(deltas)
        # ords[j] = cs[j] - (cs[s] - deltas[s]) within j's block
        block_base = np.repeat(cs[starts] - deltas[starts], counts)
        return cs - block_base, tfs
    ords_out, tfs_out = [], []
    for bi in blocks:
        start = block_offsets[bi]
        end = block_offsets[bi + 1] if bi + 1 < nblocks else buf.size
        count = block_counts[bi]
        vals = varint_decode(buf[start:end], count=2 * count)
        deltas = vals[:count].astype(np.int64)
        tfs = vals[count:2 * count].astype(np.int64)
        ords_out.append(np.cumsum(deltas))
        tfs_out.append(tfs)
    if not ords_out:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(ords_out), np.concatenate(tfs_out)


def encode_postings_bulk(
    ords_cat: np.ndarray,
    tfs_cat: np.ndarray,
    norms_cat: np.ndarray,
    term_offsets: np.ndarray,
) -> dict:
    """Encode EVERY term's postings of a segment in one vectorized
    pass (byte-identical to per-term ``encode_postings``).

    Per-term numpy calls cost more than the work itself at web-corpus
    term counts (measured: ~70% of segment-build time); here the delta
    coding, varint encoding and per-block metadata are each computed
    once over the concatenated arrays, then sliced per term.

    Args:
        ords_cat: all terms' sorted ordinals, concatenated in term order
        tfs_cat / norms_cat: parallel tf and norm-byte arrays
        term_offsets: int64 array (T+1); term t owns
            ``[term_offsets[t], term_offsets[t+1])``

    Returns dict with concatenated per-term columns: data (bytes of the
    whole stream), term_byte_offsets (T+1 into data), and flat
    per-block arrays + blocks_per_term for building Arrow list columns.
    """
    n = int(ords_cat.size)
    counts = np.diff(term_offsets)
    nb_per_term = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    total_blocks = int(nb_per_term.sum())
    block_term = np.repeat(np.arange(len(counts)), nb_per_term)
    first_block_of_term = np.cumsum(nb_per_term) - nb_per_term
    within = np.arange(total_blocks) - first_block_of_term[block_term]
    block_start = term_offsets[block_term] + within * BLOCK_SIZE
    block_end = np.minimum(block_start + BLOCK_SIZE,
                           term_offsets[block_term + 1])
    block_counts = (block_end - block_start).astype(np.int64)

    # delta-gap coding: every block's first value is the absolute
    # ordinal (blocks decode independently); blocks tile the arrays.
    # Segment-local ordinals and tfs always fit int32 — the whole
    # stream stays 32-bit (half the fresh-page writes; see
    # varint_encode note on this VM's first-touch cost)
    # 2*n must also fit int32: the scatter indices p + s_of_p/e_of_p
    # reach 2n-1, which overflows int32 for a single encode call with
    # >= 2^30 postings (possible for the shuffle build's one global
    # segment at scale)
    small = (2 * n < (1 << 31)
             and int(ords_cat.max()) < (1 << 31)
             and int(tfs_cat.max()) < (1 << 31)) if n else True
    if small:
        o = ords_cat.astype(np.int32, copy=False)
        deltas = o.copy()
        deltas[1:] -= o[:-1]
        deltas[block_start] = o[block_start]
        # positions 2n fit int32 for any realistic segment (< 2^30
        # postings); fancy-index assignment accepts int32 indices
        p = np.arange(n, dtype=np.int32)
        s_of_p = np.repeat(block_start.astype(np.int32), block_counts)
        e_of_p = np.repeat(block_end.astype(np.int32), block_counts)
        stream = np.empty(2 * n, dtype=np.uint32)
        # deltas/tfs are non-negative -> bit-identical as uint32 views
        stream[p + s_of_p] = deltas.view(np.uint32)
        tf32 = tfs_cat.astype(np.int32, copy=False)
        stream[p + e_of_p] = tf32.view(np.uint32)
    else:  # pragma: no cover - >2^31 ordinals never occur per segment
        deltas = ords_cat.astype(np.int64, copy=True)
        deltas[1:] -= ords_cat[:-1]
        deltas[block_start] = ords_cat[block_start]
        p = np.arange(n)
        s_of_p = np.repeat(block_start, block_counts)
        e_of_p = np.repeat(block_end, block_counts)
        stream = np.empty(2 * n, dtype=np.uint64)
        stream[p + s_of_p] = deltas.astype(np.uint64)
        stream[p + e_of_p] = tfs_cat.astype(np.uint64)

    data, ends = varint_encode(stream, return_ends=True)

    # byte position of value k is ends[k-1] (0 for k=0): gather the
    # per-block starts directly instead of materializing a 2n+1 cumsum
    idx = 2 * block_start
    safe = np.maximum(idx, 1) - 1
    block_byte_start = np.where(idx > 0, ends[safe], 0)
    term_first_block_byte = block_byte_start[first_block_of_term]
    term_byte_offsets = np.empty(len(counts) + 1, dtype=np.int64)
    term_byte_offsets[:-1] = term_first_block_byte
    term_byte_offsets[-1] = int(ends[-1]) if n else 0
    block_offsets_rel = block_byte_start - term_first_block_byte[block_term]

    block_last = ords_cat[block_end - 1].astype(np.int64)
    block_max_tf = np.maximum.reduceat(
        tfs_cat, block_start) if n else np.empty(0, dtype=tfs_cat.dtype)
    block_min_norm = np.minimum.reduceat(
        norms_cat, block_start) if n else np.empty(0, dtype=np.uint8)

    return {
        "data": data.tobytes(),
        "term_byte_offsets": term_byte_offsets,
        "blocks_per_term": nb_per_term.astype(np.int64),
        "block_offsets": block_offsets_rel.astype(np.int32),
        "block_counts": block_counts.astype(np.int32),
        "block_last": block_last,
        "block_max_tf": block_max_tf.astype(np.int32),
        "block_min_norm": block_min_norm.astype(np.int32),
    }


def encode_positions_bulk(
    positions: np.ndarray, tfs_cat: np.ndarray, term_offsets: np.ndarray
) -> dict:
    """Encode within-document token positions for every posting.

    ``positions`` is the flat position stream aligned with the posting
    arrays: term-major, posting(ordinal)-major, position-ascending
    inside each posting — posting j owns the slice of length
    ``tfs_cat[j]``. Encoding is one vectorized delta pass (first
    position of each posting absolute, gaps after) into a single LEB128
    stream, sliced per TERM by byte offsets (decode never needs random
    access below term granularity: a term's positions decode in one
    ``varint_decode`` of ``cf`` values and split by its tfs).

    Returns {"data": bytes, "term_byte_offsets": int64[T+1]}.
    """
    positions = np.asarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs_cat, dtype=np.int64)
    term_offsets = np.asarray(term_offsets, dtype=np.int64)
    T = len(term_offsets) - 1
    n = positions.size
    if n == 0:
        return {"data": b"", "term_byte_offsets": np.zeros(T + 1, np.int64)}
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = positions[0]
    deltas[1:] = positions[1:] - positions[:-1]
    pair_first = np.cumsum(tfs) - tfs  # flat index of each posting's start
    deltas[pair_first] = positions[pair_first]
    data, ends = varint_encode(deltas, return_ends=True)
    # values per term = sum of its postings' tfs
    csum = np.concatenate([[0], np.cumsum(tfs)])
    cf = csum[term_offsets[1:]] - csum[term_offsets[:-1]]
    cum_cf = np.cumsum(cf)
    tb = np.zeros(T + 1, dtype=np.int64)
    nz = cum_cf > 0
    tb[1:][nz] = ends[cum_cf[nz] - 1]
    np.maximum.accumulate(tb, out=tb)  # carry offsets across empty terms
    return {"data": data.tobytes(), "term_byte_offsets": tb}


def decode_positions(blob, cf: int, tfs: np.ndarray) -> np.ndarray:
    """Decode one term's position stream back to absolute positions.

    ``tfs`` are the term's decoded per-posting frequencies (posting j
    owns ``tfs[j]`` consecutive values). Returns the flat int64
    position array, posting-major, ascending within each posting.
    """
    b = np.frombuffer(blob, dtype=np.uint8)
    deltas = varint_decode(b, count=cf).astype(np.int64)
    if deltas.size == 0:
        return deltas
    tfs = np.asarray(tfs, dtype=np.int64)
    c = np.cumsum(deltas)
    first = np.cumsum(tfs) - tfs
    # subtract the running total just before each posting's first value
    base = np.where(first > 0, c[np.maximum(first, 1) - 1], 0)
    return c - np.repeat(base, tfs)
