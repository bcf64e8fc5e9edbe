"""Training-data chunking: split documents into fixed-size token
windows with overlap (the standard LLM pre-training packer input).

One ``map_batches`` stage, no shuffle. Chunk boundaries are pure
arithmetic over the whitespace token stream (the tokenization
convention shared with the DuckDB oracles): chunk ``i`` of a document
covers tokens ``[i*stride, i*stride + chunk_size)`` where
``stride = chunk_size - overlap``, for every start < n_tokens; empty
documents produce no chunks. Chunk text assembly is vectorized by
grouping chunks on their (few, bounded) distinct start offsets and
running ``pyarrow list_slice + binary_join`` once per offset — no
Python loop over rows or chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
    include_text: bool = True,
) -> ray.data.Dataset:
    """(id, chunk_index, start_token, n_tokens[, chunk_text]) rows.

    ``include_text=False`` skips string assembly and returns the
    arithmetic layout only (cheapest; downstream packers that read
    token ids elsewhere don't need the text copied)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        low = pc.utf8_lower(texts)
        toks = pc.split_pattern(low, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy().astype(
            np.int64, copy=False)
        nonempty = np.asarray(
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False),
            dtype=bool)
        n = tbl.num_rows
        counts = (np.bincount(parent, weights=nonempty.astype(np.float64),
                              minlength=n).astype(np.int64)
                  if parent.size else np.zeros(n, dtype=np.int64))
        # clean token lists (empties dropped) for list_slice assembly
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        kept = flat.filter(pa.array(nonempty)) if parent.size else flat
        clean = pa.ListArray.from_arrays(pa.array(offsets), kept)

        nchunks = np.where(counts > 0,
                           (np.maximum(counts - 1, 0) // stride) + 1, 0)
        doc_of = np.repeat(np.arange(n), nchunks)
        total = int(nchunks.sum())
        chunk_idx = (np.arange(total, dtype=np.int64)
                     - np.repeat(np.cumsum(nchunks) - nchunks, nchunks))
        starts = chunk_idx * stride
        lens = np.minimum(counts[doc_of] - starts, chunk_size)
        cols = {
            id_column: tbl.column(id_column).take(pa.array(doc_of)),
            "chunk_index": pa.array(chunk_idx),
            "start_token": pa.array(starts),
            "n_tokens": pa.array(lens),
        }
        if include_text:
            if total == 0:
                cols["chunk_text"] = pa.array([], pa.string())
            else:
                row_parts, txt_parts = [], []
                for s in np.unique(starts):
                    rows = np.flatnonzero(starts == s)
                    sub = clean.take(pa.array(doc_of[rows]))
                    sliced = pc.list_slice(sub, int(s), int(s) + chunk_size)
                    joined = pc.binary_join(sliced, " ")
                    if isinstance(joined, pa.ChunkedArray):
                        joined = joined.combine_chunks()
                    row_parts.append(rows)
                    txt_parts.append(joined)
                inv = np.argsort(np.concatenate(row_parts),
                                 kind="stable")
                cols["chunk_text"] = pa.concat_arrays(txt_parts).take(
                    pa.array(inv))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    budget: int,
    id_column: str = "doc_id",
    text_column: str = "text",
    group_column: str | None = None,
    tokens_column: str | None = None,
) -> ray.data.Dataset:
    """Greedy sequence packing: assign documents to fixed token-budget
    packs (the step between chunking and emitting training examples).

    Semantics (deterministic, cluster-shape independent): within each
    group, documents are visited in ``id_column`` order and appended to
    the current pack while the pack's token total stays <= ``budget``;
    the first document that would overflow starts a new pack. A single
    document longer than ``budget`` occupies a pack of its own.
    Zero-token documents ride along in the current pack. Returns
    (id, [group,] pack_id, pack_pos, n_tokens) with ``pack_id`` 0-based
    per group and ``pack_pos`` the document's position inside its pack.

    Scale shape: token counting happens BEFORE the shuffle in a
    shuffle-free ``map_batches`` (whitespace convention shared with
    :func:`chunk_documents` / the DuckDB oracles, skipped when the
    caller supplies ``tokens_column``), so the groupby moves only
    (id, group, n_tokens) — ~24 B/doc regardless of document size.
    Groups are the packing unit AND the parallelism unit: pass a shard
    key (date bucket, source, lang) so packs build independently per
    group; ``group_column=None`` packs the whole dataset as ONE group,
    which is inherently sequential — fine for bounded corpora, not the
    100-TB path. Inside each group the greedy scan is vectorized: one
    ``searchsorted`` computes every possible pack end at once and the
    boundary orbit is walked with O(#packs) array lookups — no per-row
    Python loop.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    grp = group_column

    def count_tokens(tbl: pa.Table) -> pa.Table:
        tbl = tbl.replace_schema_metadata(None)
        if tokens_column is not None:
            n_tok = pc.cast(tbl.column(tokens_column), pa.int64())
        else:
            toks = pc.split_pattern(
                pc.utf8_lower(tbl.column(text_column)), " ")
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks).to_numpy().astype(
                np.int64, copy=False)
            nonempty = np.asarray(
                pc.not_equal(flat, "").to_numpy(zero_copy_only=False),
                dtype=bool)
            counts = (np.bincount(
                parent, weights=nonempty.astype(np.float64),
                minlength=tbl.num_rows).astype(np.int64)
                if parent.size else np.zeros(tbl.num_rows, dtype=np.int64))
            n_tok = pa.array(counts)
        cols = {id_column: tbl.column(id_column), "n_tokens": n_tok}
        if grp is not None:
            gvals = tbl.column(grp)
            cols[grp] = gvals
            # shuffle key is hash(group) % P, not the group itself:
            # one vectorized pack_part call per PARTITION of groups
            # (sessionize's pattern), yet every group still lands
            # whole inside one call
            from .hashing import hash_strings
            keys = pc.cast(gvals, pa.string()).combine_chunks()
            cols["_part"] = pa.array(
                (hash_strings(keys) % np.uint64(num_parts)
                 ).astype(np.int64))
        else:
            cols["_g"] = pa.array(np.zeros(tbl.num_rows, dtype=np.int64))
            cols["_part"] = pa.array(np.zeros(tbl.num_rows, dtype=np.int64))
        return pa.table(cols)

    gcol = grp if grp is not None else "_g"
    num_parts = max(int(ray.cluster_resources().get("CPU", 4)) * 2, 8)
    slim = ds.map_batches(count_tokens, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pack_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part.append_column(
                "pack_id", pa.array([], pa.int64())).append_column(
                "pack_pos", pa.array([], pa.int64()))
        part = part.combine_chunks()
        order = pc.sort_indices(
            part.select([gcol, id_column]),
            sort_keys=[(gcol, "ascending"), (id_column, "ascending")])
        part = part.take(order)
        n = np.asarray(pc.cast(part.column("n_tokens"), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
        keys = part.column(gcol).to_numpy(zero_copy_only=False)
        rows = len(n)
        new_grp = np.empty(rows, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = keys[1:] != keys[:-1]
        gstart = np.flatnonzero(new_grp)               # group first rows
        gend = np.append(gstart[1:], rows)             # group end (excl)
        gidx = np.cumsum(new_grp) - 1                  # row -> group no.
        c = np.cumsum(n)
        base = np.concatenate([[0], c])                # c before row i
        # every candidate pack end at once: a pack starting at i covers
        # rows while cumsum - base[i] <= budget; >= i+1 keeps oversize
        # docs in their own pack; clamp to the row's group end
        nxt = np.searchsorted(c, base[:rows] + budget, side="right")
        nxt = np.minimum(np.maximum(nxt, np.arange(rows) + 1), gend[gidx])
        pack_id = np.empty(rows, dtype=np.int64)
        pack_pos = np.empty(rows, dtype=np.int64)
        for s0, e0 in zip(gstart, gend):               # O(#packs) walk
            s, p = int(s0), 0
            while s < e0:
                e = int(nxt[s])
                pack_id[s:e] = p
                pack_pos[s:e] = np.arange(e - s)
                s, p = e, p + 1
        return part.append_column(
            "pack_id", pa.array(pack_id)).append_column(
            "pack_pos", pa.array(pack_pos))

    out = slim.groupby("_part").map_groups(
        lambda g: pack_part(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    if grp is None:
        out = out.drop_columns(["_g"])
    return out
