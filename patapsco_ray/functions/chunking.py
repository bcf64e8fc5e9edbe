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
