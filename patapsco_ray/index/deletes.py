"""Document deletes (tombstones) for built indexes.

Lucene-style two-phase semantics (public Lucene behavior; the
reference delegates to Lucene and never exposes deletes, so this is a
beyond-reference engine feature):

- ``delete_documents`` records doc_ids in ``<index>/deletes/`` — a
  small sorted parquet side file, like Lucene's live-docs bitset.
  Nothing in the segments changes.
- Search filters tombstoned docs out of every ranking BEFORE the
  top-k cut (still returns k live results), while corpus statistics
  (ndocs, avgdl, df, cf) intentionally keep counting deleted docs —
  exactly Lucene's behavior until segments merge, so surviving docs'
  scores are bit-identical before and after a delete.
- ``compact_index(..., purge_deletes=True)`` physically drops the
  postings/doc rows and recomputes every statistic; the compacted
  index then scores as if the docs had never been indexed.

The tombstone file is tiny relative to the corpus and is read once
per searcher (or once per search actor), so deletes add no per-query
or per-batch cost beyond one vectorized ``np.isin`` per touched
segment, cached for the searcher's lifetime.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_DEL_DIR = "deletes"
_DEL_FILE = "deleted.parquet"


def _del_path(index_dir) -> pathlib.Path:
    return pathlib.Path(index_dir) / _DEL_DIR / _DEL_FILE


def delete_documents(index_dir, doc_ids) -> int:
    """Tombstone ``doc_ids`` (idempotent union with existing deletes).

    Returns the total number of tombstoned ids after the union. The
    write is atomic (tmp + rename), so a crashed delete never leaves
    a truncated tombstone file."""
    import pyarrow.compute as pc

    new = pa.array(sorted({str(d) for d in doc_ids}), pa.string())
    path = _del_path(index_dir)
    existing = read_deleted_ids(index_dir)
    if existing is not None:
        cat = pc.unique(pa.concat_arrays([existing, new]))
        merged = cat.take(pc.sort_indices(cat))
    else:
        merged = new
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    pq.write_table(pa.table({"doc_id": merged}), tmp)
    tmp.rename(path)
    return len(merged)


def read_deleted_ids(index_dir) -> pa.Array | None:
    """Sorted tombstoned doc_id array, or None when there are none."""
    path = _del_path(index_dir)
    if not path.exists():
        return None
    col = pq.read_table(path, columns=["doc_id"]).column("doc_id")
    return col.combine_chunks()


def deleted_id_set(index_dir) -> np.ndarray | None:
    """Tombstones as a sorted numpy object array (the form
    ``np.isin`` wants), or None."""
    arr = read_deleted_ids(index_dir)
    if arr is None or len(arr) == 0:
        return None
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object)


def clear_deletes(index_dir) -> None:
    path = _del_path(index_dir)
    if path.exists():
        path.unlink()
