"""Index segment layout, reading and writing.

A segment is the unit of parallel index construction, resume lineage
and query-time parallelism (the role Lucene segment directories play
for the reference, /root/reference/patapsco/index.py:79-103):

    <index_dir>/
      manifest.json              # corpus stats + ordered segment list
      global_terms/              # merged (term, df, cf) parquet shards
      seg=<seg_id>/
        terms.parquet            # term-sorted postings + block metadata
        docs.parquet             # ordinal-ordered doc table
        meta.json                # lineage + metrics + "complete" marker

terms.parquet columns:
    term:string (sorted), df:int64, cf:int64, postings:binary,
    block_offsets:list<int32>, block_counts:list<int32>,
    block_last:list<int64>, block_max_tf:list<int32>,
    block_min_norm:list<int32>

docs.parquet columns (row index == segment-local ordinal):
    doc_id:string, dl:int64, norm:uint8

meta.json: {seg_id, input_files, row_groups, input_rows, ndocs,
    rejected, total_tf, nterms, npostings, status}

The doc-id/ordinal contract: ordinals are the read order of the fixed
(file, row-group) list in the descriptor, so they are a pure function
of the input listing — stable across reruns, resumes and cluster sizes
(SURVEY.md §7.4 hard part 2).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TERMS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("postings", pa.large_binary()),
        ("block_offsets", pa.list_(pa.int32())),
        ("block_counts", pa.list_(pa.int32())),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_norm", pa.list_(pa.int32())),
    ]
)

DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("dl", pa.int64()), ("norm", pa.uint8())]
)


def seg_dir(index_dir: str | pathlib.Path, seg_id: str) -> pathlib.Path:
    return pathlib.Path(index_dir) / f"seg={seg_id}"


def write_segment(
    index_dir, seg_id: str, terms_table: pa.Table, docs_table: pa.Table, meta: dict
) -> dict:
    d = seg_dir(index_dir, seg_id)
    tmp = d.with_name(d.name + ".tmp")
    if tmp.exists():
        for p in tmp.iterdir():
            p.unlink()
        tmp.rmdir()
    tmp.mkdir(parents=True)
    pq.write_table(terms_table, tmp / "terms.parquet", row_group_size=4096)
    pq.write_table(docs_table, tmp / "docs.parquet", row_group_size=1 << 20)
    meta = dict(meta, seg_id=seg_id, status="complete")
    (tmp / "meta.json").write_text(json.dumps(meta, indent=1))
    if d.exists():  # stale partial output from a dead run
        for p in d.iterdir():
            p.unlink()
        d.rmdir()
    tmp.rename(d)  # atomic completion marker (reference job.py:903-927 analogue)
    return meta


def read_meta(index_dir, seg_id: str) -> dict | None:
    p = seg_dir(index_dir, seg_id) / "meta.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def segment_is_complete(index_dir, seg_id: str, input_files, row_groups) -> bool:
    """Resume check: a segment is reusable iff its recorded lineage
    matches the planned inputs exactly."""
    meta = read_meta(index_dir, seg_id)
    return (
        meta is not None
        and meta.get("status") == "complete"
        and meta.get("input_files") == list(input_files)
        and meta.get("row_groups") == [list(r) for r in row_groups]
    )


def _min_term_of(path: pathlib.Path) -> str:
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().names.index("term")
    return md.row_group(0).column(idx).statistics.min


def terms_files(index_dir, seg_id: str) -> list[pathlib.Path]:
    """The segment's term table file(s) in global term order.

    Two layouts: a single ``terms.parquet`` (aligned build) or a
    ``terms/`` directory of disjoint term-range shards written in
    parallel by the shuffle build; shards are sorted within and ordered
    here by their min-term footer stat, so concatenation is globally
    term-sorted."""
    d = seg_dir(index_dir, seg_id)
    single = d / "terms.parquet"
    if single.exists():
        return [single]
    tdir = d / "terms"
    if tdir.is_dir():
        files = [p for p in tdir.iterdir() if p.suffix == ".parquet"]
        return sorted(files, key=_min_term_of)
    raise FileNotFoundError(f"no terms table for segment {seg_id} in {d}")


def docs_files(index_dir, seg_id: str) -> list[pathlib.Path]:
    """The segment's doc table file(s) in ordinal order (single
    ``docs.parquet``, or a ``docs/`` directory whose part file names
    sort in write/ordinal order)."""
    d = seg_dir(index_dir, seg_id)
    single = d / "docs.parquet"
    if single.exists():
        return [single]
    ddir = d / "docs"
    if ddir.is_dir():
        return sorted(p for p in ddir.iterdir() if p.suffix == ".parquet")
    raise FileNotFoundError(f"no docs table for segment {seg_id} in {d}")


def read_terms(
    index_dir, seg_id: str, terms: list[str] | None = None, columns=None
) -> pa.Table:
    """Read the term table, optionally filtered to a term subset via
    parquet predicate pushdown (term-sorted row groups are pruned by
    their min/max stats)."""
    filters = None
    if terms is not None:
        filters = [("term", "in", sorted(set(terms)))]
    tables = [
        pq.read_table(path, columns=columns, filters=filters)
        for path in terms_files(index_dir, seg_id)
    ]
    return tables[0] if len(tables) == 1 else pa.concat_tables(tables)


def read_docs(index_dir, seg_id: str, columns=None) -> pa.Table:
    tables = [pq.read_table(p, columns=columns)
              for p in docs_files(index_dir, seg_id)]
    return tables[0] if len(tables) == 1 else pa.concat_tables(tables)


def write_manifest(index_dir, manifest: dict) -> None:
    p = pathlib.Path(index_dir) / "manifest.json"
    tmp = p.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.rename(p)


def read_manifest(index_dir) -> dict:
    return json.loads((pathlib.Path(index_dir) / "manifest.json").read_text())


def build_terms_table(postings_by_term: dict, norms: np.ndarray) -> tuple[pa.Table, int]:
    """Encode an in-memory {term: ([ordinals], [tfs])} map into the
    term-sorted Arrow table; returns (table, total_postings)."""
    terms_sorted = sorted(postings_by_term)
    T = len(terms_sorted)
    if T == 0:
        return TERMS_SCHEMA.empty_table(), 0
    counts = np.fromiter(
        (len(postings_by_term[t][0]) for t in terms_sorted),
        dtype=np.int64, count=T)
    term_offsets = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(counts, out=term_offsets[1:])
    n = int(term_offsets[-1])
    ords_cat = np.empty(n, dtype=np.int64)
    tfs_cat = np.empty(n, dtype=np.int64)
    for t, start in zip(terms_sorted, term_offsets[:-1]):
        ords, tfs = postings_by_term[t]
        ords_cat[start:start + len(ords)] = ords
        tfs_cat[start:start + len(tfs)] = tfs
    return build_terms_table_from_flat(
        terms_sorted, term_offsets, ords_cat, tfs_cat, norms)


def build_terms_table_from_flat(
    terms_sorted: list[str],
    term_offsets: np.ndarray,
    ords_cat: np.ndarray,
    tfs_cat: np.ndarray,
    norms: np.ndarray,
    positions: np.ndarray | None = None,
) -> tuple[pa.Table, int]:
    """Encode already-flat term-major posting arrays (the vectorized
    build path, index/fastpath.py) into the term-sorted Arrow table;
    returns (table, total_postings).

    Encoding runs as ONE vectorized pass over the concatenated posting
    arrays (codec.encode_postings_bulk) — per-term encode calls were
    ~70% of segment-build wall time — and the Arrow binary/list
    columns are assembled zero-copy from the flat outputs + offsets.

    ``positions`` (optional): the tf-aligned flat within-document token
    position stream (posting j owns tfs_cat[j] ascending values); when
    given, a per-term delta+varint ``positions`` binary column is
    appended (codec.encode_positions_bulk).
    """
    from .codec import encode_positions_bulk, encode_postings_bulk

    T = len(terms_sorted)
    if T == 0:
        tbl = TERMS_SCHEMA.empty_table()
        if positions is not None:
            tbl = tbl.append_column(
                "positions", pa.array([], pa.large_binary()))
        return tbl, 0
    term_offsets = np.asarray(term_offsets, dtype=np.int64)
    # keep the (large) posting arrays in their native 32-bit dtype —
    # upcasting to int64 here doubled the build's fresh allocations
    ords_cat = np.asarray(ords_cat)
    tfs_cat = np.asarray(tfs_cat)
    counts = np.diff(term_offsets)
    n = int(term_offsets[-1])
    norms_cat = norms[ords_cat] if norms.size else np.zeros(n, dtype=np.uint8)

    enc = encode_postings_bulk(ords_cat, tfs_cat, norms_cat, term_offsets)

    postings_col = pa.Array.from_buffers(
        pa.large_binary(), T,
        [None, pa.py_buffer(enc["term_byte_offsets"].tobytes()),
         pa.py_buffer(enc["data"])],
    )
    list_offsets = np.zeros(T + 1, dtype=np.int32)
    list_offsets[1:] = np.cumsum(enc["blocks_per_term"]).astype(np.int32)
    loff = pa.array(list_offsets, pa.int32())

    def list_col(flat, typ):
        return pa.ListArray.from_arrays(loff, pa.array(flat, typ))

    cf = np.add.reduceat(tfs_cat, term_offsets[:-1]) if n else counts
    table = pa.table(
        {
            "term": pa.array(terms_sorted, pa.string()),
            "df": pa.array(counts, pa.int64()),
            "cf": pa.array(cf.astype(np.int64), pa.int64()),
            "postings": postings_col,
            "block_offsets": list_col(enc["block_offsets"], pa.int32()),
            "block_counts": list_col(enc["block_counts"], pa.int32()),
            "block_last": list_col(enc["block_last"], pa.int64()),
            "block_max_tf": list_col(enc["block_max_tf"], pa.int32()),
            "block_min_norm": list_col(enc["block_min_norm"], pa.int32()),
        },
        schema=TERMS_SCHEMA,
    )
    if positions is not None:
        penc = encode_positions_bulk(positions, tfs_cat, term_offsets)
        pos_col = pa.Array.from_buffers(
            pa.large_binary(), T,
            [None, pa.py_buffer(penc["term_byte_offsets"].tobytes()),
             pa.py_buffer(penc["data"])],
        )
        table = table.append_column("positions", pos_col)
    return table, n
