"""Segment compaction — physical merge of many small segments.

The reference's parallel reduce merges part indexes with Lucene's
``IndexWriter.addIndexes`` (/root/reference/patapsco/index.py:93-103).
Here the analogue: group consecutive segments (preserving global
ordinal order) and rewrite each group as one segment. Build-optimal
segment sizes (small, for scheduling balance) and query-optimal sizes
(large, to amortize per-segment fixed costs) differ by ~100x; a
compaction pass after the build converts one into the other.

Runs as a Dataset pipeline over merge groups (actor pool): each task
merges its input segments' term tables, rebasing segment-local
ordinals by the doc offsets WITHOUT decoding postings — every codec
block starts with an absolute-ordinal varint and delta gaps are
base-invariant, so rebasing rewrites only that leading varint per
block (O(blocks), measured 7x faster than decode+re-encode at 5M
docs). Doc tables concatenate unchanged. Global ordinal order — and
therefore every ranking and tie-break — is preserved exactly; tests
assert rank/score identity pre/post.
"""

from __future__ import annotations

import json
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..util import fixed_pool


from .segment import (
    read_docs,
    read_terms,
    DOCS_SCHEMA,
    TERMS_SCHEMA,
    read_manifest,
    seg_dir,
    write_manifest,
)


def _encode_varint_int(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _rebase_chunk(blob: bytes, offs: list[int], base: int
                  ) -> tuple[bytes, list[int]]:
    """Shift a term chunk's ordinals by ``base`` WITHOUT decoding the
    postings: only each block's leading absolute-ordinal varint is
    rewritten (gaps are base-invariant). O(blocks), not O(postings)."""
    if base == 0:
        return blob, list(offs)
    parts = []
    new_offs = []
    pos = 0
    nblocks = len(offs)
    for bi in range(nblocks):
        off = offs[bi]
        end = offs[bi + 1] if bi + 1 < nblocks else len(blob)
        j = off
        v = 0
        shift = 0
        while True:
            byte = blob[j]
            v |= (byte & 0x7F) << shift
            j += 1
            if not byte & 0x80:
                break
            shift += 7
        part = _encode_varint_int(v + base) + blob[j:end]
        new_offs.append(pos)
        pos += len(part)
        parts.append(part)
    return b"".join(parts), new_offs


def _merge_group(index_dir: str, out_dir: str, group: list[dict],
                 new_seg_id: str) -> dict:
    """Merge one group of consecutive segments into one output segment."""
    index_dir = pathlib.Path(index_dir)
    out = pathlib.Path(out_dir)
    # doc tables concatenate in segment order; ordinal base per input
    doc_tables = []
    bases = []
    base = 0
    for seg in group:
        t = read_docs(index_dir, seg["seg_id"])
        doc_tables.append(t)
        bases.append(base)
        base += t.num_rows
    docs_table = pa.concat_tables(doc_tables).combine_chunks()

    # collect each term's chunks in segment order; chunks are rebased
    # by first-varint byte surgery, never decoded (codec blocks carry
    # an absolute first ordinal; gaps are base-invariant)
    merged: dict[str, list[tuple]] = {}
    has_positions = False
    for gi, seg in enumerate(group):
        t = read_terms(index_dir, seg["seg_id"])
        b = bases[gi]
        has_positions = "positions" in t.column_names
        names = ["term", "df", "cf", "postings", "block_offsets",
                 "block_counts", "block_last", "block_max_tf",
                 "block_min_norm"]
        if has_positions:
            names.append("positions")
        cols = {name: t.column(name).to_pylist() for name in names}
        pos_col = cols.get("positions")
        for i in range(t.num_rows):
            blob, offs = _rebase_chunk(cols["postings"][i],
                                       cols["block_offsets"][i], b)
            merged.setdefault(cols["term"][i], []).append((
                cols["df"][i], cols["cf"][i], blob, offs,
                cols["block_counts"][i],
                [x + b for x in cols["block_last"][i]],
                cols["block_max_tf"][i], cols["block_min_norm"][i],
                pos_col[i] if pos_col is not None else b"",
            ))

    rows = {name: [] for name in (
        "term", "df", "cf", "postings", "block_offsets", "block_counts",
        "block_last", "block_max_tf", "block_min_norm", "positions")}
    npostings = 0
    for term in sorted(merged):
        chunks = merged[term]  # already in ascending-base order
        offs_all, pos = [], 0
        blobs, counts, lasts, maxtf, minnorm, posblobs = [], [], [], [], [], []
        df = cf = 0
        for d, c, blob, offs, cnts, lst, mtf, mnn, pblob in chunks:
            df += d
            cf += c
            offs_all.extend(o + pos for o in offs)
            pos += len(blob)
            blobs.append(blob)
            counts.extend(cnts)
            lasts.extend(lst)
            maxtf.extend(mtf)
            minnorm.extend(mnn)
            posblobs.append(pblob)
        rows["term"].append(term)
        rows["df"].append(df)
        rows["cf"].append(cf)
        rows["postings"].append(b"".join(blobs))
        rows["block_offsets"].append(offs_all)
        rows["block_counts"].append(counts)
        rows["block_last"].append(lasts)
        rows["block_max_tf"].append(maxtf)
        rows["block_min_norm"].append(minnorm)
        # position streams merge by pure concatenation: every posting's
        # positions open with an absolute value (no cross-posting
        # state), so segment order == merged posting order suffices
        rows["positions"].append(b"".join(posblobs))
        npostings += df
    return _write_merged(out, new_seg_id, rows, has_positions,
                         docs_table, group, npostings)


def _write_merged(out: pathlib.Path, new_seg_id: str, rows: dict,
                  has_positions: bool, docs_table: pa.Table,
                  group: list[dict], npostings: int) -> dict:
    """Write one merged segment (terms + docs + lineage meta)
    atomically; shared by the rebase fast path and the purge path."""
    cols_out = {
        "term": pa.array(rows["term"], pa.string()),
        "df": pa.array(rows["df"], pa.int64()),
        "cf": pa.array(rows["cf"], pa.int64()),
        "postings": pa.array(rows["postings"], pa.large_binary()),
        "block_offsets": pa.array(rows["block_offsets"],
                                  pa.list_(pa.int32())),
        "block_counts": pa.array(rows["block_counts"],
                                 pa.list_(pa.int32())),
        "block_last": pa.array(rows["block_last"], pa.list_(pa.int64())),
        "block_max_tf": pa.array(rows["block_max_tf"],
                                 pa.list_(pa.int32())),
        "block_min_norm": pa.array(rows["block_min_norm"],
                                   pa.list_(pa.int32())),
    }
    schema = TERMS_SCHEMA
    if has_positions:
        cols_out["positions"] = pa.array(rows["positions"],
                                         pa.large_binary())
        schema = TERMS_SCHEMA.append(pa.field("positions",
                                              pa.large_binary()))
    terms_table = pa.table(cols_out, schema=schema)

    d = out / f"seg={new_seg_id}"
    tmp = d.with_name(d.name + ".tmp")
    if tmp.exists():
        for p in tmp.iterdir():
            p.unlink()
        tmp.rmdir()
    tmp.mkdir(parents=True)
    pq.write_table(terms_table.cast(schema), tmp / "terms.parquet",
                   row_group_size=4096)
    pq.write_table(docs_table.cast(DOCS_SCHEMA), tmp / "docs.parquet",
                   row_group_size=1 << 20)
    dl = docs_table.column("dl").to_numpy()
    meta = {
        "seg_id": new_seg_id,
        "input_files": [s["seg_id"] for s in group],  # lineage: merged segs
        "row_groups": [],
        "input_rows": docs_table.num_rows,
        "ndocs": docs_table.num_rows,
        "rejected": 0,
        "total_tf": int(dl.sum()),
        "nterms": terms_table.num_rows,
        "npostings": npostings,
        "status": "complete",
        "compacted_from": [s["seg_id"] for s in group],
    }
    (tmp / "meta.json").write_text(json.dumps(meta, indent=1))
    if d.exists():
        for p in d.iterdir():
            p.unlink()
        d.rmdir()
    tmp.rename(d)
    return meta


def _merge_group_purged(index_dir: str, out_dir: str, group: list[dict],
                        new_seg_id: str, deleted) -> dict:
    """Merge one group while physically dropping tombstoned docs.

    Unlike the decode-free rebase path, purging must decode every
    posting (ordinals of surviving docs shift), filter, remap and
    re-encode — the price Lucene also pays when merging away deletes.
    df/cf/norm block metadata are recomputed from the surviving
    postings; position streams are filtered posting-wise.
    """
    import numpy as np

    from .codec import decode_postings, decode_positions, encode_postings
    from .codec import encode_positions_bulk

    index_dir = pathlib.Path(index_dir)
    out = pathlib.Path(out_dir)
    doc_tables = []
    bases = []
    base = 0
    for seg in group:
        t = read_docs(index_dir, seg["seg_id"])
        doc_tables.append(t)
        bases.append(base)
        base += t.num_rows
    docs_all = pa.concat_tables(doc_tables).combine_chunks()
    ids = np.asarray(docs_all.column("doc_id").to_numpy(
        zero_copy_only=False), dtype=object)
    keep = ~np.isin(ids, deleted)
    newmap = np.cumsum(keep) - 1          # old global ord -> new ord
    docs_table = docs_all.filter(pa.array(keep))
    norms_new = docs_table.column("norm").to_numpy().astype(np.uint8)

    # gather each term's SURVIVING postings (decoded) in segment order
    gathered: dict[str, list[tuple]] = {}
    has_positions = False
    for gi, seg in enumerate(group):
        t = read_terms(index_dir, seg["seg_id"])
        b = bases[gi]
        has_positions = "positions" in t.column_names
        for r in t.to_pylist():
            ords, tfs = decode_postings(
                r["postings"], r["block_offsets"], r["block_counts"])
            gords = ords + b
            pmask = keep[gords]
            pos_k = None
            if has_positions:
                pos_flat = decode_positions(
                    r["positions"], int(tfs.sum()),
                    tfs.astype(np.int64))
                pos_k = pos_flat[np.repeat(pmask, tfs)]
            if not pmask.any():
                # keep the term key so a fully-deleted term still
                # vanishes consistently (df=0 rows are dropped below)
                continue
            gathered.setdefault(r["term"], []).append((
                newmap[gords[pmask]], tfs[pmask], pos_k))

    rows = {name: [] for name in (
        "term", "df", "cf", "postings", "block_offsets", "block_counts",
        "block_last", "block_max_tf", "block_min_norm", "positions")}
    npostings = 0
    for term in sorted(gathered):
        chunks = gathered[term]
        ords_cat = np.concatenate([c[0] for c in chunks])
        tfs_cat = np.concatenate([c[1] for c in chunks])
        enc = encode_postings(ords_cat, tfs_cat, norms_new[ords_cat])
        rows["term"].append(term)
        rows["df"].append(len(ords_cat))
        rows["cf"].append(int(tfs_cat.sum()))
        rows["postings"].append(enc["postings"])
        rows["block_offsets"].append(enc["block_offsets"])
        rows["block_counts"].append(enc["block_counts"])
        rows["block_last"].append(enc["block_last"])
        rows["block_max_tf"].append(enc["block_max_tf"])
        rows["block_min_norm"].append(enc["block_min_norm"])
        if has_positions:
            pos_cat = np.concatenate([c[2] for c in chunks])
            pe = encode_positions_bulk(
                pos_cat, tfs_cat.astype(np.int64),
                np.array([0, len(tfs_cat)], dtype=np.int64))
            rows["positions"].append(pe["data"])
        else:
            rows["positions"].append(b"")
        npostings += len(ords_cat)
    return _write_merged(out, new_seg_id, rows, has_positions,
                         docs_table, group, npostings)


class _Compactor:
    def __init__(self, index_dir: str, out_dir: str,
                 deleted_ref=None):
        self.index_dir = index_dir
        self.out_dir = out_dir
        # tombstones broadcast ONCE via ray.put (constructor runs per
        # actor, not per merge group)
        self.deleted = (ray.get(deleted_ref)
                        if deleted_ref is not None else None)

    def __call__(self, batch) -> pa.Table:
        if isinstance(batch, pa.Table):
            batch = batch.to_pydict()
        rows = []
        for i in range(len(batch["new_seg_id"])):
            group = json.loads(batch["group_json"][i])
            if self.deleted is not None:
                meta = _merge_group_purged(
                    self.index_dir, self.out_dir, group,
                    str(batch["new_seg_id"][i]), self.deleted)
            else:
                meta = _merge_group(self.index_dir, self.out_dir, group,
                                    str(batch["new_seg_id"][i]))
            rows.append(meta)
        return pa.table({
            "seg_id": pa.array([m["seg_id"] for m in rows], pa.string()),
            "ndocs": pa.array([m["ndocs"] for m in rows], pa.int64()),
            "total_tf": pa.array([m["total_tf"] for m in rows], pa.int64()),
            "nterms": pa.array([m["nterms"] for m in rows], pa.int64()),
            "npostings": pa.array([m["npostings"] for m in rows], pa.int64()),
        })


def compact_index(
    index_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    *,
    target_docs_per_segment: int = 1_000_000,
    concurrency: int | None = None,
    purge_deletes: bool = True,
) -> dict:
    """Compact an index into fewer, larger segments (new directory).

    Groups CONSECUTIVE segments (global ordinal order preserved — the
    docid-ascending tie-break survives) until each group reaches the
    target doc count, then merges groups in parallel.

    When the source index has tombstones (index.deletes) and
    ``purge_deletes`` is True (default), the merge drops the deleted
    docs physically and RECOMPUTES every statistic (df/cf per term,
    ndocs, avgdl, global_terms) — after which the compacted index
    scores exactly as if the docs had never been indexed. With
    ``purge_deletes=False`` the tombstone file is carried over
    unchanged (pure layout compaction).
    """
    index_dir = pathlib.Path(index_dir)
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = read_manifest(index_dir)
    from .deletes import deleted_id_set

    deleted = deleted_id_set(index_dir) if purge_deletes else None
    deleted_ref = ray.put(deleted) if deleted is not None else None
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_docs = 0
    for seg in manifest["segments"]:
        cur.append(seg)
        cur_docs += seg["ndocs"]
        if cur_docs >= target_docs_per_segment:
            groups.append(cur)
            cur, cur_docs = [], 0
    if cur:
        groups.append(cur)

    if concurrency is None:
        avail = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(len(groups), avail))
    items = [
        {"new_seg_id": f"{gi:06d}", "group_json": json.dumps(g)}
        for gi, g in enumerate(groups)
    ]
    stats = ray.data.from_items(items).map_batches(
        _Compactor,
        fn_constructor_kwargs={"index_dir": str(index_dir),
                               "out_dir": str(out_dir),
                               "deleted_ref": deleted_ref},
        batch_size=1,
        concurrency=fixed_pool(concurrency),
        num_cpus=1,
        batch_format="pyarrow",
    ).take_all()

    new_manifest = dict(manifest)
    new_manifest["segments"] = sorted(
        (
            {"seg_id": r["seg_id"], "ndocs": int(r["ndocs"]),
             "total_tf": int(r["total_tf"]), "nterms": int(r["nterms"]),
             "npostings": int(r["npostings"]), "rejected": 0}
            for r in stats
        ),
        key=lambda s: s["seg_id"],
    )
    base = 0
    for s in new_manifest["segments"]:
        s["base"] = base
        base += s["ndocs"]
    new_manifest["compacted_from"] = str(index_dir)

    if deleted is not None:
        # purging changed df/cf/ndocs: recompute corpus stats and
        # rebuild global_terms from the new segments
        ndocs = sum(s["ndocs"] for s in new_manifest["segments"])
        total_tf = sum(s["total_tf"] for s in new_manifest["segments"])
        new_manifest["ndocs"] = ndocs
        new_manifest["total_tf"] = total_tf
        new_manifest["avgdl"] = (total_tf / ndocs) if ndocs else 0.0
        from .build import finalize_index

        finalize_index(out_dir, new_manifest)
    else:
        # global term stats are unchanged; copy the shards (and any
        # tombstones — layout compaction must not resurrect deletes)
        src_gt = index_dir / "global_terms"
        dst_gt = out_dir / "global_terms"
        if src_gt.exists():
            dst_gt.mkdir(exist_ok=True)
            for f in src_gt.glob("*.parquet"):
                (dst_gt / f.name).write_bytes(f.read_bytes())
        src_del = index_dir / "deletes"
        if src_del.exists():
            dst_del = out_dir / "deletes"
            dst_del.mkdir(exist_ok=True)
            for f in src_del.glob("*.parquet"):
                (dst_del / f.name).write_bytes(f.read_bytes())
    write_manifest(out_dir, new_manifest)
    return new_manifest
