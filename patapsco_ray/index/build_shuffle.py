"""Explicit groupby-term index build (the shuffle path).

The aligned build (build.py) keeps postings partitioned by document and
never moves them. This module is the other strategy the north rule
names: explode processed docs into per-(term, input-block) posting
fragments, then merge fragments into one global posting list per term
with a Ray Data ``groupby`` — an all-to-all shuffle — with **explicit
skew handling**: the groupby key is ``(term, salt)`` where
``salt = global_ordinal // salt_range_rows``. Each salted group covers
a disjoint, ascending ordinal range, so

  * a Zipf head term (a stopword-like term touching nearly every doc —
    the skew case called out in SURVEY.md §7.4) is split across
    ``ndocs / salt_range_rows`` bounded groups instead of one giant
    one, and
  * the per-salt encoded chunks concatenate in salt order into the
    final blocked posting list WITHOUT re-decoding, because every codec
    block is independently decodable (its first ordinal is absolute,
    codec.py).

Fragments are pre-aggregated inside the map stage — one row per
(term, input block), carrying packed ordinal/tf arrays — so the shuffle
moves O(distinct terms x blocks) rows, not O(postings) rows.

The output is a single segment in the standard layout (segment.py), so
``IndexSearcher`` works on either strategy's index unchanged; tests
assert rank/score identity between the two builds.
"""

from __future__ import annotations

import pathlib
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..sources.extract import extract_text
from ..text import TextConfig, TextProcessor
from .build import plan_segments
from .norms import encode_lengths
from .segment import TERMS_SCHEMA, DOCS_SCHEMA, write_manifest
from .codec import encode_postings

FRAGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("base", pa.int64()),
        ("ords", pa.large_binary()),   # int64 LE global ordinals, sorted
        ("tfs", pa.large_binary()),    # int32 LE term frequencies
        ("norms", pa.large_binary()),  # uint8 norm byte per posting
    ]
)


class FragmentEmitter:
    """Actor-pool stage: block descriptor -> posting fragments.

    Also writes the block's doc rows (ordinal, doc_id, dl, norm) to
    ``<index>/docs_parts/part-<block>.parquet`` as a side output so the
    text chain runs exactly once per document.
    """

    def __init__(self, index_dir: str, text_config: TextConfig, lang: str,
                 id_column: str, text_column: str, html_column: str | None,
                 salt_range_rows: int, vectorize: bool | None = None):
        from .fastpath import FastDocProcessor, supports_fast_path

        pa.set_cpu_count(1)  # one actor == one scheduled cpu
        pa.set_io_thread_count(2)
        self.index_dir = pathlib.Path(index_dir)
        self.processor = TextProcessor(text_config, lang)
        self.id_column = id_column
        self.text_column = text_column
        self.html_column = html_column
        self.salt_range = salt_range_rows
        use_fast = (supports_fast_path(text_config)
                    if vectorize is None else vectorize)
        self.fast = (FastDocProcessor(text_config, lang)
                     if use_fast else None)
        (self.index_dir / "docs_parts").mkdir(parents=True, exist_ok=True)

    def _emit_block_fast(self, desc: dict, base: int) -> pa.Table:
        """Vectorized variant of ``_emit_block`` (index/fastpath.py);
        rejected docs keep their ordinal with dl=0, as in the per-row
        path."""
        from .fastpath import TermVocab, flat_postings_sorted

        columns = [self.id_column, self.text_column]
        if self.html_column:
            columns.append(self.html_column)
        vocab = TermVocab()
        tid_p, ord_p, tf_p = [], [], []
        id_parts, dl_parts = [], []
        local_base = 0
        for path, rgs in zip(desc["files"], desc["row_groups"]):
            pf = pq.ParquetFile(path)
            avail = [c for c in columns if c in pf.schema_arrow.names]
            for batch in pf.iter_batches(batch_size=32768, row_groups=rgs,
                                         columns=avail):
                r = self.fast.process_batch(
                    batch, self.id_column, self.text_column,
                    self.html_column)
                n = len(r["ids"])
                keep = r["keep"]
                id_parts.append(r["ids"])
                dl_full = np.zeros(n, dtype=np.int64)
                dl_full[keep] = r["dl"]
                dl_parts.append(dl_full)
                row_pos = np.flatnonzero(keep)
                gid = vocab.map_codes(r["dict_strings"])
                if len(r["pair_code"]):
                    tid_p.append(gid[r["pair_code"]])
                    ord_p.append(local_base + row_pos[r["pair_doc"]])
                    tf_p.append(r["pair_tf"])
                local_base += n

        dl = (np.concatenate(dl_parts) if dl_parts
              else np.empty(0, dtype=np.int64))
        norms = encode_lengths(dl)
        doc_ids = (pa.concat_arrays([a.combine_chunks()
                                     if isinstance(a, pa.ChunkedArray) else a
                                     for a in id_parts])
                   if id_parts else pa.array([], pa.string()))
        part = pa.table(
            {"doc_id": doc_ids, "dl": pa.array(dl), "norm": pa.array(norms)},
            schema=DOCS_SCHEMA,
        )
        out = self.index_dir / "docs_parts" / f"part-{desc['seg_id']}.parquet"
        tmp = out.with_suffix(".parquet.tmp")
        pq.write_table(part, tmp)
        tmp.rename(out)

        terms_sorted, term_offsets, ords_cat, tfs_cat, _ = \
            flat_postings_sorted(vocab, tid_p, ord_p, tf_p)
        n = len(ords_cat)
        if n == 0:
            return FRAGMENT_SCHEMA.empty_table()
        norms_cat = norms[ords_cat]
        g = ords_cat + base
        salts = g // self.salt_range
        tid_flat = np.repeat(np.arange(len(terms_sorted)),
                             np.diff(term_offsets))
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[term_offsets[1:-1]] = True
        change[1:] |= salts[1:] != salts[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        f_term = [terms_sorted[t] for t in tid_flat[starts]]
        return pa.table(
            {"term": pa.array(f_term, pa.string()),
             "salt": pa.array(salts[starts], pa.int64()),
             "base": pa.array(g[starts], pa.int64()),
             "ords": pa.array([g[s:e].astype("<i8").tobytes()
                               for s, e in zip(starts, ends)],
                              pa.large_binary()),
             "tfs": pa.array([tfs_cat[s:e].astype("<i4").tobytes()
                              for s, e in zip(starts, ends)],
                             pa.large_binary()),
             "norms": pa.array([norms_cat[s:e].astype(np.uint8).tobytes()
                                for s, e in zip(starts, ends)],
                               pa.large_binary())},
            schema=FRAGMENT_SCHEMA,
        )

    def _emit_block(self, desc: dict, base: int) -> pa.Table:
        import collections

        columns = [self.id_column, self.text_column]
        if self.html_column:
            columns.append(self.html_column)
        postings: dict[str, tuple[list, list]] = {}
        doc_ids, doc_lens = [], []
        ordinal = 0
        for path, rgs in zip(desc["files"], desc["row_groups"]):
            pf = pq.ParquetFile(path)
            avail = [c for c in columns if c in pf.schema_arrow.names]
            for batch in pf.iter_batches(batch_size=8192, row_groups=rgs,
                                         columns=avail):
                ids = batch.column(self.id_column).to_pylist()
                texts = (batch.column(self.text_column).to_pylist()
                         if self.text_column in batch.schema.names
                         else [None] * len(ids))
                htmls = (batch.column(self.html_column).to_pylist()
                         if self.html_column
                         and self.html_column in batch.schema.names
                         else [None] * len(ids))
                for doc_id, text, html in zip(ids, texts, htmls):
                    processed = self.processor.process(
                        extract_text(text, html))
                    if processed is None:
                        processed = ""  # keep ordinals aligned to input rows
                    terms = processed.split()
                    doc_ids.append(str(doc_id))
                    doc_lens.append(len(terms))
                    if terms:
                        for term, tf in collections.Counter(terms).items():
                            slot = postings.setdefault(term, ([], []))
                            slot[0].append(ordinal)
                            slot[1].append(tf)
                    ordinal += 1

        dl = np.asarray(doc_lens, dtype=np.int64)
        norms = encode_lengths(dl)
        part = pa.table(
            {"doc_id": pa.array(doc_ids, pa.string()),
             "dl": pa.array(dl), "norm": pa.array(norms)},
            schema=DOCS_SCHEMA,
        )
        out = self.index_dir / "docs_parts" / f"part-{desc['seg_id']}.parquet"
        tmp = out.with_suffix(".parquet.tmp")
        pq.write_table(part, tmp)
        tmp.rename(out)

        f_term, f_salt, f_base, f_ords, f_tfs, f_norms = [], [], [], [], [], []
        for term, (ords, tfs) in postings.items():
            g = np.asarray(ords, dtype=np.int64) + base
            t = np.asarray(tfs, dtype=np.int32)
            nb = norms[np.asarray(ords, dtype=np.int64)]
            salts = g // self.salt_range
            # split at salt boundaries (g is ascending)
            cuts = np.flatnonzero(np.diff(salts)) + 1
            for gs, ts, ns in zip(np.split(g, cuts), np.split(t, cuts),
                                  np.split(nb, cuts)):
                f_term.append(term)
                f_salt.append(int(gs[0] // self.salt_range))
                f_base.append(int(gs[0]))
                f_ords.append(gs.astype("<i8").tobytes())
                f_tfs.append(ts.astype("<i4").tobytes())
                f_norms.append(ns.astype(np.uint8).tobytes())
        return pa.table(
            {"term": pa.array(f_term, pa.string()),
             "salt": pa.array(f_salt, pa.int64()),
             "base": pa.array(f_base, pa.int64()),
             "ords": pa.array(f_ords, pa.large_binary()),
             "tfs": pa.array(f_tfs, pa.large_binary()),
             "norms": pa.array(f_norms, pa.large_binary())},
            schema=FRAGMENT_SCHEMA,
        )

    def __call__(self, batch) -> pa.Table:
        if isinstance(batch, pa.Table):
            batch = batch.to_pydict()
        tables = []
        emit = (self._emit_block_fast if self.fast is not None
                else self._emit_block)
        for i in range(len(batch["seg_id"])):
            desc = {
                "seg_id": str(batch["seg_id"][i]),
                "files": [str(f) for f in batch["files"][i]],
                "row_groups": [[int(x) for x in r]
                               for r in batch["row_groups"][i]],
            }
            tables.append(emit(desc, int(batch["base"][i])))
        return pa.concat_tables(tables)


def _run_boundaries(*keys: np.ndarray) -> np.ndarray:
    """Start indices of equal-key runs over parallel sorted key arrays."""
    n = len(keys[0])
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(change)


def _encode_partition(grp: pa.Table) -> pa.Table:
    """One hash partition of (term, salt) groups: merge each group's
    fragments (ascending by base, disjoint ordinal ranges) and encode
    into codec blocks. The whole partition is processed with local
    array ops — one Ray group call per PARTITION, not per term."""
    grp = grp.combine_chunks()
    order = pa.compute.sort_indices(
        grp.select(["term", "salt", "base"]),
        sort_keys=[("term", "ascending"), ("salt", "ascending"),
                   ("base", "ascending")],
    )
    grp = grp.take(order)
    terms = np.asarray(grp.column("term").to_pylist(), dtype=object)
    salts = grp.column("salt").to_numpy()
    ords_b = grp.column("ords").to_pylist()
    tfs_b = grp.column("tfs").to_pylist()
    norms_b = grp.column("norms").to_pylist()
    starts = _run_boundaries(terms, salts)
    ends = np.append(starts[1:], len(terms))
    out = {name: [] for name in (
        "term", "salt", "df", "cf", "postings", "block_offsets",
        "block_counts", "block_last", "block_max_tf", "block_min_norm")}
    for s, e in zip(starts, ends):
        ords = np.frombuffer(b"".join(ords_b[s:e]), dtype="<i8")
        tfs = np.frombuffer(b"".join(tfs_b[s:e]), dtype="<i4").astype(np.int64)
        norms = np.frombuffer(b"".join(norms_b[s:e]), dtype=np.uint8)
        enc = encode_postings(ords, tfs, norms)
        out["term"].append(terms[s])
        out["salt"].append(int(salts[s]))
        out["df"].append(len(ords))
        out["cf"].append(int(tfs.sum()))
        out["postings"].append(enc["postings"])
        out["block_offsets"].append(enc["block_offsets"])
        out["block_counts"].append(enc["block_counts"])
        out["block_last"].append(enc["block_last"])
        out["block_max_tf"].append(enc["block_max_tf"])
        out["block_min_norm"].append(enc["block_min_norm"])
    return pa.table({
        "term": pa.array(list(out["term"]), pa.string()),
        "salt": pa.array(out["salt"], pa.int64()),
        "df": pa.array(out["df"], pa.int64()),
        "cf": pa.array(out["cf"], pa.int64()),
        "postings": pa.array(out["postings"], pa.large_binary()),
        "block_offsets": pa.array(out["block_offsets"], pa.list_(pa.int32())),
        "block_counts": pa.array(out["block_counts"], pa.list_(pa.int32())),
        "block_last": pa.array(out["block_last"], pa.list_(pa.int64())),
        "block_max_tf": pa.array(out["block_max_tf"], pa.list_(pa.int32())),
        "block_min_norm": pa.array(out["block_min_norm"], pa.list_(pa.int32())),
    })


def _concat_partition(grp: pa.Table) -> pa.Table:
    """One hash partition of terms: concatenate each term's salted
    chunks in salt order, rebasing block byte offsets — no posting
    bytes are re-decoded."""
    grp = grp.combine_chunks()
    order = pa.compute.sort_indices(
        grp.select(["term", "salt"]),
        sort_keys=[("term", "ascending"), ("salt", "ascending")],
    )
    grp = grp.take(order)
    terms = np.asarray(grp.column("term").to_pylist(), dtype=object)
    dfs = grp.column("df").to_numpy()
    cfs = grp.column("cf").to_numpy()
    blobs = grp.column("postings").to_pylist()
    offs_l = grp.column("block_offsets").to_pylist()
    counts_l = grp.column("block_counts").to_pylist()
    lasts_l = grp.column("block_last").to_pylist()
    maxtf_l = grp.column("block_max_tf").to_pylist()
    minnorm_l = grp.column("block_min_norm").to_pylist()
    starts = _run_boundaries(terms)
    ends = np.append(starts[1:], len(terms))
    out = {name: [] for name in (
        "term", "df", "cf", "postings", "block_offsets", "block_counts",
        "block_last", "block_max_tf", "block_min_norm")}
    for s, e in zip(starts, ends):
        offs, pos = [], 0
        for i in range(s, e):
            offs.extend(o + pos for o in offs_l[i])
            pos += len(blobs[i])
        out["term"].append(terms[s])
        out["df"].append(int(dfs[s:e].sum()))
        out["cf"].append(int(cfs[s:e].sum()))
        out["postings"].append(b"".join(blobs[s:e]))
        out["block_offsets"].append(offs)
        out["block_counts"].append([c for i in range(s, e) for c in counts_l[i]])
        out["block_last"].append([c for i in range(s, e) for c in lasts_l[i]])
        out["block_max_tf"].append([c for i in range(s, e) for c in maxtf_l[i]])
        out["block_min_norm"].append(
            [c for i in range(s, e) for c in minnorm_l[i]])
    return pa.table({
        "term": pa.array(list(out["term"]), pa.string()),
        "df": pa.array(out["df"], pa.int64()),
        "cf": pa.array(out["cf"], pa.int64()),
        "postings": pa.array(out["postings"], pa.large_binary()),
        "block_offsets": pa.array(out["block_offsets"], pa.list_(pa.int32())),
        "block_counts": pa.array(out["block_counts"], pa.list_(pa.int32())),
        "block_last": pa.array(out["block_last"], pa.list_(pa.int64())),
        "block_max_tf": pa.array(out["block_max_tf"], pa.list_(pa.int32())),
        "block_min_norm": pa.array(out["block_min_norm"], pa.list_(pa.int32())),
    }, schema=TERMS_SCHEMA)


class _TermShardWriter:
    """Writes one sorted term-range block as a terms shard + a slim
    (term, df, cf) global-stats shard; returns per-shard stats only.
    Shard names derive from the block's first term via the stable hash
    (terms are unique across blocks after the merge, so names cannot
    collide)."""

    def __init__(self, terms_dir: str, global_dir: str):
        self.terms_dir = pathlib.Path(terms_dir)
        self.global_dir = pathlib.Path(global_dir)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"nterms": pa.array([], pa.int64()),
                             "npostings": pa.array([], pa.int64())})
        from ..functions.hashing import stable_hash_strings

        tbl = tbl.select(TERMS_SCHEMA.names).cast(TERMS_SCHEMA)
        first = tbl.column("term").slice(0, 1).combine_chunks()
        name = f"part-{int(stable_hash_strings(first)[0]):016x}.parquet"
        tmp = self.terms_dir / (name + ".tmp")
        pq.write_table(tbl, tmp, row_group_size=4096)
        tmp.rename(self.terms_dir / name)
        gtmp = self.global_dir / (name + ".tmp")
        pq.write_table(tbl.select(["term", "df", "cf"]), gtmp,
                       row_group_size=1 << 16)
        gtmp.rename(self.global_dir / name)
        return pa.table({
            "nterms": pa.array([tbl.num_rows], pa.int64()),
            "npostings": pa.array(
                [int(tbl.column("df").to_numpy().sum())], pa.int64()),
        })


def build_index_shuffle(
    paths: str | list[str],
    index_dir: str | pathlib.Path,
    *,
    text_config: TextConfig = TextConfig(),
    lang: str = "eng",
    id_column: str = "url",
    text_column: str = "text",
    html_column: str | None = "html",
    rows_per_block: int | None = None,
    salt_range_rows: int = 1 << 20,
    concurrency: int | tuple[int, int] | None = None,
    vectorize: bool | None = None,
) -> dict:
    """Build a single-segment global index via the groupby-term shuffle.

    At cluster scale prefer the aligned ``build_index`` (no shuffle);
    use this when one global posting list per term is required (e.g. to
    export the index, or when segments must not be consulted per
    query). Resume granularity is the whole build (the shuffle has no
    durable intermediate), which the manifest records as
    ``strategy: shuffle`` with full input lineage.
    """
    if isinstance(paths, (str, pathlib.Path)):
        p = pathlib.Path(paths)
        paths = sorted(str(f) for f in p.glob("*.parquet")) if p.is_dir() else [str(p)]
    if not paths:
        raise FileNotFoundError("no parquet inputs to index")
    index_dir = pathlib.Path(index_dir)
    if index_dir.exists():
        shutil.rmtree(index_dir)
    index_dir.mkdir(parents=True)

    if concurrency is None:
        avail = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, avail)
    pool = concurrency if isinstance(concurrency, int) else concurrency[1]
    # adaptive block size (DEFAULT only — an explicit rows_per_block
    # from the caller is honored verbatim, e.g. tiny test blocks that
    # must exercise multi-block merging): a 250k default at 3M rows
    # yields only 12 blocks — most of a 32-slot pool would idle.
    # Shrink blocks (never below 25k rows) until every slot sees >= 2
    # blocks; parquet footer row counts make the total a metadata-only
    # read.
    if rows_per_block is None:
        rows_per_block = 250_000
        total_rows = 0
        flat_paths = ([paths] if isinstance(paths, (str, bytes)) else
                      list(paths))
        import pathlib as _pl

        for p in flat_paths:
            pp = _pl.Path(p)
            files = sorted(pp.glob("*.parquet")) if pp.is_dir() else [pp]
            for f in files:
                total_rows += pq.ParquetFile(f).metadata.num_rows
        if total_rows:
            rows_per_block = max(
                25_000, min(rows_per_block, total_rows // (2 * pool) or 1))
    blocks = plan_segments(paths, rows_per_block)
    base = 0
    items = []
    for d in blocks:
        items.append({"seg_id": d["seg_id"], "files": d["files"],
                      "row_groups": d["row_groups"], "base": base})
        base += d["rows"]

    if isinstance(concurrency, int):
        concurrency = max(1, min(len(items), concurrency))
        # fixed pool — autoscaling churn measured 2x slower (build.py)
        concurrency = (concurrency, concurrency)

    fragments = ray.data.from_items(items).map_batches(
        FragmentEmitter,
        fn_constructor_kwargs={
            "index_dir": str(index_dir),
            "text_config": text_config,
            "lang": lang,
            "id_column": id_column,
            "text_column": text_column,
            "html_column": html_column,
            "salt_range_rows": salt_range_rows,
            "vectorize": vectorize,
        },
        batch_size=1,
        concurrency=concurrency,
        num_cpus=1,
        batch_format="pyarrow",
    )

    # Hash-partition ids: the shuffle groups by a SMALL partition key
    # (2x task slots) and each partition task merges its terms with
    # local vectorized ops — per-(term,salt) Ray group calls would
    # dominate wall time (measured ~120s vs ~10s on 10k docs).
    from ..functions.hashing import hash_strings

    num_parts = (
        max(2 * (concurrency if isinstance(concurrency, int)
                 else concurrency[1]), 8)
    )

    def add_part1(tbl: pa.Table) -> pa.Table:
        h = hash_strings(tbl.column("term").combine_chunks())
        salt = tbl.column("salt").to_numpy().astype(np.uint64)
        part = ((h ^ (salt * np.uint64(0x9E3779B97F4A7C15)))
                % np.uint64(num_parts)).astype(np.int64)
        return tbl.append_column("part", pa.array(part))

    def add_part2(tbl: pa.Table) -> pa.Table:
        h = hash_strings(tbl.column("term").combine_chunks())
        part = (h % np.uint64(num_parts)).astype(np.int64)
        return tbl.append_column("part", pa.array(part))

    def drop_part(tbl: pa.Table) -> pa.Table:
        return tbl.drop_columns(["part"])

    merged = (
        fragments.map_batches(add_part1, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: _encode_partition(drop_part(g)),
                    batch_format="pyarrow")
        .map_batches(add_part2, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: _concat_partition(drop_part(g)),
                    batch_format="pyarrow")
    )
    seg = index_dir / "seg=g00000"
    seg.mkdir()

    # Parallel final write: Ray's sort range-partitions the term table
    # into disjoint, internally-sorted blocks; each block is written as
    # its own shard straight from the task (terms/<part>.parquet, plus
    # a slim (term,df,cf) global_terms shard) — no driver-side
    # single-writer bottleneck. Readers stitch shards back into global
    # term order via footer min/max stats (segment.py:terms_files).
    terms_dir = seg / "terms"
    terms_dir.mkdir()
    gt = index_dir / "global_terms"
    gt.mkdir()
    stats = (
        merged.sort("term")
        .map_batches(
            _TermShardWriter,
            fn_constructor_kwargs={"terms_dir": str(terms_dir),
                                   "global_dir": str(gt)},
            batch_size=None,
            batch_format="pyarrow",
            concurrency=(1, concurrency if isinstance(concurrency, int)
                         else concurrency[1]),
        )
        .take_all()
    )
    nterms = int(sum(s["nterms"] for s in stats))
    npostings = int(sum(s["npostings"] for s in stats))
    from .build import write_global_terms_ranges
    write_global_terms_ranges(gt)

    # the ordinal-ordered doc table keeps its per-block part files
    # (ordinals == part order == file-name order; segment.py:docs_files)
    docs_dir = seg / "docs"
    (index_dir / "docs_parts").rename(docs_dir)
    ndocs = 0
    total_tf = 0
    for f in sorted(docs_dir.glob("part-*.parquet")):
        md = pq.read_metadata(f)
        ndocs += md.num_rows
        t = pq.read_table(f, columns=["dl"])
        total_tf += int(t.column("dl").to_numpy().sum())
    meta = {
        "seg_id": "g00000",
        "input_files": [f for d in blocks for f in d["files"]],
        "row_groups": [list(r) for d in blocks for r in d["row_groups"]],
        "input_rows": int(sum(d["rows"] for d in blocks)),
        "ndocs": ndocs,
        "rejected": 0,
        "total_tf": total_tf,
        "nterms": nterms,
        "npostings": npostings,
        "status": "complete",
    }
    (seg / "meta.json").write_text(__import__("json").dumps(meta, indent=1))

    manifest = {
        "version": 1,
        "lang": lang,
        "strategy": "shuffle",
        "salt_range_rows": salt_range_rows,
        "text_config": {
            "tokenize": text_config.tokenize,
            "stopwords": text_config.stopwords,
            "stem": text_config.stem,
            "lowercase": text_config.lowercase,
        },
        "segments": [{
            "seg_id": "g00000",
            "ndocs": meta["ndocs"],
            "total_tf": meta["total_tf"],
            "nterms": meta["nterms"],
            "npostings": meta["npostings"],
            "rejected": 0,
            "base": 0,
        }],
        "ndocs": meta["ndocs"],
        "total_tf": meta["total_tf"],
        "avgdl": meta["total_tf"] / meta["ndocs"] if meta["ndocs"] else 0.0,
    }
    write_manifest(index_dir, manifest)
    return manifest
