"""Ray-Data-native inverted-index build.

Two strategies (SURVEY.md §7, BASELINE.json north rule):

``build_index`` (default, "aligned"): the scalable shuffle-free path.
The input parquet listing is split into fixed (file, row-group) groups
— one per segment — and a Dataset of segment descriptors is mapped
through an actor pool of SegmentBuilders. Each builder streams its row
groups (columns pruned to url/text/html), runs the full text chain,
accumulates term -> postings in memory, and writes an immutable segment
directory with lineage metadata. No all-to-all shuffle: this is the
same partition-by-document layout Lucene uses (and the reference's
part_* indexes, /root/reference/patapsco/job.py:280-308), and postings
never cross the network. Resume skips segments whose recorded lineage
matches (reference .complete markers, job.py:672-685).

``build_index_shuffle``: the explicit groupby-term path for when a
single global posting list per term is wanted. Docs are processed with
``map_batches``, exploded into per-(term, input-block) posting
fragments (pre-aggregated inside the batch — one row per term per
block, not per posting), then ``groupby(term, salt)`` merges fragments
into encoded posting chunks. Head-term skew (Zipf: stopword-like terms
touch nearly every doc) is handled by salting on the ordinal's high
bits, so each salted group is a disjoint ordinal range and the final
per-term chunk list concatenates in sorted order without re-decoding.

``finalize_index`` merges per-segment term statistics into global
(term, df, cf) shards via a Ray Data groupby — the "sorted streaming
aggregation" merge — and writes the corpus manifest (N, total_tf,
avgdl) used by BM25/QLD idf at query time.
"""

from __future__ import annotations

import collections
import logging
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..sources.extract import extract_text
from ..text import TextConfig, TextProcessor
from .norms import encode_lengths
from .segment import (
    build_terms_table,
    read_meta,
    segment_is_complete,
    write_manifest,
    write_segment,
    DOCS_SCHEMA,
)

LOGGER = logging.getLogger(__name__)

DEFAULT_ROWS_PER_SEGMENT = 250_000


def plan_segments(
    paths: list[str], rows_per_segment: int = DEFAULT_ROWS_PER_SEGMENT
) -> list[dict]:
    """Deterministic segment plan: split the sorted file listing at
    row-group granularity into groups of ~rows_per_segment rows.

    Returns descriptors {seg_id, files: [...], row_groups: [[...]...],
    rows}. Pure function of the input listing -> stable ordinals.
    """
    descriptors = []
    cur_files: list[str] = []
    cur_rgs: list[list[int]] = []
    cur_rows = 0

    def flush():
        nonlocal cur_files, cur_rgs, cur_rows
        if cur_files:
            descriptors.append(
                {
                    "seg_id": f"{len(descriptors):06d}",
                    "files": cur_files,
                    "row_groups": cur_rgs,
                    "rows": cur_rows,
                }
            )
        cur_files, cur_rgs, cur_rows = [], [], 0

    for path in sorted(paths):
        md = pq.read_metadata(path)
        rgs_here: list[int] = []
        for rg in range(md.num_row_groups):
            nrows = md.row_group(rg).num_rows
            if cur_rows + nrows > rows_per_segment and (cur_rows > 0):
                if rgs_here:
                    cur_files.append(path)
                    cur_rgs.append(rgs_here)
                    rgs_here = []
                flush()
            rgs_here.append(rg)
            cur_rows += nrows
        if rgs_here:
            cur_files.append(path)
            cur_rgs.append(rgs_here)
    flush()
    return descriptors


class SegmentBuilder:
    """Actor-pool stage: one segment per input descriptor.

    Text-processing state (stopword sets, stemmer cache, compiled
    regexes) is constructed once per actor in ``__init__`` and reused
    across segments (reference loads these once per process,
    text.py:280-296,440-441).
    """

    def __init__(self, index_dir: str, text_config: TextConfig, lang: str,
                 id_column: str = "url", text_column: str = "text",
                 html_column: str | None = "html",
                 vectorize: bool | None = None,
                 positions: bool = False):
        from .fastpath import FastDocProcessor, supports_fast_path

        # each builder actor is scheduled as ONE cpu: pin Arrow's
        # internal kernel pool to match, or every actor fans out over
        # the whole machine and per-stage cpu accounting (and measured
        # scaling) is meaningless
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        # (malloc tuning happens at package import — util.tune_malloc)
        self.index_dir = index_dir
        self.processor = TextProcessor(text_config, lang)
        self.id_column = id_column
        self.text_column = text_column
        self.html_column = html_column
        use_fast = (supports_fast_path(text_config)
                    if vectorize is None else vectorize)
        self.fast = (FastDocProcessor(text_config, lang)
                     if use_fast else None)
        if positions and self.fast is None:
            raise ValueError(
                "positions=True requires the vectorized build path "
                "(whitespace-tokenizer configs); model-tokenizer "
                "configs do not thread positions")
        self.positions = positions

    def _iter_input_batches(self, desc: dict, batch_size: int = 8192):
        columns = [self.id_column, self.text_column]
        if self.html_column:
            columns.append(self.html_column)
        seen = set()
        for path, rgs in zip(desc["files"], desc["row_groups"]):
            # a file may appear twice if a segment boundary fell inside it
            key = (path, tuple(rgs))
            if key in seen:
                continue
            seen.add(key)
            pf = pq.ParquetFile(path)
            avail = [c for c in columns if c in pf.schema_arrow.names]
            yield from pf.iter_batches(batch_size=batch_size, row_groups=rgs,
                                       columns=avail)

    def _build_fast(self, desc: dict) -> dict:
        """Vectorized build: the whole per-document chain runs as
        Arrow/numpy kernels (index/fastpath.py); per-row Python only
        for non-ASCII normalization and html-fallback rows."""
        from .fastpath import TermVocab, flat_postings_sorted

        vocab = TermVocab()
        tid_parts: list[np.ndarray] = []
        ord_parts: list[np.ndarray] = []
        tf_parts: list[np.ndarray] = []
        pos_parts: list[np.ndarray] = []
        id_parts: list[pa.Array] = []
        dl_parts: list[np.ndarray] = []
        rejected = 0
        input_rows = 0
        ordinal_base = 0
        for batch in self._iter_input_batches(desc, batch_size=32768):
            r = self.fast.process_batch(batch, self.id_column,
                                        self.text_column, self.html_column,
                                        want_positions=self.positions)
            n = len(r["ids"])
            input_rows += n
            keep = r["keep"]
            nkept = int(keep.sum())
            rejected += n - nkept
            ids = r["ids"]
            if nkept != n:
                ids = ids.filter(pa.array(keep))
            id_parts.append(ids)
            dl_parts.append(r["dl"])
            gid = vocab.map_codes(r["dict_strings"])
            if len(r["pair_code"]):
                # int32 parts: segment-local term ids / ordinals / tfs
                # all fit, and the final sort+gathers are memory-bound
                tid_parts.append(
                    gid[r["pair_code"]].astype(np.int32, copy=False))
                ord_parts.append(
                    (r["pair_doc"] + ordinal_base).astype(np.int32))
                tf_parts.append(r["pair_tf"].astype(np.int32, copy=False))
                if self.positions:
                    pos_parts.append(r["pair_pos"])
            ordinal_base += nkept

        dl = (np.concatenate(dl_parts) if dl_parts
              else np.empty(0, dtype=np.int64))
        norms = encode_lengths(dl)
        terms_sorted, term_offsets, ords_cat, tfs_cat, pos_cat = \
            flat_postings_sorted(vocab, tid_parts, ord_parts, tf_parts,
                                 pos_parts if self.positions else None)
        from .segment import build_terms_table_from_flat

        terms_table, npostings = build_terms_table_from_flat(
            terms_sorted, term_offsets, ords_cat, tfs_cat, norms,
            positions=pos_cat)
        doc_ids = (pa.concat_arrays([a.combine_chunks()
                                     if isinstance(a, pa.ChunkedArray) else a
                                     for a in id_parts])
                   if id_parts else pa.array([], pa.string()))
        docs_table = pa.table(
            {"doc_id": doc_ids, "dl": pa.array(dl), "norm": pa.array(norms)},
            schema=DOCS_SCHEMA,
        )
        meta = {
            "input_files": desc["files"],
            "row_groups": [list(r) for r in desc["row_groups"]],
            "input_rows": input_rows,
            "ndocs": len(doc_ids),
            "rejected": rejected,
            "total_tf": int(dl.sum()),
            "nterms": terms_table.num_rows,
            "npostings": npostings,
        }
        return write_segment(self.index_dir, desc["seg_id"], terms_table,
                             docs_table, meta)

    def build(self, desc: dict) -> dict:
        if segment_is_complete(self.index_dir, desc["seg_id"], desc["files"],
                               desc["row_groups"]):
            meta = read_meta(self.index_dir, desc["seg_id"])
            meta["resumed"] = True
            return meta
        if self.fast is not None:
            return self._build_fast(desc)

        postings: dict[str, tuple[list, list]] = {}
        doc_ids: list[str] = []
        doc_lens: list[int] = []
        rejected = 0
        input_rows = 0
        ordinal = 0
        proc = self.processor
        for batch in self._iter_input_batches(desc):
            ids = batch.column(self.id_column).to_pylist()
            texts = batch.column(self.text_column).to_pylist() \
                if self.text_column in batch.schema.names else [None] * len(ids)
            htmls = batch.column(self.html_column).to_pylist() \
                if self.html_column and self.html_column in batch.schema.names \
                else [None] * len(ids)
            input_rows += len(ids)
            for doc_id, text, html in zip(ids, texts, htmls):
                raw = extract_text(text, html)
                processed = proc.process(raw)
                if processed is None:  # over-length reject (docs.py:245-247)
                    rejected += 1
                    continue
                terms = processed.split()
                doc_ids.append(doc_id if isinstance(doc_id, str) else str(doc_id))
                doc_lens.append(len(terms))
                if terms:
                    for term, tf in collections.Counter(terms).items():
                        slot = postings.get(term)
                        if slot is None:
                            slot = ([], [])
                            postings[term] = slot
                        slot[0].append(ordinal)
                        slot[1].append(tf)
                ordinal += 1

        dl = np.asarray(doc_lens, dtype=np.int64)
        norms = encode_lengths(dl)
        terms_table, npostings = build_terms_table(postings, norms)
        docs_table = pa.table(
            {"doc_id": pa.array(doc_ids, pa.string()),
             "dl": pa.array(dl),
             "norm": pa.array(norms)},
            schema=DOCS_SCHEMA,
        )
        meta = {
            "input_files": desc["files"],
            "row_groups": [list(r) for r in desc["row_groups"]],
            "input_rows": input_rows,
            "ndocs": len(doc_ids),
            "rejected": rejected,
            "total_tf": int(dl.sum()),
            "nterms": terms_table.num_rows,
            "npostings": npostings,
        }
        return write_segment(self.index_dir, desc["seg_id"], terms_table,
                             docs_table, meta)

    def __call__(self, batch: dict) -> dict:
        metas = []
        n = len(batch["seg_id"])
        for i in range(n):
            desc = {
                "seg_id": str(batch["seg_id"][i]),
                "files": [str(f) for f in batch["files"][i]],
                "row_groups": [[int(x) for x in r] for r in batch["row_groups"][i]],
            }
            meta = self.build(desc)
            metas.append(meta)
        return {
            "seg_id": np.array([m["seg_id"] for m in metas]),
            "ndocs": np.array([m["ndocs"] for m in metas], dtype=np.int64),
            "total_tf": np.array([m["total_tf"] for m in metas], dtype=np.int64),
            "nterms": np.array([m["nterms"] for m in metas], dtype=np.int64),
            "npostings": np.array([m["npostings"] for m in metas], dtype=np.int64),
            "rejected": np.array([m["rejected"] for m in metas], dtype=np.int64),
        }


def build_index(
    paths: str | list[str],
    index_dir: str | pathlib.Path,
    *,
    text_config: TextConfig = TextConfig(),
    lang: str = "eng",
    id_column: str = "url",
    text_column: str = "text",
    html_column: str | None = "html",
    rows_per_segment: int = DEFAULT_ROWS_PER_SEGMENT,
    concurrency: int | tuple[int, int] | None = None,
    resume: bool = True,
    finalize: bool = True,
    vectorize: bool | None = None,
    positions: bool = False,
) -> dict:
    """Build (or resume) an index; returns the manifest dict.

    ``positions=True`` additionally stores within-document token
    positions per posting (delta+varint, one extra binary column per
    term), enabling :meth:`search.IndexSearcher.search_phrase`. The
    reference's Lucene index is DOCS_AND_FREQS only (index.py:52), so
    this is opt-in and off by default.

    The segment fan-out runs as a Dataset pipeline so Ray handles
    scheduling, retries and backpressure; each task writes its segment
    idempotently (tmp + rename), which makes the build resumable at
    segment granularity with recorded per-segment lineage.

    Incremental append: re-running over a superset of input files
    reuses every segment whose planned (file, row-group) lineage is
    unchanged and builds only the new ones — provided the new files
    sort AFTER the existing ones (the plan is a pure function of the
    sorted listing; files inserted in the middle shift segment
    boundaries and force a rebuild from that point).
    """
    if isinstance(paths, (str, pathlib.Path)):
        p = pathlib.Path(paths)
        paths = sorted(str(f) for f in p.glob("*.parquet")) if p.is_dir() else [str(p)]
    if not paths:
        # reference GlobIterator errors on empty matches
        # (util/__init__.py:222-301)
        raise FileNotFoundError("no parquet inputs to index")
    index_dir = pathlib.Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    descriptors = plan_segments(paths, rows_per_segment)
    if not resume:
        for desc in descriptors:
            d = index_dir / f"seg={desc['seg_id']}"
            if d.exists():
                for f in d.iterdir():
                    f.unlink()
                d.rmdir()

    if concurrency is None:
        avail = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(len(descriptors), avail))
    if isinstance(concurrency, int):
        # (N, N): a FIXED actor pool. A scalar is an autoscaling pool
        # whose create/destroy churn measured 2x slower end-to-end on
        # this workload (actors re-pay imports + processor setup)
        concurrency = (concurrency, concurrency)

    ds = ray.data.from_items(
        [
            {"seg_id": d["seg_id"], "files": d["files"],
             "row_groups": d["row_groups"]}
            for d in descriptors
        ]
    )
    from ..util import tasks_in_flight

    with tasks_in_flight(1):  # segment tasks are ~1 s: dynamic
        # assignment beats pre-queueing (bounded straggler tail)
        stats = ds.map_batches(
            SegmentBuilder,
            fn_constructor_kwargs={
                "index_dir": str(index_dir),
                "text_config": text_config,
                "lang": lang,
                "id_column": id_column,
                "text_column": text_column,
                "html_column": html_column,
                "vectorize": vectorize,
                "positions": positions,
            },
            batch_size=1,
            concurrency=concurrency,
            num_cpus=1,
        ).take_all()  # small: one row per segment

    manifest = {
        "version": 1,
        "lang": lang,  # reference .lang sidecar (index.py:79-82)
        "strategy": "aligned",
        "positions": positions,
        "text_config": {
            "tokenize": text_config.tokenize,
            "stopwords": text_config.stopwords,
            "stem": text_config.stem,
            "lowercase": text_config.lowercase,
        },
        "segments": sorted(
            (
                {
                    "seg_id": r["seg_id"],
                    "ndocs": int(r["ndocs"]),
                    "total_tf": int(r["total_tf"]),
                    "nterms": int(r["nterms"]),
                    "npostings": int(r["npostings"]),
                    "rejected": int(r["rejected"]),
                }
                for r in stats
            ),
            key=lambda s: s["seg_id"],
        ),
    }
    ndocs = sum(s["ndocs"] for s in manifest["segments"])
    total_tf = sum(s["total_tf"] for s in manifest["segments"])
    manifest["ndocs"] = ndocs
    manifest["total_tf"] = total_tf
    manifest["avgdl"] = (total_tf / ndocs) if ndocs else 0.0
    # global ordinal bases in seg_id order (Lucene docBase analogue)
    base = 0
    for s in manifest["segments"]:
        s["base"] = base
        base += s["ndocs"]
    if finalize:
        import time as _time

        t0 = _time.time()
        finalize_index(index_dir, manifest)
        # recorded so benchmarks can separate the fixed (serial-ish)
        # finalize cost from the parallel segment fan-out
        manifest["finalize_sec"] = round(_time.time() - t0, 3)
    write_manifest(index_dir, manifest)
    return manifest


# below this many (segment, term) rows the global-stats merge runs as
# a single local pyarrow aggregation; above it, a Ray Data groupby.
# Measured at 29.6M rows (12M docs, 992 segments): local threaded read
# + group_by + sort = 4.3 s vs 242 s for the Ray groupby+sort branch at
# 8 cpus (two all-to-alls + 992 small-file reads dominate) — the
# distributed branch only wins when the stats stop fitting one node.
# 200M rows ~= 10 GB peak on the local path; beyond that, Ray.
LOCAL_FINALIZE_ROWS = 200_000_000


def finalize_index(index_dir, manifest: dict) -> None:
    """Merge per-segment term stats into global_terms/ shards.

    The "sorted streaming aggregation" merge of (term, df, cf) across
    segments. Scale-adaptive: a local vectorized pyarrow group-by when
    the stats fit comfortably in one process (term-count metadata is
    known from segment lineage), else a Ray Data groupby shuffle.
    Output is term-sorted parquet for predicate-pushdown lookups.
    """
    index_dir = pathlib.Path(index_dir)
    seg_term_files = [
        str(index_dir / f"seg={s['seg_id']}" / "terms.parquet")
        for s in manifest["segments"]
    ]
    total_rows = sum(s["nterms"] for s in manifest["segments"])
    out_dir = index_dir / "global_terms"
    if out_dir.exists():
        for f in out_dir.iterdir():
            f.unlink()
    out_dir.mkdir(parents=True, exist_ok=True)
    if total_rows <= LOCAL_FINALIZE_ROWS:
        from concurrent.futures import ThreadPoolExecutor

        # threaded read: one small (term, df, cf) table per segment;
        # pyarrow releases the GIL so this scales with driver cores
        with ThreadPoolExecutor(max_workers=8) as ex:
            parts = list(ex.map(
                lambda f: pq.read_table(f, columns=["term", "df", "cf"]),
                seg_term_files))
        tbl = pa.concat_tables(parts)
        agg = tbl.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        # select/rename by NAME: TableGroupBy.aggregate's column order
        # (keys first vs last) has changed across pyarrow versions
        agg = agg.select(["term", "df_sum", "cf_sum"]).rename_columns(
            ["term", "df", "cf"])
        agg = agg.sort_by([("term", "ascending")])
        pq.write_table(agg, out_dir / "part-0.parquet",
                       row_group_size=1 << 16)
        write_global_terms_ranges(out_dir)
        return
    ds = ray.data.read_parquet(seg_term_files, columns=["term", "df", "cf"])

    def partial_agg(tbl: pa.Table) -> pa.Table:
        # pre-aggregate INSIDE each block before the all-to-all: a
        # common term appears once per segment, so a block covering k
        # segment files carries k copies of every shared term — this
        # collapses them to 1 and the shuffle moves ~vocab-sized
        # partials instead of (segments x vocab) rows
        if tbl.num_rows == 0:
            return pa.schema([("term", pa.string()), ("df", pa.int64()),
                              ("cf", pa.int64())]).empty_table()
        g = tbl.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        return g.select(["term", "df_sum", "cf_sum"]).rename_columns(
            ["term", "df", "cf"])

    agg = (ds.map_batches(partial_agg, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("term").sum(["df", "cf"]))
    # sum() names columns sum(df)/sum(cf); normalize names
    agg = agg.rename_columns({"sum(df)": "df", "sum(cf)": "cf"})
    # sort = Ray's range-partitioned sort, so the parallel parquet write
    # produces disjoint term-range shards, sorted within each file.
    # Query-time lookups prune whole shards by the recorded ranges and
    # row groups inside the survivor by parquet min/max stats — without
    # the sort every lookup would scan every shard.
    agg.sort("term").write_parquet(str(out_dir))
    write_global_terms_ranges(out_dir)


def write_global_terms_ranges(out_dir: str | pathlib.Path) -> None:
    """Record each global_terms shard's [min,max] term range in a
    sidecar, read by ``search.engine.lookup_global_stats`` to skip
    shards that cannot contain a query's terms."""
    import json

    out_dir = pathlib.Path(out_dir)
    ranges = {}
    for f in sorted(out_dir.glob("*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().names.index("term")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        if lo is not None:
            ranges[f.name] = [lo, hi]
    (out_dir / "_ranges.json").write_text(json.dumps(ranges))


def total_index_stats(manifest: dict) -> dict:
    return {
        "ndocs": manifest["ndocs"],
        "total_tf": manifest["total_tf"],
        "avgdl": manifest["avgdl"],
        "segments": len(manifest["segments"]),
        "npostings": sum(s["npostings"] for s in manifest["segments"]),
    }
