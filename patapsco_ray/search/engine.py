"""Top-k retrieval over index segments.

Mirrors the reference's PyseriniRetriever surface
(/root/reference/patapsco/retrieve.py:61-165): BM25 (k1=0.9, b=0.4) or
QLD (mu=1000), k default 1000 (schema.py:159,168-172), query text runs
through the SAME text-processing chain as documents
(job.py:952-962 strict check), ranks enumerate from 0
(retrieve.py:146), failures return empty results (retrieve.py:148-151).

Execution model: each segment is scored independently (dense float64
accumulator over segment-local ordinals, vectorized per query term;
direct fancy indexing is safe because a term's ordinals are unique),
then per-segment top-k heaps merge on (score desc, global ordinal asc)
— Lucene's docid tie-break with segment bases. Distributed search is a
Dataset pipeline: segments -> map_batches(actor pool holding norms +
term dictionaries) -> groupby(query_id) -> final top-k.

Optional block-max pruning (``prune=True``): exact block-max WAND over
the elementary intervals of the query terms' posting-block boundaries
(``SegmentScorer._score_block_max``) — intervals are visited in
descending summed-upper-bound order and scoring stops once no remaining
interval can reach the running k-th score. Identical results to dense
scoring (tested), strictly less decoding for selective queries.
"""

from __future__ import annotations

import heapq
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..index.codec import decode_positions, decode_postings
from ..index.segment import read_docs, read_manifest, read_terms, seg_dir
from ..text import TextConfig, TextProcessor
from .scorer import CorpusStats, make_scorer

DEFAULT_K = 1000  # reference schema.py:159


def process_query(text: str, processor: TextProcessor) -> list[str]:
    """Query text -> processed terms (reference topics.py:338-359)."""
    processed = processor.process(text)
    if processed is None:
        return []
    return processed.split()


def lookup_global_stats(index_dir, terms: list[str]) -> dict[str, tuple[int, int]]:
    """(df, cf) per term from the merged global_terms shards.

    Two-level pruning: whole shards are skipped via the ``_ranges.json``
    sidecar written at finalize time (shards are disjoint term ranges
    when the Ray merge path ran), then row groups inside surviving
    shards are pruned by parquet min/max stats on the sorted term
    column."""
    import json

    gt = pathlib.Path(index_dir) / "global_terms"
    if not terms or not gt.exists():
        return {}
    uniq = sorted(set(terms))
    files = sorted(str(f) for f in gt.glob("*.parquet"))
    ranges_path = gt / "_ranges.json"
    if ranges_path.exists():
        ranges = json.loads(ranges_path.read_text())
        files = [
            f for f in files
            if pathlib.Path(f).name not in ranges
            or any(ranges[pathlib.Path(f).name][0] <= t
                   <= ranges[pathlib.Path(f).name][1] for t in uniq)
        ]
    out: dict[str, tuple[int, int]] = {}
    for f in files:
        t = pq.read_table(f, filters=[("term", "in", uniq)])
        for term, df, cf in zip(
            t.column("term").to_pylist(),
            t.column("df").to_pylist(),
            t.column("cf").to_pylist(),
        ):
            prev = out.get(term, (0, 0))
            out[term] = (prev[0] + df, prev[1] + cf)
    return out


class SegmentScorer:
    """Holds one segment's norms (and lazily, postings) for scoring."""

    def __init__(self, index_dir, seg: dict, quantize_norms: bool = True,
                 deleted: "np.ndarray | None" = None):
        self.index_dir = index_dir
        self.seg_id = seg["seg_id"]
        self.base = seg["base"]
        self.ndocs = seg["ndocs"]
        self.quantize_norms = quantize_norms
        # tombstones (index.deletes): sorted doc_id array or None.
        # The ordinal live mask is derived lazily (one np.isin against
        # this segment's doc_ids) and cached for the scorer's lifetime
        self._deleted = deleted
        self._live: np.ndarray | None = None
        self._live_ready = deleted is None
        cols = ["norm"] if quantize_norms else ["norm", "dl"]
        docs = read_docs(index_dir, self.seg_id, columns=cols)
        self.norms = docs.column("norm").to_numpy().astype(np.uint8)
        # exact doc lengths for the un-quantized (SQL-oracle) scoring mode
        self.lens = (
            None if quantize_norms
            else docs.column("dl").to_numpy().astype(np.float64)
        )
        self._doc_ids: pa.Table | None = None
        self._pf: pq.ParquetFile | None = None
        self._rg_ranges: list[tuple[str, str]] | None = None

    def term_rows(self, terms: list[str]) -> dict[str, dict]:
        """Read this segment's rows for a sorted term list, reusing
        cached ParquetFile handles (footers parsed once per segment,
        not once per query batch) and pruning row groups by the term
        column's min/max statistics. Handles both the single-file and
        the sharded ``terms/`` layout (segment.py:terms_files)."""
        if self._pf is None:
            from ..index.segment import terms_files

            self._pf = []
            self._rg_ranges = []
            for path in terms_files(self.index_dir, self.seg_id):
                pf = pq.ParquetFile(path)
                md = pf.metadata
                idx = pf.schema_arrow.names.index("term")
                self._pf.append(pf)
                self._rg_ranges.append([
                    (md.row_group(i).column(idx).statistics.min,
                     md.row_group(i).column(idx).statistics.max)
                    for i in range(md.num_row_groups)
                ])
        wanted = sorted(terms)
        wanted_arr = pa.array(wanted, pa.string())
        out: dict[str, dict] = {}
        for pf, ranges in zip(self._pf, self._rg_ranges):
            rgs = [
                i for i, (lo, hi) in enumerate(ranges)
                if any(lo <= t <= hi for t in wanted)
            ]
            if not rgs:
                continue
            # two-phase read: the term column alone first (tiny), so
            # row groups whose min/max RANGE covers a probe term that
            # is not actually present never pay the posting-blob
            # decode (~2048 blobs per group); only groups with a real
            # match are read in full
            probe = pf.read_row_groups(rgs, columns=["term"])
            probe_mask = pa.compute.is_in(probe.column("term"),
                                          value_set=wanted_arr)
            if not pa.compute.any(probe_mask).as_py():
                continue
            hit = np.flatnonzero(np.asarray(
                probe_mask.to_numpy(zero_copy_only=False), dtype=bool))
            # map matched row positions back to their row groups
            sizes = np.array([pf.metadata.row_group(i).num_rows
                              for i in rgs], dtype=np.int64)
            bounds = np.cumsum(sizes)
            hit_rgs = sorted({rgs[j] for j in
                              np.searchsorted(bounds, hit, side="right")})
            tbl = pf.read_row_groups(hit_rgs)
            mask = pa.compute.is_in(tbl.column("term"),
                                    value_set=wanted_arr)
            tbl = tbl.filter(mask)
            for r in tbl.to_pylist():
                out[r["term"]] = r
        return out

    @property
    def live(self) -> "np.ndarray | None":
        """Boolean live mask over segment ordinals, or None when no
        tombstone touches this segment. Scoring keeps deleted docs in
        every accumulation (so surviving scores stay bit-identical —
        stats include deletes until compaction, like Lucene) and drops
        them only from candidacy, before any top-k cut."""
        if not self._live_ready:
            if self._doc_ids is None:
                self._doc_ids = read_docs(self.index_dir, self.seg_id,
                                          columns=["doc_id"]
                                          ).column("doc_id")
            ids = np.asarray(
                self._doc_ids.to_numpy(zero_copy_only=False), dtype=object)
            mask = ~np.isin(ids, self._deleted)
            self._live = None if mask.all() else mask
            self._live_ready = True
        return self._live

    def doc_ids_for(self, ordinals: np.ndarray) -> list[str]:
        if self._doc_ids is None:
            self._doc_ids = read_docs(self.index_dir, self.seg_id,
                                      columns=["doc_id"]).column("doc_id")
        return self._doc_ids.take(pa.array(ordinals)).to_pylist()

    def score(
        self,
        qterms: dict[str, int],
        scorer,
        global_stats: dict[str, tuple[int, int]],
        k: int,
        prune: bool = False,
        preloaded_rows: dict | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Return (ordinals, scores) of this segment's top-k.
        ``preloaded_rows`` (term -> term-table row) lets batch callers
        read each segment's postings once for many queries."""
        present = [t for t in qterms if t in global_stats]
        if not present:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        if preloaded_rows is not None:
            rows = [preloaded_rows[t] for t in present if t in preloaded_rows]
        else:
            tbl = read_terms(self.index_dir, self.seg_id, terms=present)
            rows = tbl.to_pylist()
        if not rows:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        rows.sort(key=lambda r: global_stats[r["term"]][0])
        if prune and self.quantize_norms and k < self.ndocs:
            # exact block-max pruning (single- AND multi-term; see
            # _score_block_max) — only sound on the quantized-norm path
            # because block metadata bounds quantized scores
            return self._score_block_max(rows, qterms, scorer,
                                         global_stats, k)
        scores = np.zeros(self.ndocs, dtype=np.float64)
        matched = np.zeros(self.ndocs, dtype=bool)
        for row in rows:
            term = row["term"]
            qtf = qterms[term]
            df, cf = global_stats[term]
            stat = df if hasattr(scorer, "idf") else cf
            ords, tfs = decode_postings(
                row["postings"], row["block_offsets"], row["block_counts"]
            )
            if self.quantize_norms:
                contrib = scorer.score_postings(
                    tfs, self.norms[ords], stat, qtf)
            else:
                contrib = scorer.score_postings_dl(
                    tfs, self.lens[ords], stat, qtf)
            scores[ords] += contrib
            matched[ords] = True
        return self._topk(scores, matched, k)

    def _score_block_max(
        self,
        rows: list[dict],
        qterms: dict[str, int],
        scorer,
        global_stats: dict[str, tuple[int, int]],
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k via block-max WAND at interval granularity.

        The north-star query path (BASELINE.json: "block-max WAND
        top-k"): every query term's posting blocks carry
        (block_last, block_max_tf, block_min_norm) metadata
        (index/codec.py), and blocks decode independently (each
        block's first varint is an absolute ordinal). The ordinal
        space is cut at every term's block boundaries into elementary
        intervals; an interval's upper bound is the sum of the
        covering blocks' max scores (vectorized,
        scorer.max_block_scores, same fp ops as the real scores so
        bounds are sound in floating point). Intervals are processed
        in descending upper-bound order, decoding each needed block
        exactly once; once k candidates exist and the next interval's
        bound is strictly below the running k-th score, no remaining
        document can reach the top-k (docs finalize with complete
        scores because an elementary interval lies inside at most one
        block per term, all of which are decoded before the interval
        is read). Degenerates to per-block skipping for single-term
        queries; decodes everything (== dense scoring) when bounds
        never separate, so it is never worse than one extra sort of
        ~#blocks entries. Reference semantics: Lucene's
        BlockMaxWAND-era scoring (conceptually; the reference indexes
        DOCS_AND_FREQS and scores via Lucene, index.py:51-52)."""
        import heapq as _hq

        infos = []
        for row in rows:
            term = row["term"]
            qtf = qterms[term]
            df, cf = global_stats[term]
            stat = df if hasattr(scorer, "idf") else cf
            last = np.asarray(row["block_last"], dtype=np.int64)
            lo = np.empty_like(last)
            lo[0] = 0
            lo[1:] = last[:-1] + 1
            ub = scorer.max_block_scores(
                np.asarray(row["block_max_tf"], dtype=np.int64),
                np.asarray(row["block_min_norm"], dtype=np.int64),
                stat, qtf)
            infos.append({"row": row, "stat": stat, "qtf": qtf,
                          "lo": lo, "last": last, "ub": ub})

        # elementary intervals: [pts[j], pts[j+1]) for every j
        pts = np.unique(np.concatenate(
            [i["lo"] for i in infos] + [i["last"] + 1 for i in infos]))
        niv = len(pts) - 1
        ub_sum = np.zeros(niv, dtype=np.float64)
        for i in infos:
            # the block whose range contains each interval (or -1):
            # interval starts never split a block, so start-in-block
            # implies the whole interval is in the block
            nblocks = len(i["last"])
            bi = np.searchsorted(i["last"], pts[:-1])
            bi_c = np.minimum(bi, nblocks - 1)
            valid = (bi < nblocks) & (pts[:-1] >= i["lo"][bi_c])
            i["iv_block"] = np.where(valid, bi_c, -1)
            ub_sum[valid] += i["ub"][bi_c[valid]]

        order = np.argsort(-ub_sum, kind="stable")
        heap: list[float] = []
        cand_ords: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        # decoded+scored blocks, keyed (term_index, block): scoring is
        # elementwise so per-block results are bit-identical to the
        # dense full-postings computation
        cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        for iv in order:
            if len(heap) >= k and ub_sum[iv] < heap[0]:
                break  # doc score <= interval ub < running k-th score
            lo_iv, hi_iv = int(pts[iv]), int(pts[iv + 1])
            slices: list[tuple[np.ndarray, np.ndarray]] = []
            for ti, i in enumerate(infos):
                b = int(i["iv_block"][iv])
                if b < 0:
                    continue
                dec = cache.get((ti, b))
                if dec is None:
                    row = i["row"]
                    o, t = decode_postings(
                        row["postings"], row["block_offsets"],
                        row["block_counts"], [b])
                    c = scorer.score_postings(
                        t, self.norms[o], i["stat"], i["qtf"])
                    dec = cache[(ti, b)] = (o, c)
                o, c = dec
                s = int(np.searchsorted(o, lo_iv))
                e = int(np.searchsorted(o, hi_iv))
                if s < e:
                    slices.append((o[s:e], c[s:e]))
            if not slices:
                continue
            # accumulate in FIXED term order (infos is df-sorted, same
            # as the dense loop) so each doc's additions happen in the
            # same sequence as dense scoring — bitwise-identical sums
            u_ords = np.unique(np.concatenate([o for o, _ in slices]))
            u_scores = np.zeros(len(u_ords), dtype=np.float64)
            for o, c in slices:
                u_scores[np.searchsorted(u_ords, o)] += c
            if self.live is not None:
                # drop tombstones BEFORE the heap: a deleted doc must
                # not raise the pruning threshold, or a block holding
                # the true k-th live doc could be skipped
                lm = self.live[u_ords]
                u_ords, u_scores = u_ords[lm], u_scores[lm]
                if not u_ords.size:
                    continue
            cand_ords.append(u_ords)
            cand_scores.append(u_scores)
            for s_ in u_scores:
                if len(heap) < k:
                    _hq.heappush(heap, float(s_))
                elif s_ > heap[0]:
                    _hq.heapreplace(heap, float(s_))
        if not cand_ords:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        return self._select_topk(np.concatenate(cand_ords),
                                 np.concatenate(cand_scores), k)

    def _select_topk(self, cand: np.ndarray, cscores: np.ndarray, k: int
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k with deterministic (score desc, ordinal asc)
        tie-break: partition to find the k-th score, keep EVERY
        candidate tied with it, then lexsort and truncate — so ties at
        the boundary always resolve to the lowest ordinals, regardless
        of candidate arrival order (argpartition alone picks arbitrary
        members among equal scores). Tombstoned docs are dropped here,
        before the cut — the single choke point every scoring path
        (dense, block-max, phrase, PSQ) funnels through."""
        live = self.live
        if live is not None and cand.size:
            lm = live[cand]
            cand, cscores = cand[lm], cscores[lm]
        if cand.size > k:
            part = np.argpartition(-cscores, k - 1)
            kth = cscores[part[k - 1]]
            keep = cscores >= kth
            cand, cscores = cand[keep], cscores[keep]
        order = np.lexsort((cand, -cscores))[:k]
        return cand[order].astype(np.int64), cscores[order]

    def _topk(self, scores: np.ndarray, matched: np.ndarray, k: int
              ) -> tuple[np.ndarray, np.ndarray]:
        cand = np.flatnonzero(matched)
        if cand.size == 0:
            return cand.astype(np.int64), np.empty(0, dtype=np.float64)
        return self._select_topk(cand, scores[cand], k)

    def phrase_doc_tfs(
        self, terms: list[str], rows: dict[str, dict] | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(ordinals, phrase tfs) of documents where the phrase's terms
        occur at consecutive positions of the processed token stream;
        the tf is the exact occurrence count (|∩_j (P_j - j)| over
        per-term position sets). Pass ``rows`` to reuse term rows
        already read for a larger query (the boolean-tree path)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        uniq = sorted(set(terms))
        if rows is None:
            rows = self.term_rows(uniq)
        if any(t not in rows for t in uniq):
            return empty
        if rows[uniq[0]].get("positions") is None:
            raise ValueError(
                "terms table has no positions column — phrase search "
                "needs an index built with positions=True")
        decoded: dict[str, tuple] = {}
        for t in uniq:
            r = rows[t]
            ords, tfs = decode_postings(
                r["postings"], r["block_offsets"], r["block_counts"])
            pos = decode_positions(r["positions"], int(tfs.sum()), tfs)
            off = np.concatenate([[0], np.cumsum(tfs)])
            decoded[t] = (ords, off, pos)
        common = decoded[uniq[0]][0]
        for t in uniq[1:]:
            common = np.intersect1d(common, decoded[t][0],
                                    assume_unique=True)
            if common.size == 0:
                return empty
        docs_out: list[int] = []
        tf_out: list[int] = []
        for d in common:
            cand: np.ndarray | None = None
            for j, t in enumerate(terms):
                ords, off, pos = decoded[t]
                i = int(np.searchsorted(ords, d))
                p = pos[off[i]:off[i + 1]] - j
                cand = (p if cand is None
                        else np.intersect1d(cand, p, assume_unique=True))
                if cand.size == 0:
                    break
            if cand is not None and cand.size:
                docs_out.append(int(d))
                tf_out.append(int(cand.size))
        if not docs_out:
            return empty
        return (np.asarray(docs_out, dtype=np.int64),
                np.asarray(tf_out, dtype=np.float64))

    def score_phrase(
        self,
        terms: list[str],
        scorer,
        global_stats: dict[str, tuple[int, int]],
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact-adjacency phrase top-k over a positional segment.

        A document matches when the phrase's terms occur at consecutive
        positions of the processed token stream; its tf is the exact
        occurrence count (|∩_j (P_j - j)| over per-term position sets).
        Scored like Lucene's PhraseQuery: summed term idf (multiplicity
        included) with the phrase tf in the BM25 tf-saturation.
        """
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        ords, tfv = self.phrase_doc_tfs(terms)
        if ords.size == 0:
            return empty
        idf = float(sum(scorer.idf(global_stats[t][0]) for t in terms))
        if self.quantize_norms:
            denom = scorer.denom_for_norms(self.norms[ords])
        else:
            denom = scorer.denom_for_dl(self.lens[ords])
        return self._select_topk(ords, idf * tfv / (tfv + denom), k)

    def score_psq(
        self,
        clauses: list[list[tuple[str, float]]],
        scorer,
        global_stats: dict[str, tuple[int, int]],
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Probabilistic Structured Query scoring (Darwish & Oard 2003,
        the semantics of the reference's PSQ searcher jar,
        retrieve.py:24-58): per weighted-OR clause the projected
        tf(d) = sum prob*tf(t,d) and projected df = sum prob*df(t)
        feed the ordinary Lucene BM25 formula; clause scores sum.
        Verified against the reference's golden scores
        (tests/test_psq.py:38-67: 0.5117189 @ k1=1.2,b=0.75)."""
        scores = np.zeros(self.ndocs, dtype=np.float64)
        matched = np.zeros(self.ndocs, dtype=bool)
        wanted = sorted({t for clause in clauses for t, _ in clause
                         if t in global_stats})
        if not wanted:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        tbl = read_terms(self.index_dir, self.seg_id, terms=wanted)
        rows = {r["term"]: r for r in tbl.to_pylist()}
        for clause in clauses:
            present = [(t, p) for t, p in clause if t in global_stats]
            if not present:
                continue
            df_proj = sum(p * global_stats[t][0] for t, p in present)
            tfp = np.zeros(self.ndocs, dtype=np.float64)
            for term, prob in present:
                row = rows.get(term)
                if row is None:
                    continue
                ords, tfs = decode_postings(
                    row["postings"], row["block_offsets"], row["block_counts"]
                )
                tfp[ords] += prob * tfs
            mask = tfp > 0
            if not mask.any():
                continue
            idf = scorer.idf(df_proj)
            tf_m = tfp[mask]
            if self.quantize_norms:
                denom = scorer.denom_for_norms(self.norms[mask])
            else:
                denom = scorer.denom_for_dl(self.lens[mask])
            scores[mask] += idf * tf_m / (tf_m + denom)
            matched |= mask
        return self._topk(scores, matched, k)


class IndexSearcher:
    """Single-process searcher over all segments (driver-side or inside
    one Ray actor). For distributed fan-out use ``search_dataset``."""

    def __init__(
        self,
        index_dir,
        *,
        scorer: str = "bm25",
        k1: float = 0.9,
        b: float = 0.4,
        mu: float = 1000.0,
        text_config: TextConfig | None = None,
        quantize_norms: bool = True,
        prune: "bool | str" = False,
    ):
        self.index_dir = str(index_dir)
        self.manifest = read_manifest(index_dir)
        if not (pathlib.Path(index_dir) / "global_terms").exists():
            # without merged (df, cf) stats every query would silently
            # match nothing — fail loudly instead
            raise FileNotFoundError(
                f"{index_dir} has no global_terms/ — the build ran with "
                "finalize=False; run index.finalize_index first"
            )
        self.lang = self.manifest["lang"]
        cfgd = self.manifest.get("text_config", {})
        self.text_config = text_config or TextConfig(
            tokenize=cfgd.get("tokenize", "whitespace"),
            stopwords=cfgd.get("stopwords", "lucene"),
            stem=cfgd.get("stem", False),
            lowercase=cfgd.get("lowercase", True),
        )
        self.processor = TextProcessor(self.text_config, self.lang)
        self.stats = CorpusStats(self.manifest["ndocs"], self.manifest["total_tf"])
        self.scorer_name = scorer
        self.scorer = make_scorer(scorer, self.stats, k1=k1, b=b, mu=mu)
        self.quantize_norms = quantize_norms
        # block-max WAND pruning (exact — bitwise-identical results,
        # tested): opt-in because dense vectorized decode is faster on
        # broad/head-term queries; True forces it, "auto" engages it
        # per query when the rarest term is selective (_resolve_prune)
        self.prune = prune
        # tombstones load once per searcher (index.deletes); every
        # segment scorer shares the sorted id array
        from ..index.deletes import deleted_id_set

        self.deleted = deleted_id_set(self.index_dir)
        self._segments: dict[str, SegmentScorer] = {}

    def _segment(self, seg: dict) -> SegmentScorer:
        ss = self._segments.get(seg["seg_id"])
        if ss is None:
            ss = SegmentScorer(self.index_dir, seg, self.quantize_norms,
                               deleted=self.deleted)
            self._segments[seg["seg_id"]] = ss
        return ss

    def search(self, query_text: str, k: int = DEFAULT_K,
               already_processed: bool = False) -> list[dict]:
        """Top-k for one query; list of {doc_id, rank, score}, rank
        0-based (reference retrieve.py:146)."""
        terms = (query_text.split() if already_processed
                 else process_query(query_text, self.processor))
        if not terms:
            return []
        qterms: dict[str, int] = {}
        for t in terms:
            qterms[t] = qterms.get(t, 0) + 1
        return self.search_weighted(qterms, k)

    def search_weighted(self, weights: dict[str, float], k: int = DEFAULT_K,
                        gstats: dict | None = None) -> list[dict]:
        """Top-k for pre-processed weighted query terms (weight = query
        term frequency for plain queries, a float for RM3-expanded
        queries). ``gstats`` lets batch callers prefetch the global
        (df, cf) stats for many queries in one pushdown read."""
        if not weights:
            return []
        if gstats is None:
            gstats = lookup_global_stats(self.index_dir, list(weights))
        present = [t for t in weights if t in gstats]
        if not present:
            return []
        prune = self._resolve_prune(weights, gstats, k)

        # fused per-segment load+score: term rows come from the cached
        # two-phase term_rows reader (not a fresh file open per
        # segment), and _merge_segments threads the tasks 8-way on
        # many-segment indexes — the single-shot analogue of the
        # search_batch protocol
        def seg_fn(ss):
            rows = ss.term_rows(present)
            return ss.score(weights, self.scorer, gstats, k,
                            prune=prune, preloaded_rows=rows)

        return self._merge_segments(seg_fn, k)

    # WAND engages automatically (prune="auto") only when the query has
    # a selective term: block-max pruning wins when a high-idf term
    # concentrates the score mass so the k-th-score threshold rises
    # fast; on head-term queries the dense vectorized decode is faster
    # (measured on the synthetic corpus — BASELINE.md). The heuristic
    # is the rarest term's df/N, from the global stats already in hand.
    AUTO_PRUNE_DF_RATIO = 0.01

    def _resolve_prune(self, weights: dict, gstats: dict, k: int) -> bool:
        if self.prune != "auto":
            return bool(self.prune)
        dfs = [gstats[t][0] for t in weights if t in gstats]
        if not dfs:
            return False
        return min(dfs) <= self.AUTO_PRUNE_DF_RATIO * self.stats.ndocs

    def search_phrase(self, phrase: str, k: int = DEFAULT_K,
                      already_processed: bool = False) -> list[dict]:
        """Exact-adjacency phrase top-k (requires an index built with
        ``positions=True`` — the reference's Lucene index is
        DOCS_AND_FREQS only, index.py:52, so its phrase queries return
        empty; this is the opt-in beyond-parity path). The phrase runs
        through the index's text chain first, so with a stopword-
        removing config adjacency is over the post-stopword stream.
        Scoring follows Lucene's PhraseQuery shape: summed term idf,
        tf = exact phrase frequency, BM25 saturation."""
        if not self.manifest.get("positions"):
            raise ValueError(
                f"{self.index_dir} was built without positions=True — "
                "phrase search needs a positional index")
        if not hasattr(self.scorer, "idf"):
            raise ValueError(
                f"phrase search requires the bm25 scorer, got "
                f"{self.scorer_name!r}")
        terms = (phrase.split() if already_processed
                 else process_query(phrase, self.processor))
        if not terms:
            return []
        gstats = lookup_global_stats(self.index_dir, sorted(set(terms)))
        if any(t not in gstats for t in terms):
            return []
        return self._merge_segments(
            lambda ss: ss.score_phrase(terms, self.scorer, gstats, k), k)

    def search_psq(self, query: "str | list[list[tuple[str, float]]]",
                   k: int = DEFAULT_K) -> list[dict]:
        """PSQ search: weighted-translation clauses combined with
        projected-statistics BM25 (reference retrieve.py:134-138
        searchPsq path; query syntax built at topics.py:433-442).
        Accepts either parsed clauses or the reference's query string
        ``psq AND (t1^p1 t2^p2) AND (...)``."""
        from .psq import parse_psq_query

        if not hasattr(self.scorer, "idf"):
            # projected-statistics scoring is defined for BM25 only; a
            # QLD scorer would die later with AttributeError deep in
            # score_psq — fail with a clear config error instead
            raise ValueError(
                f"psq requires the bm25 scorer, got {self.scorer_name!r}")
        clauses = parse_psq_query(query) if isinstance(query, str) else query
        if not clauses:
            return []
        terms = sorted({t for c in clauses for t, _ in c})
        gstats = lookup_global_stats(self.index_dir, terms)
        return self._merge_segments(
            lambda ss: ss.score_psq(clauses, self.scorer, gstats, k), k
        )

    def _merge_segments(self, seg_fn, k: int) -> list[dict]:
        segments = self.manifest["segments"]

        def run(seg) -> list[tuple]:
            ss = self._segment(seg)
            ords, scores = seg_fn(ss)
            if ords.size == 0:
                return []
            doc_ids = ss.doc_ids_for(ords)
            base = seg["base"]
            return [(-float(s), base + int(o), d)
                    for s, o, d in zip(scores, ords, doc_ids)]

        if len(segments) > 4:
            # threaded per-segment scoring for single-shot queries:
            # the dominant cold cost on many-segment indexes is the
            # per-segment parquet IO (norms + term rows), which
            # releases the GIL — same 8-way protocol as search_batch.
            # Thread-safety: each task touches its OWN segment's
            # scorer (distinct cache key), so the only shared mutation
            # is the dict insert, atomic under the GIL.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(8) as ex:
                parts = list(ex.map(run, segments))
        else:
            parts = [run(seg) for seg in segments]
        candidates = [c for p in parts for c in p]
        # merge per-segment top-k: (score desc, global ordinal asc) —
        # Lucene's docid-ascending tie-break across segment bases
        top = heapq.nsmallest(k, candidates)
        return [
            {"doc_id": d, "rank": r, "score": -negs}
            for r, (negs, _g, d) in enumerate(top)
        ]

    def search_batch(self, queries: list[tuple[str, str]], k: int = DEFAULT_K,
                     already_processed: bool = False) -> pa.Table:
        """Score a list of (query_id, query_text); returns a flat Arrow
        table (query_id, doc_id, rank, score). Global term stats for
        the whole batch are prefetched in ONE pushdown read."""
        processed: list[tuple[str, dict[str, int]]] = []
        for qid, text in queries:
            terms = (text.split() if already_processed
                     else process_query(text, self.processor))
            counts: dict[str, int] = {}
            for t in terms:
                counts[t] = counts.get(t, 0) + 1
            processed.append((qid, counts))
        all_terms = sorted({t for _, c in processed for t in c})
        gstats = lookup_global_stats(self.index_dir, all_terms)
        present = [t for t in all_terms if t in gstats]
        segments = self.manifest["segments"]

        # segments outer, queries inner: each segment's term table is
        # read ONCE for the whole batch, and reads are threaded
        # (parquet releases the GIL -> parallel IO across segments)
        def _load(seg):
            ss = self._segment(seg)
            rows = ss.term_rows(present) if present else {}
            return ss, rows

        from concurrent.futures import ThreadPoolExecutor

        if len(segments) > 1:
            with ThreadPoolExecutor(min(8, len(segments))) as ex:
                loaded = list(ex.map(_load, segments))
        else:
            loaded = [_load(s) for s in segments]

        # per query: numpy candidate arrays (score, global ordinal,
        # segment, local ordinal); doc ids resolved only for the final
        # top-k, not for every per-segment candidate
        nq = len(processed)
        prune_flags = [self._resolve_prune(c, gstats, k)
                       for _, c in processed]
        cand_scores: list[list] = [[] for _ in range(nq)]
        cand_gords: list[list] = [[] for _ in range(nq)]
        cand_segs: list[list] = [[] for _ in range(nq)]
        cand_lords: list[list] = [[] for _ in range(nq)]
        for si, (seg, (ss, rows)) in enumerate(zip(segments, loaded)):
            base = seg["base"]
            for qi, (qid, counts) in enumerate(processed):
                if not counts:
                    continue
                ords, scores = ss.score(counts, self.scorer, gstats, k,
                                        prune=prune_flags[qi],
                                        preloaded_rows=rows)
                if ords.size == 0:
                    continue
                cand_scores[qi].append(scores)
                cand_gords[qi].append(ords + base)
                cand_segs[qi].append(np.full(ords.size, si, dtype=np.int32))
                cand_lords[qi].append(ords)

        out_qid, out_doc, out_rank, out_score = [], [], [], []
        for qi, (qid, _counts) in enumerate(processed):
            if not cand_scores[qi]:
                continue
            scores = np.concatenate(cand_scores[qi])
            gords = np.concatenate(cand_gords[qi])
            segs_arr = np.concatenate(cand_segs[qi])
            lords = np.concatenate(cand_lords[qi])
            # full lexsort (not argpartition): the (score desc, ordinal
            # asc) tie-break must hold exactly at the k boundary
            order = np.lexsort((gords, -scores))[:k]
            scores, gords = scores[order], gords[order]
            segs_arr, lords = segs_arr[order], lords[order]
            # resolve doc ids segment by segment for the winners only
            doc_ids = np.empty(scores.size, dtype=object)
            for si in np.unique(segs_arr):
                mask = segs_arr == si
                ids = loaded[int(si)][0].doc_ids_for(lords[mask])
                doc_ids[mask] = ids
            out_qid.extend([qid] * scores.size)
            out_doc.extend(doc_ids.tolist())
            out_rank.extend(range(scores.size))
            out_score.extend(scores.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_qid, pa.string()),
                "doc_id": pa.array(out_doc, pa.string()),
                "rank": pa.array(out_rank, pa.int32()),
                "score": pa.array(out_score, pa.float64()),
            }
        )


def explain(searcher: "IndexSearcher", query_text: str, doc_id: str,
            already_processed: bool = False) -> dict:
    """Per-term score breakdown for one document — the reference's
    ``log_explanations`` surface (retrieve.py:144,153-165 wraps
    Lucene's explain).

    Returns {doc_id, score, terms: [{term, qtf, df, cf, tf, dl_used,
    idf_or_pw, weight, contribution}]}; the contributions sum to the
    document's score under the searcher's scorer settings.
    """
    terms = (query_text.split() if already_processed
             else process_query(query_text, searcher.processor))
    counts: dict[str, int] = {}
    for t in terms:
        counts[t] = counts.get(t, 0) + 1
    gstats = lookup_global_stats(searcher.index_dir, list(counts))
    # locate the doc's segment + ordinal
    target = None
    for seg in searcher.manifest["segments"]:
        ss = searcher._segment(seg)
        docs = read_docs(searcher.index_dir, ss.seg_id, columns=["doc_id"])
        col = docs.column("doc_id")
        idx = pa.compute.index(col, pa.scalar(str(doc_id)))
        if idx.as_py() >= 0:
            target = (ss, int(idx.as_py()))
            break
    if target is None:
        raise KeyError(f"doc_id {doc_id!r} not in index")
    ss, ordinal = target
    out_terms = []
    total = 0.0
    rows = ss.term_rows([t for t in counts if t in gstats])
    for term, qtf in counts.items():
        stat_pair = gstats.get(term)
        row = rows.get(term)
        entry = {"term": term, "qtf": qtf, "df": 0, "cf": 0, "tf": 0,
                 "contribution": 0.0}
        if stat_pair and row:
            df, cf = stat_pair
            ords, tfs = decode_postings(
                row["postings"], row["block_offsets"], row["block_counts"])
            pos = np.searchsorted(ords, ordinal)
            tf = int(tfs[pos]) if pos < len(ords) and ords[pos] == ordinal \
                else 0
            entry.update(df=df, cf=cf, tf=tf)
            if tf:
                stat = df if hasattr(searcher.scorer, "idf") else cf
                if ss.quantize_norms:
                    contrib = searcher.scorer.score_postings(
                        np.array([tf]), ss.norms[ordinal:ordinal + 1],
                        stat, qtf)
                else:
                    contrib = searcher.scorer.score_postings_dl(
                        np.array([tf]), ss.lens[ordinal:ordinal + 1],
                        stat, qtf)
                entry["contribution"] = float(contrib[0])
                total += entry["contribution"]
        out_terms.append(entry)
    return {"doc_id": str(doc_id), "score": total, "terms": out_terms}
