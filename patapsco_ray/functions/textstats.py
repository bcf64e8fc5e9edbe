"""Text-analysis operators over a document table (id, text).

All operators are zero-copy-Arrow ``map_batches`` stages: tokenization
uses ``pyarrow.compute`` list kernels (split / flatten / parent
indices) and per-document aggregation uses ``np.bincount`` /
``np.maximum.reduceat`` over the flattened arrays — no Python loop over
rows in the hot path.

Tokenization convention (shared with the DuckDB oracles in
``__ray_entry__``): lowercase, split on a single space, drop empty
tokens — i.e. ``list_filter(string_split(lower(text), ' '), x <> '')``.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..text.stopwords import load_stopwords
from .hashing import hash_strings

_LOG = logging.getLogger(__name__)

# BPE-ish word/number/symbol token pattern (RE2 — identical semantics in
# pyarrow and DuckDB regexp_extract_all)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

# Small built-in stopword profiles for languages whose Lucene lists are
# not bundled; used only by the language-id heuristic.
_LANGID_EXTRA = {
    "fra": frozenset(
        "le la les un une des du de et est sont dans pour que qui sur pas "
        "au aux avec ce cette ces il elle ils elles nous vous je tu se ne "
        "plus mais ou donc car si son sa ses leur leurs être avoir fait "
        "comme tout tous même aussi très bien été".split()
    ),
    "deu": frozenset(
        "der die das ein eine und ist sind in im für dass mit auf nicht "
        "von zu den dem des sich auch es ich du er sie wir ihr aber oder "
        "wenn als nur noch nach bei aus durch über unter wie was wer wo "
        "haben hat war waren sein werden wird schon sehr kann muss".split()
    ),
}


def _tokens(texts: pa.ChunkedArray | pa.Array):
    """(flat_tokens, parent_indices, nonempty_mask) for lowercased
    single-space tokenization of a string column."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(texts)
    toks = pc.split_pattern(low, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy().astype(np.int64, copy=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    nonempty = np.asarray(nonempty, dtype=bool)
    return flat, parent, nonempty


def _seg_count(parent: np.ndarray, mask: np.ndarray, n: int) -> np.ndarray:
    if parent.size == 0:
        return np.zeros(n, dtype=np.int64)
    return np.bincount(parent, weights=mask.astype(np.float64), minlength=n
                       ).astype(np.int64)


def _fill_int(arr: pa.Array, n: int) -> np.ndarray:
    out = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
    return np.asarray(out, dtype=np.int64)


def token_counts(
    ds: ray.data.Dataset, *, id_column: str = "doc_id", text_column: str = "text"
) -> ray.data.Dataset:
    """Per-document token counts: whitespace tokens and BPE-ish regex
    tokens -> (id, n_tokens, n_tokens_bpe)."""

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        _, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        n_tokens = _seg_count(parent, nonempty, n)
        n_bpe = _fill_int(
            pc.count_substring_regex(
                texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
                pattern=BPE_PATTERN,
            ),
            n,
        )
        return pa.table(
            {
                id_column: tbl.column(id_column),
                "n_tokens": pa.array(n_tokens),
                "n_tokens_bpe": pa.array(n_bpe),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_signals(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    stopword_source: str = "lucene",
    stopword_lang: str = "eng",
) -> ray.data.Dataset:
    """Per-document quality signals (integer components + ratios).

    Columns: id, n_chars, n_tokens, n_unique_tokens, n_stopwords,
    n_punct, stopword_ratio, unique_ratio. The integer components are
    SQL-reproducible; the ratios are 0.0 when the doc has no tokens.
    """
    stopset = sorted(load_stopwords(stopword_source, stopword_lang))
    stop_arr = pa.array(stopset, pa.string())

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        texts1 = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        flat, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        n_chars = _fill_int(pc.utf8_length(texts1), n)
        n_tokens = _seg_count(parent, nonempty, n)
        stop_mask = np.asarray(
            pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False),
            dtype=bool,
        )
        n_stop = _seg_count(parent, stop_mask & nonempty, n)
        n_punct = _fill_int(
            pc.count_substring_regex(texts1, pattern=PUNCT_PATTERN), n)
        # distinct tokens per doc: sort (parent, token_hash), count breaks
        if parent.size:
            h = hash_strings(flat, seed=7)
            keep = nonempty
            p2, h2 = parent[keep], h[keep]
            order = np.lexsort((h2, p2))
            p2, h2 = p2[order], h2[order]
            new = np.ones(p2.size, dtype=bool)
            if p2.size > 1:
                new[1:] = (p2[1:] != p2[:-1]) | (h2[1:] != h2[:-1])
            n_uniq = _seg_count(p2, new, n)
        else:
            n_uniq = np.zeros(n, dtype=np.int64)
        denom = np.maximum(n_tokens, 1).astype(np.float64)
        return pa.table(
            {
                id_column: tbl.column(id_column),
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "n_unique_tokens": pa.array(n_uniq),
                "n_stopwords": pa.array(n_stop),
                "n_punct": pa.array(n_punct),
                "stopword_ratio": pa.array(n_stop / denom),
                "unique_ratio": pa.array(n_uniq / denom),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


LANGID_LUCENE_LANGS = (
    "ara", "eng", "fas", "heb", "ind", "kor", "rus", "spa", "zho")


def langid_profiles() -> dict[str, list[str]]:
    """The shared language-id profiles (also embedded in the SQL
    oracle): every bundled Lucene stop list plus the built-in fra/deu
    word sets."""
    profiles = {
        lang: sorted(load_stopwords("lucene", lang))
        for lang in LANGID_LUCENE_LANGS
    }
    for lang, words in _LANGID_EXTRA.items():
        profiles[lang] = sorted(words)
    return profiles


def language_id(
    ds: ray.data.Dataset, *, id_column: str = "doc_id", text_column: str = "text"
) -> ray.data.Dataset:
    """Heuristic language id by stopword voting.

    For each profile (every bundled Lucene stop list —
    ara/eng/fas/heb/ind/kor/rus/spa/zho — plus built-in fra/deu),
    count tokens hitting the profile; predict the argmax (ties ->
    lexicographically first), 'und' when nothing hits.
    Columns: id, pred_lang, n_hits.
    """
    profiles = {lang: pa.array(words)
                for lang, words in langid_profiles().items()}
    langs = sorted(profiles)

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        flat, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        votes = np.zeros((len(langs), n), dtype=np.int64)
        for i, lang in enumerate(langs):
            m = np.asarray(
                pc.is_in(flat, value_set=profiles[lang]).to_numpy(
                    zero_copy_only=False),
                dtype=bool,
            )
            votes[i] = _seg_count(parent, m & nonempty, n)
        best = votes.argmax(axis=0)  # first max wins -> lexicographic tie-break
        n_hits = votes[best, np.arange(n)]
        pred = np.array(langs, dtype=object)[best]
        pred[n_hits == 0] = "und"
        return pa.table(
            {
                id_column: tbl.column(id_column),
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                "n_hits": pa.array(n_hits),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    window: int = 4,
    seed: int = 11,
) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: minimum rolling-hash over
    ``window``-token shingles -> (id, fingerprint:int64, n_windows).

    Documents sharing any long run of tokens collide on fingerprints
    with high probability; empty docs get fingerprint 0.
    """
    from .hashing import window_hashes

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        flat, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        # rebuild offsets over nonempty tokens only
        counts = _seg_count(parent, nonempty, n)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        th = hash_strings(flat, seed=seed)[nonempty] if parent.size else \
            np.empty(0, dtype=np.uint64)
        wh, woff = window_hashes(th, offsets, window)
        fp = np.zeros(n, dtype=np.uint64)
        nw = np.diff(woff)
        nz = np.flatnonzero(nw > 0)
        if nz.size:
            fp[nz] = np.minimum.reduceat(wh, woff[:-1][nz])
        return pa.table(
            {
                id_column: tbl.column(id_column),
                "fingerprint": pa.array(fp.view(np.int64)),
                "n_windows": pa.array(nw.astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_signals(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    ngram: int = 2,
) -> ray.data.Dataset:
    """Within-document repetition metrics (the Gopher / RefinedWeb
    quality-filter family): (id, n_tokens, top_token_frac_1e6,
    dup_ngram_frac_1e6).

    top_token_frac = max token frequency / n_tokens (0 for empty
    docs); dup_ngram_frac = (positions - distinct) / positions over
    strict ``ngram``-token windows (0 when the doc is shorter than
    ``ngram``). Fully vectorized: token hashes + lexsort run-lengths,
    no Python loop over rows.
    """

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        flat, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        counts = _seg_count(parent, nonempty, n)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        th = hash_strings(flat, seed=7)[nonempty] if parent.size else \
            np.empty(0, dtype=np.uint64)
        # max token frequency per doc: sort (doc, hash), run lengths
        tdoc = np.repeat(np.arange(n), counts)
        max_tf = np.zeros(n, dtype=np.int64)
        if th.size:
            order = np.lexsort((th, tdoc))
            d_s, h_s = tdoc[order], th[order]
            brk = np.flatnonzero(
                np.concatenate([[True], (d_s[1:] != d_s[:-1])
                                | (h_s[1:] != h_s[:-1])]))
            rl = np.diff(np.concatenate([brk, [len(d_s)]]))
            np.maximum.at(max_tf, d_s[brk], rl)
        # strict ngram windows (no short-doc fallback)
        n_pos = np.maximum(counts - ngram + 1, 0)
        n_distinct = np.zeros(n, dtype=np.int64)
        nwin = max(len(th) - ngram + 1, 0)
        if nwin > 0:
            from .hashing import splitmix64

            with np.errstate(over="ignore"):
                acc = np.zeros(nwin, dtype=np.uint64)
                for j in range(ngram):
                    mult = splitmix64(
                        np.array([j + 1], dtype=np.uint64))[0]
                    acc = splitmix64(acc ^ (th[j:j + nwin] * mult))
            starts = np.arange(nwin, dtype=np.int64)
            doc_of = np.searchsorted(offsets, starts, side="right") - 1
            valid = starts + ngram <= offsets[doc_of + 1]
            wh, wdoc = acc[valid], doc_of[valid]
            if wh.size:
                order = np.lexsort((wh, wdoc))
                d_s, h_s = wdoc[order], wh[order]
                first = np.concatenate(
                    [[True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])])
                n_distinct = np.bincount(
                    d_s[first], minlength=n).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            top_frac = np.where(counts > 0, max_tf / np.maximum(counts, 1),
                                0.0)
            dup_frac = np.where(
                n_pos > 0, (n_pos - n_distinct) / np.maximum(n_pos, 1), 0.0)
        return pa.table({
            id_column: tbl.column(id_column),
            "n_tokens": pa.array(counts),
            "top_token_frac_1e6": pa.array(_scaled_i64(top_frac)),
            "dup_ngram_frac_1e6": pa.array(_scaled_i64(dup_frac)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _scaled_i64(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def winnow_fingerprints(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 4,
    w: int = 4,
    seed: int = 11,
) -> ray.data.Dataset:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
    Local Algorithms for Document Fingerprinting", SIGMOD 2003).

    k-token shingle hashes -> sliding windows of ``w`` consecutive
    hashes -> the minimum of each window is selected -> the document's
    fingerprint set is the DISTINCT selected hashes. Guarantees any
    shared token run of length >= w + k - 1 produces a shared
    fingerprint. Documents with fewer than ``w`` shingles (but at
    least one) contribute one window spanning all their shingles.

    Returns (id, n_shingles, n_selected, min_fingerprint):
    n_shingles = number of k-shingle positions (token-count - k + 1;
    docs with 0 < tokens < k contribute their whole token sequence as
    ONE shingle, matching :func:`..dedup.ngram_jaccard_pairs`; 0 for
    empty docs), n_selected = |distinct selected hashes|,
    min_fingerprint = the smallest shingle hash (int64 view; 0 for
    shingle-less docs).

    Degenerate-parameter oracle: with ``w=1`` every shingle hash is
    selected, so ``n_selected`` equals the distinct k-shingle count —
    which SQL can recompute from the text without knowing the hash
    function (the driver checks exactly this at sf0.01).
    """
    from .hashing import window_hashes

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        flat, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        counts = _seg_count(parent, nonempty, n)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        th = hash_strings(flat, seed=seed)[nonempty] if parent.size else \
            np.empty(0, dtype=np.uint64)
        wh, woff = window_hashes(th, offsets, k)
        nsh = np.diff(woff)
        n_selected = np.zeros(n, dtype=np.int64)
        min_fp = np.zeros(n, dtype=np.uint64)
        nz = np.flatnonzero(nsh > 0)
        if nz.size:
            min_fp[nz] = np.minimum.reduceat(wh, woff[:-1][nz])
            # windows that fit wholly inside one doc
            sel_doc_parts, sel_val_parts = [], []
            if w <= 1:
                sel_val_parts.append(wh)
                sel_doc_parts.append(
                    np.repeat(np.arange(n), nsh.astype(np.int64)))
            else:
                long_nz = nz[nsh[nz] >= w]
                if len(wh) >= w and long_nz.size:
                    sw = np.lib.stride_tricks.sliding_window_view(
                        wh, w).min(axis=1)
                    starts = woff[:-1][long_nz]
                    nwin = (nsh[long_nz] - w + 1).astype(np.int64)
                    idx = (np.arange(nwin.sum(), dtype=np.int64)
                           - np.repeat(np.cumsum(nwin) - nwin, nwin)
                           + np.repeat(starts, nwin))
                    sel_val_parts.append(sw[idx])
                    sel_doc_parts.append(np.repeat(long_nz, nwin))
                # short docs: one window over all their shingles
                short_nz = nz[nsh[nz] < w]
                if short_nz.size:
                    sel_val_parts.append(
                        np.minimum.reduceat(wh, woff[:-1][short_nz]))
                    sel_doc_parts.append(short_nz)
            if sel_val_parts:
                vals = np.concatenate(sel_val_parts)
                docs = np.concatenate(sel_doc_parts)
                order = np.lexsort((vals, docs))
                dv, vv = docs[order], vals[order]
                first = np.ones(dv.size, dtype=bool)
                if dv.size > 1:
                    first[1:] = (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])
                n_selected = np.bincount(
                    dv[first], minlength=n).astype(np.int64)
        return pa.table({
            id_column: tbl.column(id_column),
            "n_shingles": pa.array(nsh.astype(np.int64)),
            "n_selected": pa.array(n_selected),
            "min_fingerprint": pa.array(min_fp.view(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_filter(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_stopword_ratio: float = 0.6,
    min_unique_ratio: float = 0.1,
    stopword_source: str = "lucene",
    stopword_lang: str = "eng",
) -> ray.data.Dataset:
    """Training-data quality gate: keep documents whose signals fall
    inside the configured bounds (the standard web-corpus filter shape:
    length window, stopword-density cap, repetition floor). Returns the
    kept rows' (id, n_tokens) so downstream stages can join or count.
    """
    signals = quality_signals(
        ds, id_column=id_column, text_column=text_column,
        stopword_source=stopword_source, stopword_lang=stopword_lang,
    )

    def keep(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_tokens").to_numpy()
        sw = tbl.column("stopword_ratio").to_numpy()
        uq = tbl.column("unique_ratio").to_numpy()
        mask = (
            (n >= min_tokens) & (n <= max_tokens)
            & (sw <= max_stopword_ratio) & (uq >= min_unique_ratio)
        )
        kept = tbl.filter(pa.array(mask))
        return kept.select([id_column, "n_tokens"])

    return signals.map_batches(keep, batch_format="pyarrow",
                               zero_copy_batch=True)


def _cf_dataset(ds: ray.data.Dataset, text_column: str
                ) -> ray.data.Dataset:
    """Corpus unigram collection frequencies as a DISTRIBUTED
    ``(term, cf)`` dataset: per-batch ``np.unique`` partials (only
    (term, cf) rows cross the shuffle — the same partial-agg-before-
    groupby shape as the index global stats), folded by a term
    groupby. The vocabulary never lands on the driver."""

    def partial(tbl: pa.Table) -> pa.Table:
        flat, _, nonempty = _tokens(tbl.column(text_column))
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty]
        uniq, counts = np.unique(toks.astype(str), return_counts=True)
        return pa.table({
            "term": pa.array(uniq.tolist(), pa.string()),
            "cf": pa.array(counts, pa.int64()),
        })

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["term", "cf"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term").sum("cf")
        .map_batches(rename, batch_format="pyarrow")
    )


def unigram_corpus_stats(
    ds: ray.data.Dataset, *, text_column: str = "text"
) -> tuple[dict, int]:
    """Driver-side ``({term: cf}, total_tokens)`` model — the
    broadcast-dict form of :func:`_cf_dataset`, for bounded
    vocabularies (callers who pass ``stats=`` to
    :func:`unigram_logprob` or want the dict directly). At web scale
    use :func:`unigram_logprob` WITHOUT ``stats`` — it checks the
    vocabulary size distributed and only collects below its
    ``broadcast_max_terms`` cap."""
    cf = {r["term"]: int(r["cf"])
          for r in _cf_dataset(ds, text_column).take_all()}
    return cf, sum(cf.values())


def unigram_logprob(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    scale: int = 1_000_000,
    stats: tuple[dict, int] | None = None,
    broadcast_max_terms: int = 2_000_000,
    join_partitions: int | None = None,
    agg_partitions: int = 256,
) -> ray.data.Dataset:
    """Unigram-LM document scoring (the CCNet/KenLM-style quality
    signal, self-trained): per document, the sum of per-token log
    probabilities ``ln(cf(t)/N)`` under the corpus unigram model.

    Determinism contract: each term's log-probability is quantized to
    ``floor(ln(cf/N)*scale + 0.5)`` ONCE (driver-side ``math.log``, the
    same libm the SQL oracle's ``ln`` resolves to), and per-document
    scores are INTEGER sums of those quanta — order-independent, so the
    Ray sum and the SQL sum agree bit-for-bit.

    Scale posture — adaptive, never vocabulary-bounded on the driver:
    the self-trained model is computed as a DISTRIBUTED ``(term, cf)``
    dataset and its size checked with ``count()`` before collecting.
    At or below ``broadcast_max_terms`` distinct terms it collapses to
    a broadcast dict (``ray.put`` once, read per actor) and the
    scoring pass is one shuffle-free ``map_batches`` with per-batch
    ``np.unique`` factorization so dict lookups touch each DISTINCT
    batch term once, never each token. Above the cap (O(10^9)-term web
    vocabularies) the model stays sharded: (doc, term, count) rows
    left-outer-join it on ``term``, then a coarse hash(doc)-
    partitioned vectorized fold sums each document's quanta (Python
    per PARTITION, never per doc) — identical rows either way
    (``tests/test_sampling_lm.py`` asserts it). Passing ``stats=``
    forces the broadcast path with the given model.
    Returns (id, n_tokens, sum_logprob_q).
    """
    import math

    import ray as _ray

    if stats is None:
        cft = _cf_dataset(ds, text_column).materialize()
        n_terms = cft.count()
        if n_terms > broadcast_max_terms:
            _LOG.info(
                "unigram_logprob: %d distinct terms > "
                "broadcast_max_terms=%d — using the distributed join "
                "path", n_terms, broadcast_max_terms)
            total = int(cft.sum("cf"))
            return _unigram_join_path(
                ds, cft, total, id_column=id_column,
                text_column=text_column, scale=scale,
                join_partitions=join_partitions,
                agg_partitions=agg_partitions)
        cf = {r["term"]: int(r["cf"]) for r in cft.take_all()}
        stats = (cf, sum(cf.values()))
    cf, total = stats
    qlp = {
        t: int(math.floor(math.log(c / total) * scale + 0.5))
        for t, c in cf.items()
    }
    qlp_ref = _ray.put(qlp)

    def fn(tbl: pa.Table) -> pa.Table:
        model = _ray.get(qlp_ref)
        flat, parent, nonempty = _tokens(tbl.column(text_column))
        n = tbl.num_rows
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty].astype(str)
        parent = parent[nonempty]
        uniq, inv = np.unique(toks, return_inverse=True)
        uniq_q = np.array([model.get(t, 0) for t in uniq], dtype=np.int64)
        per_tok = uniq_q[inv]
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, parent, per_tok)
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        return pa.table({
            id_column: tbl.column(id_column),
            "n_tokens": pa.array(n_tokens),
            "sum_logprob_q": pa.array(sums),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _unigram_join_path(
    ds: ray.data.Dataset,
    cft: ray.data.Dataset,
    total: int,
    *,
    id_column: str,
    text_column: str,
    scale: int,
    join_partitions: int | None,
    agg_partitions: int,
) -> ray.data.Dataset:
    """Web-scale unigram-LM scoring with the model kept SHARDED:
    (doc, term, count) rows left-outer-join the (term, qlp) model on
    ``term``, then a coarse hash(doc)-partitioned vectorized fold sums
    each document's quanta. Zero-token docs ride through as a
    ``(doc, "", 0)`` sentinel (the empty string is never a token) so
    every input row appears in the output, like the broadcast path.
    No stage's memory grows with the corpus vocabulary."""
    import math

    from ..util import auto_join_partitions
    from .dedup import _hash_part
    from .spans import _codes
    from .windows import _field_type, _pin

    if join_partitions is None:
        join_partitions = auto_join_partitions()
    idt = _field_type(ds, id_column)
    model_schema = pa.schema([("term", pa.string()), ("qlp", pa.int64())])

    def to_model(tbl: pa.Table) -> pa.Table:
        cfv = tbl.column("cf").to_numpy()
        # scalar libm log per DISTINCT term — vocabulary-bounded stage,
        # once per term across the cluster; keeps the quantization
        # contract (driver math.log == SQL ln) exact on this path
        q = np.fromiter(
            (math.floor(math.log(c / total) * scale + 0.5) for c in cfv),
            dtype=np.int64, count=len(cfv))
        return pa.table({"term": tbl.column("term"), "qlp": pa.array(q)})

    model = cft.map_batches(to_model, batch_format="pyarrow").map_batches(
        _pin(model_schema), batch_format="pyarrow")

    dt_schema = pa.schema([(id_column, idt), ("term", pa.string()),
                           ("c", pa.int64())])

    def emit(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        flat, parent, nonempty = _tokens(tbl.column(text_column))
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty].astype(str)
        parent = parent[nonempty]
        if toks.size:
            uniq, inv = np.unique(toks, return_inverse=True)
            keys = parent * np.int64(len(uniq)) + inv
            ukeys, c = np.unique(keys, return_counts=True)
            docs = (ukeys // len(uniq)).astype(np.int64)
            tidx = (ukeys % len(uniq)).astype(np.int64)
            terms = uniq[tidx].tolist()
            counts = c.astype(np.int64)
        else:
            docs = np.empty(0, dtype=np.int64)
            terms, counts = [], np.empty(0, dtype=np.int64)
        # sentinel rows keep zero-token docs in the output
        present = np.zeros(n, dtype=bool)
        present[docs] = True
        missing = np.flatnonzero(~present)
        all_docs = np.concatenate([docs, missing])
        return pa.table({
            id_column: tbl.column(id_column).take(pa.array(all_docs)),
            "term": pa.array(terms + [""] * len(missing), pa.string()),
            "c": pa.array(np.concatenate(
                [counts, np.zeros(len(missing), dtype=np.int64)])),
        })

    dt = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True
                        ).map_batches(_pin(dt_schema),
                                      batch_format="pyarrow")
    joined = dt.join(model, join_type="left_outer",
                     num_partitions=join_partitions, on=("term",))

    def score_part(tbl: pa.Table) -> pa.Table:
        q = pc.fill_null(pc.cast(tbl.column("qlp"), pa.int64()),
                         pa.scalar(0, pa.int64()))
        contr = pc.multiply_checked(tbl.column("c"), q)
        return pa.table({
            id_column: tbl.column(id_column),
            "c": tbl.column("c"),
            "contr": contr,
            "part": _hash_part(tbl.column(id_column), agg_partitions,
                               seed=13),
        })

    out_schema = pa.schema([(id_column, idt), ("n_tokens", pa.int64()),
                            ("sum_logprob_q", pa.int64())])

    def fold_part(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return out_schema.empty_table()
        ids = grp.column(id_column).combine_chunks()
        codes = _codes(ids)
        c = grp.column("c").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        contr = grp.column("contr").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        ncodes = int(codes.max()) + 1
        # int64 accumulation (np.bincount weights would round through
        # float64 past 2^53)
        sums = np.zeros(ncodes, dtype=np.int64)
        np.add.at(sums, codes, contr)
        ntok = np.zeros(ncodes, dtype=np.int64)
        np.add.at(ntok, codes, c)
        ucodes, first = np.unique(codes, return_index=True)
        return pa.table({
            id_column: ids.take(pa.array(first)),
            "n_tokens": pa.array(ntok[ucodes]),
            "sum_logprob_q": pa.array(sums[ucodes]),
        }).cast(out_schema)

    return (joined.map_batches(score_part, batch_format="pyarrow")
            .groupby("part").map_groups(fold_part, batch_format="pyarrow")
            .map_batches(_pin(out_schema), batch_format="pyarrow"))
