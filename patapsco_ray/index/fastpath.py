"""Vectorized document-processing fast path for index builds.

The per-row loop (extract -> normalize -> tokenize -> stopwords ->
Counter) was the index build's inner loop and its throughput ceiling
(~89k docs/s round 1). For the common config — whitespace tokenizer, no
stemmer — the whole chain is expressible as Arrow/numpy kernels:

    pre_normalize_batch  (RE2 kernels; Python only for non-ASCII rows)
    utf8_lower -> utf8_split_whitespace -> list_flatten/parent_indices
    stopword drop  = ~is_in(flat, stop_set)
    doc lengths    = bincount(parent)
    per-(doc,term) tf = np.unique(parent * V + term_code)

Output is identical to ``TextProcessor.process`` per row (parity
asserted in tests/test_fastpath.py); stemmed / model-tokenizer configs
keep the per-row path.

Reference chain being replicated: /root/reference/patapsco/docs.py:221-259.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.extract import html_to_text
from ..text import TextConfig
from ..text.normalize import pre_normalize
from ..text.processor import MAX_TEXT_LEN
from ..text.stopwords import load_stopwords


# byte classes for the one-pass row scan: bit 1 = control byte that
# normalization deletes, bit 2 = non-ASCII byte (UTF-8 lead/cont)
_BYTE_CLASS = np.zeros(256, dtype=np.uint8)
for _b in (*range(0x00, 0x09), *range(0x0E, 0x20), 0x7F):
    _BYTE_CLASS[_b] |= 1
_BYTE_CLASS[0x80:] |= 2


def _scan_rows(texts: pa.Array):
    """One numpy pass over the utf8 data buffer: per-row flags
    (has_control_byte, has_non_ascii_byte).

    Classifying raw bytes is sound for both properties: the control
    set is pure ASCII (never a UTF-8 continuation byte) and any byte
    >= 0x80 means the row is non-ASCII. Returns (None, None) when the
    layout isn't a plain null-free string array (caller falls back to
    the RE2 scan).
    """
    if not isinstance(texts, pa.StringArray) or texts.null_count:
        return None, None
    bufs = texts.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32,
                        count=len(texts) + 1, offset=texts.offset * 4)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    cls = _BYTE_CLASS[data[lo:hi]]
    flagged = np.flatnonzero(cls)
    n = len(texts)
    ctrl = np.zeros(n, dtype=bool)
    nonascii = np.zeros(n, dtype=bool)
    if len(flagged):
        # map flagged byte positions back to their rows; with repeated
        # offsets (empty rows) side="right" lands on the owning row
        rows = np.searchsorted(off, flagged + lo, side="right") - 1
        f = cls[flagged]
        ctrl[rows[(f & 1) != 0]] = True
        nonascii[rows[(f & 2) != 0]] = True
    return ctrl, nonascii


def _pre_normalize_for_tokens(texts: pa.Array) -> pa.Array:
    """pre_normalize specialized for whitespace tokenization.

    Token-equivalent to ``Normalizer.pre_normalize`` (NOT
    byte-identical): the whitespace-collapse step maps whitespace to
    whitespace, so ``split()`` yields identical tokens with or without
    it and we skip that full rewrite pass. What DOES change tokens is
    control-char deletion (``a\\x01b`` -> ``ab``); dirty rows are rare
    in real web text, so one cheap scan finds them and only those rows
    pay the rewrite. Non-ASCII rows take the full per-string Python
    chain (format chars / NFC / mojibake all alter tokens).
    Parity is asserted by tests/test_fastpath.py.
    """
    CTRL = "[\x00-\x08\x0e-\x1f\x7f]"
    ctrl_np, nonascii_np = _scan_rows(texts)
    if ctrl_np is not None:
        dirty_ascii = pa.array(ctrl_np & ~nonascii_np)
        non_ascii = pa.array(nonascii_np)
    else:  # sliced/chunked/null layouts: RE2 scan
        non_ascii = pc.fill_null(pc.invert(pc.string_is_ascii(texts)), False)
        dirty = pc.fill_null(pc.match_substring_regex(texts, CTRL), False)
        dirty_ascii = pc.and_(dirty, pc.invert(non_ascii))
    out = texts
    if pc.any(dirty_ascii).as_py():
        idx = np.flatnonzero(dirty_ascii.to_numpy(zero_copy_only=False))
        sub = pc.replace_substring_regex(
            out.take(pa.array(idx)), pattern=CTRL, replacement="")
        out = pc.replace_with_mask(out, dirty_ascii, sub)
    if pc.any(non_ascii).as_py():
        idx = np.flatnonzero(non_ascii.to_numpy(zero_copy_only=False))
        fixed = [pre_normalize(s)
                 for s in texts.take(pa.array(idx)).to_pylist()]
        out = pc.replace_with_mask(out, non_ascii,
                                   pa.array(fixed, type=pa.string()))
    return out


def supports_fast_path(config: TextConfig) -> bool:
    """True when the vectorized chain reproduces the config exactly:
    whitespace tokenization (stopwords, lowercasing vectorize;
    stemming applies per batch-unique token via the dictionary, valid
    for any pure per-token stemmer)."""
    return config.tokenize == "whitespace"


class FastDocProcessor:
    """Stateless-per-batch vectorized processor; construct once per
    actor (stopword set compiled to an Arrow value set).

    Stemming note: the reference stems every token then removes
    stopwords by their PRE-stem indices (docs.py:253-256). Dropping
    stopwords first and stemming the survivors yields the same output
    because the stemmer is a pure per-token function — which also lets
    us stem each batch-unique dictionary entry once instead of every
    token occurrence (~100x fewer stemmer calls on web text).
    """

    def __init__(self, config: TextConfig, lang: str):
        from ..text.stem import create_stemmer

        if not supports_fast_path(config):
            raise ValueError(f"config not vectorizable: {config}")
        self.lowercase = config.lowercase
        self.stemmer = (create_stemmer(config.stem, lang)
                        if config.stem else None)
        if config.stopwords:
            source = (config.stopwords
                      if isinstance(config.stopwords, str) else "lucene")
            self.stop_set = pa.array(
                sorted(load_stopwords(source, lang)), pa.string())
        else:
            self.stop_set = None

    def process_batch(
        self,
        batch: pa.RecordBatch | pa.Table,
        id_column: str,
        text_column: str,
        html_column: str | None,
        want_positions: bool = False,
    ) -> dict:
        """Process one input batch fully vectorized.

        Returns a dict with:
          ids        pa.Array[string]  one per input row
          keep       np.bool_ mask     False = over-length reject
          dl         np.int64[nkept]   post-stopword token counts
          pair_doc   np.int64          kept-row index per (doc,term)
          pair_code  np.int64          batch-local term code
          pair_tf    np.int64          term frequency
          pair_pos   np.int32 | None   (want_positions) token positions
                     in the PROCESSED stream, flat and tf-aligned:
                     pair j owns pair_tf[j] ascending values
          dict_strings list[str]       code -> term text
        (pairs are sorted by (pair_doc, pair_code)).
        """
        names = (batch.schema.names if isinstance(batch, pa.RecordBatch)
                 else batch.column_names)
        ids = pc.cast(batch.column(id_column), pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(ids)
        texts = (batch.column(text_column) if text_column in names
                 else pa.nulls(n, pa.string()))
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # html fallback rows: text null/empty but html present
        have_text = pc.fill_null(pc.not_equal(texts, ""), False)
        if not pc.all(have_text).as_py():
            miss = np.flatnonzero(
                pc.invert(have_text).to_numpy(zero_copy_only=False))
            htmls = (batch.column(html_column).take(pa.array(miss)).to_pylist()
                     if html_column and html_column in names else
                     [None] * len(miss))
            filled = [html_to_text(h) if h is not None else "" for h in htmls]
            texts = pc.replace_with_mask(
                pc.fill_null(texts, ""), pc.invert(have_text),
                pa.array(filled, pa.string()))

        # over-length reject (reference docs.py:245-247)
        keep = (pc.less_equal(pc.utf8_length(texts), MAX_TEXT_LEN)
                .to_numpy(zero_copy_only=False))
        keep = np.asarray(keep, dtype=bool)
        kept_texts = (texts if keep.all()
                      else texts.filter(pa.array(keep)))

        if isinstance(kept_texts, pa.ChunkedArray):
            kept_texts = kept_texts.combine_chunks()
        norm = _pre_normalize_for_tokens(kept_texts)
        # the reference chain lowercases AFTER stemming
        # (post_normalize, docs.py:258): with a stemmer the tokens
        # must keep their case until stemmed; without one, lowering
        # applies to the small batch dictionary below
        # ascii split == unicode split here: normalization collapsed
        # every Unicode whitespace char to " " (ASCII rows skip the
        # collapse but can only hold ASCII whitespace), and UTF-8
        # multibyte sequences never contain ASCII-range bytes
        toks = pc.ascii_split_whitespace(norm)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy()  # int32
        nkept_docs = int(keep.sum())

        if len(flat) == 0:
            return {"ids": ids, "keep": keep,
                    "dl": np.zeros(nkept_docs, np.int64),
                    "pair_doc": np.empty(0, np.int64),
                    "pair_code": np.empty(0, np.int64),
                    "pair_tf": np.empty(0, np.int64),
                    "pair_pos": np.empty(0, np.int32),
                    "dict_strings": []}
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        # dictionary-encode FIRST: every per-token predicate (empty
        # token, case-insensitive stopword check — reference
        # text.py:405-411) runs over the batch-unique dictionary
        # (10^4 strings) instead of the token stream (10^6), and the
        # token bytes are never copied again
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy()  # int32, zero-copy
        dict_arr = enc.dictionary
        dict_keep = pc.not_equal(dict_arr, "")
        if self.stop_set is not None:
            dict_keep = pc.and_(
                dict_keep,
                pc.invert(pc.is_in(pc.utf8_lower(dict_arr),
                                   value_set=self.stop_set)))
        dict_keep = np.asarray(
            dict_keep.to_numpy(zero_copy_only=False), dtype=bool)
        if not dict_keep.all():
            token_keep = dict_keep[codes]
            parent_kept = parent[token_keep]
            # compact the dictionary to surviving codes
            new_code = np.cumsum(dict_keep, dtype=np.int32) - 1
            codes = new_code[codes[token_keep]]
            dict_arr = dict_arr.filter(pa.array(dict_keep))
        else:
            parent_kept = parent
        dl = np.bincount(parent_kept, minlength=nkept_docs).astype(np.int64)
        vocab = dict_arr.to_pylist()

        if len(codes) == 0:
            return {"ids": ids, "keep": keep, "dl": dl,
                    "pair_doc": np.empty(0, np.int64),
                    "pair_code": np.empty(0, np.int64),
                    "pair_tf": np.empty(0, np.int64),
                    "pair_pos": np.empty(0, np.int32),
                    "dict_strings": []}
        if self.lowercase and self.stemmer is None:
            # no stemmer: post_normalize lowercasing applies to the
            # dictionary; entries may collide after lowering ("The" ->
            # "the"), so merge codes exactly like the stemming branch
            lowered = pc.utf8_lower(dict_arr).to_pylist()
            sdict: dict[str, int] = {}
            low_code = np.empty(len(vocab), dtype=np.int32)
            new_vocab: list[str] = []
            for i, s in enumerate(lowered):
                c = sdict.get(s)
                if c is None:
                    c = len(new_vocab)
                    sdict[s] = c
                    new_vocab.append(s)
                low_code[i] = c
            if len(new_vocab) != len(vocab):
                codes = low_code[codes]
            vocab = new_vocab
        if self.stemmer is not None:
            # stem the batch dictionary, then merge codes that map to
            # the same stem (their tfs combine in the unique() below);
            # lowercase applies post-stem (post_normalize order)
            stems = self.stemmer.stem(vocab)
            if self.lowercase:
                stems = [s.lower() for s in stems]
            sdict = {}
            stem_code = np.empty(len(vocab), dtype=np.int32)
            new_vocab = []
            for i, s in enumerate(stems):
                c = sdict.get(s)
                if c is None:
                    c = len(new_vocab)
                    sdict[s] = c
                    new_vocab.append(s)
                stem_code[i] = c
            codes = stem_code[codes]
            vocab = new_vocab
        V = len(vocab)
        # (doc, term) aggregation key; uint32 when it fits (always at
        # the default batch size) — halves the bandwidth of the
        # np.unique sort, the hottest post-tokenize step
        if len(parent_kept) and (int(parent_kept[-1]) + 1) * V < (1 << 32):
            key = (parent_kept.astype(np.uint32) * np.uint32(V)
                   + codes.astype(np.uint32))
        else:
            key = parent_kept * np.int64(V) + codes
        pair_pos = None
        if want_positions:
            # positions in the processed (post-stopword, post-merge)
            # token stream: rank within the parent segment. A stable
            # sort on the (doc,term) key then groups each pair's
            # positions contiguously and ascending — one sort total
            # (replaces np.unique's internal one).
            npk = len(parent_kept)
            idx = np.arange(npk, dtype=np.int64)
            newdoc = np.ones(npk, dtype=bool)
            newdoc[1:] = parent_kept[1:] != parent_kept[:-1]
            seg_start = idx[newdoc]
            pos = (idx - seg_start[np.cumsum(newdoc) - 1]).astype(np.int32)
            order = np.argsort(key, kind="stable")
            sk = key[order]
            newpair = np.ones(npk, dtype=bool)
            newpair[1:] = sk[1:] != sk[:-1]
            uk = sk[newpair]
            bnd = np.flatnonzero(newpair)
            tf = np.diff(np.concatenate([bnd, [npk]]))
            pair_pos = pos[order]
        else:
            uk, tf = np.unique(key, return_counts=True)
        pair_doc, pair_code = np.divmod(uk.astype(np.int64, copy=False), V)
        return {
            "ids": ids,
            "keep": keep,
            "dl": dl,
            "pair_doc": pair_doc,
            "pair_code": pair_code,
            "pair_tf": tf.astype(np.int64),
            "pair_pos": pair_pos,
            "dict_strings": vocab,
        }


class TermVocab:
    """Segment-scope term id assignment: batch-local dictionary codes
    map to stable segment term ids with one dict op per batch-unique
    term (not per token)."""

    def __init__(self):
        self.ids: dict[str, int] = {}
        self.terms: list[str] = []

    def map_codes(self, dict_strings: list[str]) -> np.ndarray:
        out = np.empty(len(dict_strings), dtype=np.int64)
        ids = self.ids
        terms = self.terms
        for i, s in enumerate(dict_strings):
            g = ids.get(s)
            if g is None:
                g = len(terms)
                ids[s] = g
                terms.append(s)
            out[i] = g
        return out

    def sorted_order(self) -> tuple[list[str], np.ndarray]:
        """(terms sorted lexicographically, rank array: rank[gid] =
        position of that term in sorted order)."""
        order = sorted(range(len(self.terms)), key=self.terms.__getitem__)
        rank = np.empty(len(order), dtype=np.int32)
        rank[np.asarray(order, dtype=np.int64)] = np.arange(
            len(order), dtype=np.int32)
        return [self.terms[i] for i in order], rank


def flat_postings_sorted(
    vocab: TermVocab,
    term_id_parts: list[np.ndarray],
    ord_parts: list[np.ndarray],
    tf_parts: list[np.ndarray],
    pos_parts: list[np.ndarray] | None = None,
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Concatenate accumulated posting parts and sort term-major
    (lexicographic), ordinal-ascending within term.

    Returns (terms_sorted, term_offsets[T+1], ordinals, tfs, positions)
    — ``positions`` is None unless ``pos_parts`` is given, else the
    tf-aligned flat position stream re-gathered into the sorted pair
    order (pair j owns tfs[j] consecutive values).
    Stability: parts are appended in ordinal order and np.unique emits
    doc-major order inside a batch, so a stable sort on the term rank
    keeps each term's ordinals ascending.
    """
    terms_sorted, rank = vocab.sorted_order()
    if not term_id_parts:
        return terms_sorted, np.zeros(1, dtype=np.int64), \
            np.empty(0, np.int64), np.empty(0, np.int64), \
            (np.empty(0, np.int32) if pos_parts is not None else None)
    tid = np.concatenate(term_id_parts)
    ords = np.concatenate(ord_parts)
    tfs = np.concatenate(tf_parts)
    key = rank[tid]
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=len(terms_sorted))
    term_offsets = np.zeros(len(terms_sorted) + 1, dtype=np.int64)
    np.cumsum(counts, out=term_offsets[1:])
    pos_sorted = None
    if pos_parts is not None:
        pos_cat = (np.concatenate(pos_parts) if pos_parts
                   else np.empty(0, np.int32))
        # gather each pair's variable-length position slice into the
        # sorted order: flat index = repeat(slice starts) + within-rank
        tfs64 = tfs.astype(np.int64, copy=False)
        pre_off = np.concatenate([[0], np.cumsum(tfs64)])
        widths = tfs64[order]
        starts = pre_off[:-1][order]
        total = int(widths.sum())
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(widths)[:-1]]),
                              widths))
        pos_sorted = pos_cat[np.repeat(starts, widths) + within]
    return terms_sorted, term_offsets, ords[order], tfs[order], pos_sorted
