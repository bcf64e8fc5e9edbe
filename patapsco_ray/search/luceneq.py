"""Lucene-syntax query support: boosts, +/- flags, AND/OR, grouping.

Reference surface: ``query.parse: true`` runs the query through
Lucene's QueryParser + a luqum AST transformer
(/root/reference/patapsco/topics.py:362-414); the default config is
parse=False (schema.py:124), so plain bag-of-words is the primary
path. This module covers the parser's practical surface:

- ``term^2.5``  boost (weight multiplies the term's BM25 contribution,
  Lucene BoostQuery semantics)
- ``+term``     required (MUST)
- ``-term``     prohibited (MUST_NOT)
- ``a AND b``   both become required
- ``a OR b`` / plain juxtaposition — optional (SHOULD); Lucene's
  default operator is OR
- ``(a b)^2``, ``+(a b)``, ``-(a b)``, nesting — parenthesized
  sub-queries are BooleanQuery clauses: a group matches per the
  MUST/SHOULD/MUST_NOT rules over its children, its boost multiplies
  every inner contribution, and a document's score counts ONLY the
  clauses it matches (Lucene's per-clause gating — a term inside a
  non-matching group contributes nothing even when the document
  contains it)
- ``"quoted phrases"`` (with optional ``^boost``) are PhraseQuery
  clauses scored by exact-adjacency phrase frequency when the index
  carries positions (``positions=True`` + bm25); on a DOCS_AND_FREQS
  index — the reference's only shape (index.py:52) — a phrase query
  returns empty results, matching the reference's failure behavior
  (retrieve.py:148-151)

Each term is processed through the same text chain as documents
(LuceneTransformer runs text processing per term node,
topics.py:393-414).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass

import numpy as np

from ..text import TextProcessor


@dataclass(frozen=True)
class QueryTerm:
    term: str
    boost: float = 1.0
    required: bool = False
    prohibited: bool = False


@dataclass(frozen=True)
class QueryGroup:
    """A parenthesized BooleanQuery clause (children are QueryTerm /
    QueryPhrase / QueryGroup; MUST/SHOULD/MUST_NOT per child flags)."""

    children: tuple
    boost: float = 1.0
    required: bool = False
    prohibited: bool = False


@dataclass(frozen=True)
class QueryPhrase:
    """A quoted exact-adjacency phrase clause (Lucene PhraseQuery,
    slop 0). Scoreable only on an index built with ``positions=True``;
    on a DOCS_AND_FREQS index the whole query returns empty, matching
    the reference's failure behavior (retrieve.py:148-151)."""

    terms: tuple
    boost: float = 1.0
    required: bool = False
    prohibited: bool = False


_TOKEN_RE = re.compile(r'[+-]?"[^"]*"|\(|\)|[^\s()]+')
_GROUP_BOOST_RE = re.compile(r"\^\d+(?:\.\d+)?$")


def _set_required(node):
    if not node.prohibited:
        return dataclasses.replace(node, required=True)
    return node


def _parse_clauses(tokens: list[str], i: int, processor: TextProcessor,
                   depth: int) -> tuple[list, float, int]:
    """Parse one clause list until EOF (depth 0) or the matching ')'.
    Returns (children, group_boost, next_index)."""
    children: list = []
    pending = False  # False | True (AND) | "not" | "+" | "-"
    while i < len(tokens):
        tok = tokens[i]
        i += 1
        if tok.startswith('"') or (len(tok) > 1 and tok[0] in "+-"
                                   and tok[1] == '"'):
            sign = ""
            if tok[0] in "+-":
                sign, tok = tok[0], tok[1:]
            required = pending is True or pending == "+" or sign == "+"
            prohibited = pending in ("not", "-") or sign == "-"
            pending = False
            boost = 1.0
            if i < len(tokens) and _GROUP_BOOST_RE.fullmatch(tokens[i]):
                boost = float(tokens[i][1:])
                i += 1
            processed = processor.process(tok.strip('"'))
            words = tuple(processed.split()) if processed else ()
            if len(words) == 1:
                # a one-word phrase is just a term (Lucene collapses it)
                children.append(QueryTerm(words[0], boost,
                                          required, prohibited))
            elif words:
                children.append(QueryPhrase(words, boost,
                                            required, prohibited))
            continue
        if tok == ")":
            if depth == 0:
                continue  # stray close, ignore like Lucene's lenient mode
            boost = 1.0
            if i < len(tokens) and _GROUP_BOOST_RE.fullmatch(tokens[i]):
                boost = float(tokens[i][1:])
                i += 1
            return children, boost, i
        if tok == "AND":
            pending = True
            # retroactively require the previous clause (Lucene AND
            # binds both operands)
            if children:
                children[-1] = _set_required(children[-1])
            continue
        if tok == "OR":
            pending = False
            continue
        if tok == "NOT":
            pending = "not"
            continue
        required = pending is True or pending == "+"
        prohibited = pending in ("not", "-")
        pending = False
        if tok in ("+", "-"):  # unary prefix split off by '(' or space
            pending = tok
            continue
        if tok == "(":
            sub, gboost, i = _parse_clauses(tokens, i, processor, depth + 1)
            if sub:
                children.append(QueryGroup(tuple(sub), gboost,
                                           required, prohibited))
            continue
        if tok.startswith("+"):
            required, tok = True, tok[1:]
        elif tok.startswith("-"):
            prohibited, tok = True, tok[1:]
        if tok.startswith("contents:"):
            # the reference parses through Lucene's QueryParser with
            # field 'contents' and its generator emits
            # '+contents:term ...' strings (topics.py:392,407); accept
            # that form transparently
            tok = tok[len("contents:"):]
        boost = 1.0
        if "^" in tok:
            tok, _, b = tok.rpartition("^")
            try:
                boost = float(b)
            except ValueError:
                tok = f"{tok}^{b}"
        processed = processor.process(tok)
        if not processed:
            continue
        for t in processed.split():
            children.append(QueryTerm(t, boost, required, prohibited))
    return children, 1.0, i


def parse_lucene_query(text: str, processor: TextProcessor
                       ) -> "list[QueryTerm] | QueryGroup | None":
    """Parse a Lucene query. Returns a flat ``list[QueryTerm]`` when
    the query has no grouping or phrases (the historical contract),
    and a :class:`QueryGroup` tree when parentheses or quoted phrases
    appear. Whether a phrase is scoreable is the caller's decision
    (positional index + bm25 required; see :func:`search_lucene`)."""
    raw_tokens = _TOKEN_RE.findall(text)
    children, _, _ = _parse_clauses(raw_tokens, 0, processor, 0)
    if any(isinstance(c, (QueryGroup, QueryPhrase)) for c in children):
        return QueryGroup(tuple(children))
    return children


def _tree_terms(node) -> set[str]:
    if isinstance(node, QueryTerm):
        return {node.term}
    if isinstance(node, QueryPhrase):
        return set(node.terms)
    out: set[str] = set()
    for c in node.children:
        out |= _tree_terms(c)
    return out


def _tree_has_phrase(node) -> bool:
    if isinstance(node, QueryPhrase):
        return True
    if isinstance(node, QueryTerm):
        return False
    return any(_tree_has_phrase(c) for c in node.children)


def _eval_node(node, ss, rows, scorer, gstats
               ) -> tuple[np.ndarray, np.ndarray]:
    """Dense (match, score) for one AST node over a segment.

    Lucene BooleanQuery semantics: with MUST children a document
    matches iff it matches ALL of them (SHOULD optional); otherwise
    iff it matches >=1 SHOULD child; MUST_NOT children exclude.
    Scores sum the matching MUST+SHOULD children's scores — child
    scores are already zeroed outside the child's own match, and the
    group zeroes its sum outside the group match, which is exactly
    Lucene's per-clause gating. Group boost multiplies the sum."""
    from ..index.codec import decode_postings

    ndocs = ss.ndocs
    if isinstance(node, QueryTerm):
        match = np.zeros(ndocs, dtype=bool)
        score = np.zeros(ndocs, dtype=np.float64)
        row = rows.get(node.term)
        if row is not None and node.term in gstats:
            df, cf = gstats[node.term]
            stat = df if hasattr(scorer, "idf") else cf
            ords, tfs = decode_postings(
                row["postings"], row["block_offsets"], row["block_counts"])
            if ss.quantize_norms:
                contrib = scorer.score_postings(
                    tfs, ss.norms[ords], stat, node.boost)
            else:
                contrib = scorer.score_postings_dl(
                    tfs, ss.lens[ords], stat, node.boost)
            match[ords] = True
            if not node.prohibited:
                score[ords] = contrib
        return match, score

    if isinstance(node, QueryPhrase):
        # Lucene PhraseQuery: summed term idf, tf = exact phrase
        # frequency in the BM25 saturation (engine.score_phrase shape)
        match = np.zeros(ndocs, dtype=bool)
        score = np.zeros(ndocs, dtype=np.float64)
        if all(t in gstats and t in rows for t in node.terms):
            ords, tfv = ss.phrase_doc_tfs(list(node.terms), rows=rows)
            if ords.size:
                idf = float(sum(scorer.idf(gstats[t][0])
                                for t in node.terms))
                denom = (scorer.denom_for_norms(ss.norms[ords])
                         if ss.quantize_norms
                         else scorer.denom_for_dl(ss.lens[ords]))
                match[ords] = True
                if not node.prohibited:
                    score[ords] = node.boost * idf * tfv / (tfv + denom)
        return match, score

    must, should, must_not = [], [], []
    for c in node.children:
        (must_not if c.prohibited else must if c.required else should
         ).append(c)
    score = np.zeros(ndocs, dtype=np.float64)
    if must:
        match = np.ones(ndocs, dtype=bool)
        for c in must:
            m, s = _eval_node(c, ss, rows, scorer, gstats)
            match &= m
            score += s
        for c in should:
            _, s = _eval_node(c, ss, rows, scorer, gstats)
            score += s
    elif should:
        match = np.zeros(ndocs, dtype=bool)
        for c in should:
            m, s = _eval_node(c, ss, rows, scorer, gstats)
            match |= m
            score += s
    else:
        match = np.zeros(ndocs, dtype=bool)
    for c in must_not:
        m, _ = _eval_node(c, ss, rows, scorer, gstats)
        match &= ~m
    if node.boost != 1.0:
        score *= node.boost
    score[~match] = 0.0
    return match, score


def _search_tree(searcher, root: QueryGroup, k: int) -> list[dict]:
    """Per-segment dense evaluation of a grouped query tree."""
    from .engine import lookup_global_stats

    all_terms = sorted(_tree_terms(root))
    gstats = lookup_global_stats(searcher.index_dir, all_terms)
    present = [t for t in all_terms if t in gstats]

    def seg_fn(ss):
        rows = ss.term_rows(present) if present else {}
        match, score = _eval_node(root, ss, rows, searcher.scorer, gstats)
        cand = np.flatnonzero(match)
        if cand.size == 0:
            return cand.astype(np.int64), np.empty(0, dtype=np.float64)
        # route through _select_topk — the choke point that drops
        # tombstoned docs — so grouped/phrase Lucene queries honor
        # deletes like every other scoring path
        return ss._select_topk(cand, score[cand], k)

    return searcher._merge_segments(seg_fn, k)


def search_lucene(searcher, query_text: str, k: int | None = None
                  ) -> list[dict]:
    """Boolean/boost search over an IndexSearcher. Scoring is the sum
    of boost x per-term BM25/QLD over SHOULD+MUST terms; MUST terms
    filter to docs containing all of them; MUST_NOT excludes. Grouped
    queries evaluate the full BooleanQuery tree (see _eval_node).
    Quoted phrases score as Lucene PhraseQuery clauses when the index
    was built with ``positions=True`` and the scorer is bm25; on a
    DOCS_AND_FREQS index the query returns empty — the reference's
    behavior on its position-free Lucene index (retrieve.py:148-151,
    index.py:52)."""
    from .engine import DEFAULT_K, lookup_global_stats

    k = k or DEFAULT_K
    parsed = parse_lucene_query(query_text, searcher.processor)
    if not parsed:  # empty -> empty results
        return []
    if isinstance(parsed, QueryGroup):
        if _tree_has_phrase(parsed) and not (
                searcher.manifest.get("positions")
                and hasattr(searcher.scorer, "idf")):
            if searcher.manifest.get("positions"):
                # the index CAN answer phrases — a silent [] here would
                # mask a scorer misconfiguration; only the reference-
                # parity DOCS_AND_FREQS case returns empty
                raise ValueError(
                    "phrase clauses require a bm25 scorer; this index "
                    "was built with positions=True but the scorer is "
                    f"{type(searcher.scorer).__name__}")
            return []
        return _search_tree(searcher, parsed, k)
    scoring = [qt for qt in parsed if not qt.prohibited]
    required = [qt.term for qt in parsed if qt.required]
    prohibited = [qt.term for qt in parsed if qt.prohibited]
    all_terms = sorted({qt.term for qt in parsed})
    gstats = lookup_global_stats(searcher.index_dir, all_terms)
    if required and any(t not in gstats for t in required):
        return []  # a MUST term absent from the corpus matches nothing
    weights: dict[str, float] = {}
    for qt in scoring:
        weights[qt.term] = weights.get(qt.term, 0.0) + qt.boost

    def seg_fn(ss):
        from ..index.codec import decode_postings
        from ..index.segment import read_terms

        present = [t for t in all_terms if t in gstats]
        if not present:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        tbl = read_terms(searcher.index_dir, ss.seg_id, terms=present)
        rows = {r["term"]: r for r in tbl.to_pylist()}
        ords_sc, scores_sc = ss.score(weights, searcher.scorer, gstats,
                                      ss.ndocs, preloaded_rows=rows)
        if ords_sc.size == 0:
            return ords_sc, scores_sc
        keep = np.ones(ords_sc.size, dtype=bool)
        if required or prohibited:
            dense = np.zeros(ss.ndocs, dtype=np.int32)
            for t in required:
                row = rows.get(t)
                if row is None:
                    return (np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.float64))
                o, _ = decode_postings(row["postings"], row["block_offsets"],
                                       row["block_counts"])
                dense[o] += 1
            keep &= dense[ords_sc] == len(required)
            if prohibited:
                bad = np.zeros(ss.ndocs, dtype=bool)
                for t in prohibited:
                    row = rows.get(t)
                    if row is not None:
                        o, _ = decode_postings(
                            row["postings"], row["block_offsets"],
                            row["block_counts"])
                        bad[o] = True
                keep &= ~bad[ords_sc]
        ords_sc, scores_sc = ords_sc[keep], scores_sc[keep]
        if ords_sc.size > k:
            order = np.lexsort((ords_sc, -scores_sc))[:k]
            ords_sc, scores_sc = ords_sc[order], scores_sc[order]
        return ords_sc, scores_sc

    return searcher._merge_segments(seg_fn, k)
