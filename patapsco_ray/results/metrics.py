"""trec_eval-compatible retrieval metrics, self-contained.

The reference scores runs with pytrec_eval (score.py:61-172); that
package is unavailable here, so the measures are reimplemented with
trec_eval's exact conventions:

- ranking for evaluation re-sorts the run by (score DESC, doc_id DESC
  lexicographically) — trec_eval's classic tie-break, independent of
  the ranks stored in the run file
- ``map``: average precision over relevant (rel > 0) retrieved docs /
  total relevant in qrels
- ``ndcg`` (and ``ndcg_cut_k``): linear gain rel_i / log2(i + 1),
  ideal from qrels sorted by relevance descending
- ``ndcg_prime`` (ndcg'): per reference score.py:140-161 — drop
  unjudged docs from the run, compute ndcg on the remainder; a query
  with no judged retrieved docs falls back to its plain ndcg
- ``recall_k``, ``P_k``, ``recip_rank``, ``success_k``
- run topics not in qrels are dropped; qrels topics missing from the
  run score 0 via an empty result list (score.py:112-121)
- metric names accept ``@`` or ``_`` (P@10 == P_10) and ``ndcg'``
  (score.py:75-79)

Inputs are plain dicts (qrels) plus a flat Arrow results table; query
counts are small so this is driver-side math (as in the reference).
"""

from __future__ import annotations

import math
import pathlib




def _run_from_table(results: "pa.Table") -> dict[str, dict[str, float]]:
    run: dict[str, dict[str, float]] = {}
    qids = results.column("query_id").to_pylist()
    docs = results.column("doc_id").to_pylist()
    scores = results.column("score").to_pylist()
    for q, d, s in zip(qids, docs, scores):
        run.setdefault(str(q), {})[str(d)] = float(s)
    return run


def _rank_docs(docs_scores: dict[str, float]) -> list[str]:
    # sort by score descending; ties by doc_id descending (trec_eval)
    return sorted(docs_scores, key=lambda d: (-docs_scores[d], _neg_str(d)))


class _neg_str(str):
    """Inverts lexicographic comparison for descending doc_id ties."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)


def _ap(ranked: list[str], rels: dict[str, int]) -> float:
    nrel = sum(1 for r in rels.values() if r > 0)
    if nrel == 0:
        return 0.0
    hits = 0
    total = 0.0
    for i, d in enumerate(ranked, start=1):
        if rels.get(d, 0) > 0:
            hits += 1
            total += hits / i
    return total / nrel


def _dcg(gains: list[int]) -> float:
    return sum(g / math.log2(i + 1) for i, g in enumerate(gains, start=1))


def _ndcg(ranked: list[str], rels: dict[str, int], k: int | None = None) -> float:
    gains = [max(rels.get(d, 0), 0) for d in ranked]
    ideal = sorted((r for r in rels.values() if r > 0), reverse=True)
    if k is not None:
        gains = gains[:k]
        ideal = ideal[:k]
    idcg = _dcg(ideal)
    if idcg == 0:
        return 0.0
    return _dcg(gains) / idcg


def _recall(ranked: list[str], rels: dict[str, int], k: int) -> float:
    nrel = sum(1 for r in rels.values() if r > 0)
    if nrel == 0:
        return 0.0
    found = sum(1 for d in ranked[:k] if rels.get(d, 0) > 0)
    return found / nrel


def _precision(ranked: list[str], rels: dict[str, int], k: int) -> float:
    found = sum(1 for d in ranked[:k] if rels.get(d, 0) > 0)
    return found / k


def _recip_rank(ranked: list[str], rels: dict[str, int]) -> float:
    for i, d in enumerate(ranked, start=1):
        if rels.get(d, 0) > 0:
            return 1.0 / i
    return 0.0


def normalize_metric_name(name: str) -> str:
    name = name.replace("@", "_")
    return "ndcg_prime" if name == "ndcg'" else name


def evaluate(
    qrels: dict[str, dict[str, int]],
    results: "pa.Table | dict[str, dict[str, float]]",
    metrics: list[str],
) -> dict[str, dict[str, float]]:
    """Per-query scores: {query_id: {metric: value}}."""
    run = results if isinstance(results, dict) else _run_from_table(results)
    run = {q: ds for q, ds in run.items() if q in qrels}  # drop unjudged topics
    for q in qrels:
        run.setdefault(q, {})  # missing topics score 0
    names = [normalize_metric_name(m) for m in metrics]
    out: dict[str, dict[str, float]] = {}
    for q, docs_scores in run.items():
        rels = qrels[q]
        ranked = _rank_docs(docs_scores)
        row: dict[str, float] = {}
        for m in names:
            if m == "map":
                row[m] = _ap(ranked, rels)
            elif m == "ndcg":
                row[m] = _ndcg(ranked, rels)
            elif m.startswith("ndcg_cut_"):
                row[m] = _ndcg(ranked, rels, int(m.rsplit("_", 1)[1]))
            elif m == "ndcg_prime":
                judged = [d for d in ranked if d in rels]
                row[m] = _ndcg(judged, rels) if judged else _ndcg(ranked, rels)
            elif m.startswith("recall_"):
                row[m] = _recall(ranked, rels, int(m.rsplit("_", 1)[1]))
            elif m.startswith("P_"):
                row[m] = _precision(ranked, rels, int(m.rsplit("_", 1)[1]))
            elif m == "recip_rank":
                row[m] = _recip_rank(ranked, rels)
            elif m.startswith("success_"):
                k = int(m.rsplit("_", 1)[1])
                row[m] = 1.0 if any(
                    rels.get(d, 0) > 0 for d in ranked[:k]) else 0.0
            else:
                raise ValueError(f"unsupported metric: {m}")
        out[q] = row
    return out


def mean_scores(per_query: dict[str, dict[str, float]]) -> dict[str, float]:
    if not per_query:
        return {}
    metrics = next(iter(per_query.values())).keys()
    n = len(per_query)
    return {m: sum(row[m] for row in per_query.values()) / n for m in metrics}


def write_scores_file(
    per_query: dict[str, dict[str, float]], path: str | pathlib.Path
) -> None:
    """scores.txt format: per-query rows then 'all' aggregate rows
    (reference score.py:163-172)."""
    lines = []
    for q, row in sorted(per_query.items()):
        for measure, value in sorted(row.items()):
            lines.append("{:25s}\t{}\t{:.4f}".format(measure, q, value))
    means = mean_scores(per_query)
    for measure in sorted(means):
        lines.append("{:25s}\t{}\t{:.4f}".format(measure, "all", means[measure]))
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("\n".join(lines) + "\n")
