"""Run-file I/O and retrieval evaluation.

Mirrors the reference's results + scoring surface
(/root/reference/patapsco/results.py, score.py) on Arrow tables:
flat (query_id, doc_id, rank, score) result tables, TREC run files,
TREC qrels, and a self-contained trec_eval-compatible metric suite
(pytrec_eval is not available in this environment).
"""

from .trec import (
    read_trec_run,
    results_to_trec_lines,
    write_trec_run,
    write_results_parquet,
    read_results_parquet,
)
from .qrels import read_qrels
from .metrics import evaluate, mean_scores, write_scores_file

__all__ = [
    "read_trec_run",
    "results_to_trec_lines",
    "write_trec_run",
    "write_results_parquet",
    "read_results_parquet",
    "read_qrels",
    "evaluate",
    "mean_scores",
    "write_scores_file",
]
