from .engine import DEFAULT_K, IndexSearcher, SegmentScorer, lookup_global_stats, process_query
from .scorer import BM25Scorer, CorpusStats, QLDScorer, bm25_idf, make_scorer

__all__ = [
    "DEFAULT_K", "IndexSearcher", "SegmentScorer", "lookup_global_stats",
    "process_query", "BM25Scorer", "CorpusStats", "QLDScorer", "bm25_idf",
    "make_scorer",
]
