from .engine import DEFAULT_K, IndexSearcher, SegmentScorer, explain, lookup_global_stats, process_query
from .scorer import BM25Scorer, CorpusStats, QLDScorer, bm25_idf, make_scorer
from .psq import PSQGenerator, normalize_psq_entry, parse_psq_query, parse_psq_table
from .rm3 import rm3_expand, search_rm3
from .distributed import search_dataset, search_dataset_by_segment
from .luceneq import parse_lucene_query, search_lucene

__all__ = [
    "DEFAULT_K", "IndexSearcher", "SegmentScorer", "explain", "lookup_global_stats",
    "process_query", "BM25Scorer", "CorpusStats", "QLDScorer", "bm25_idf",
    "make_scorer", "PSQGenerator", "normalize_psq_entry", "parse_psq_query",
    "parse_psq_table", "rm3_expand", "search_rm3", "search_dataset",
    "search_dataset_by_segment", "parse_lucene_query", "search_lucene",
]
