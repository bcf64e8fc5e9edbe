"""Large-scale training-data operations over document / embedding tables.

These extend the reference's operator surface (hltcoe/patapsco has no
dedup / similarity / quality ops — SURVEY.md §2.5 notes "Dedup: none")
with the stages a 100 TB web-corpus pipeline needs, each expressed as a
Ray Data transform:

- :mod:`textstats` — token counting, quality signals, language id,
  document fingerprints (vectorized pyarrow.compute over Arrow batches)
- :mod:`dedup` — exact (hash groupby), n-gram Jaccard (shingle
  inverted index), MinHash+LSH, SimHash near-duplicate detection
- :mod:`decontam` — benchmark decontamination: n-gram overlap against
  a broadcast probe (test-set) n-gram index, shuffle-free
- :mod:`spans` — duplicate n-gram SPAN detection/removal inside
  otherwise-distinct documents (Lee et al. ACL 2022 substring dedup,
  window-hash formulation)
- :mod:`similarity` — brute-force cosine top-k against a broadcast
  query matrix, exact all-pairs near-dup, LSH-bucketed ANN scale path
- :mod:`multimodal` — actor-pool decode/feature stages over opaque
  binary columns (real stdlib PNG/WAV/container decoders; formats
  needing external codec libraries raise with a clear message)
"""

from .textstats import (token_counts, quality_signals, quality_filter,
                        language_id, fingerprints, winnow_fingerprints,
                        repetition_signals, unigram_corpus_stats,
                        unigram_logprob)
from .pii import pii_counts, redact_pii
from .chunking import chunk_documents, pack_sequences
from .sampling import sample_by_hash, shuffle_by_hash, stratified_sample
from .budget import (select_by_token_budget, importance_sample,
                     importance_sample_sql)
from .urls import (canonicalize_url, canonicalize_urls, url_duplicates,
                   extract_hosts, host_stats)
from .dedup import (
    exact_duplicates,
    exact_duplicate_pairs,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .cluster import connected_components, dedup_keep, near_dedup
from .decontam import decontaminate, ngram_contamination
from .spans import duplicate_spans, remove_duplicate_spans
from .quantiles import exact_quantiles, value_histogram
from .vocab import top_ngrams, tfidf_topk_terms, vocab_stats
from .similarity import (cosine_topk, cosine_neardup_pairs,
                         lsh_cosine_topk, ivf_cosine_topk,
                         train_ivf_centroids, kmeans_refine,
                         kmeans_parallel_init, ivf_assign_counts)
from .windows import sessionize, sliding_window_agg, topk_by_key, tumbling_window_agg

__all__ = [
    "token_counts",
    "quality_signals",
    "quality_filter",
    "canonicalize_url",
    "canonicalize_urls",
    "url_duplicates",
    "extract_hosts",
    "host_stats",
    "language_id",
    "fingerprints",
    "winnow_fingerprints",
    "repetition_signals",
    "pii_counts",
    "redact_pii",
    "chunk_documents",
    "pack_sequences",
    "sample_by_hash",
    "shuffle_by_hash",
    "stratified_sample",
    "select_by_token_budget",
    "importance_sample",
    "importance_sample_sql",
    "unigram_corpus_stats",
    "unigram_logprob",
    "exact_duplicates",
    "exact_duplicate_pairs",
    "ngram_contamination",
    "decontaminate",
    "duplicate_spans",
    "remove_duplicate_spans",
    "exact_quantiles",
    "value_histogram",
    "top_ngrams",
    "tfidf_topk_terms",
    "vocab_stats",
    "connected_components",
    "dedup_keep",
    "near_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_topk",
    "kmeans_refine",
    "kmeans_parallel_init",
    "ivf_assign_counts",
    "cosine_neardup_pairs",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "train_ivf_centroids",
    "sessionize",
    "sliding_window_agg",
    "topk_by_key",
    "tumbling_window_agg",
]
