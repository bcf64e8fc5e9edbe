"""Query-time scoring functions, Lucene-faithful.

The reference scores through pyserini/Lucene (reference
retrieve.py:86-115; defaults k1=0.9 b=0.4, mu=1000, schema.py:168-172).
Formulas follow Lucene 8 (the version under pyserini 0.13):

BM25 (BM25Similarity, no (k1+1) numerator factor since Lucene 8):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = tf / (tf + k1 * (1 - b + b * dl_q / avgdl))
    score   = sum over query terms of qtf * idf * w
where dl_q is the byte4-QUANTIZED doc length (see index/norms.py) and
avgdl = total_tf / N uses exact totals.

QLD (LMDirichletSimilarity):
    score(t, d) = max(0, log(1 + tf / (mu * cf/total_tf))
                         + log(mu / (dl_q + mu)))
summed over matching query terms with query-term multiplicity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..index.norms import DECODE_TABLE


@dataclass(frozen=True)
class CorpusStats:
    ndocs: int
    total_tf: int

    @property
    def avgdl(self) -> float:
        return self.total_tf / self.ndocs if self.ndocs else 0.0


def bm25_idf(df: int, ndocs: int) -> float:
    return math.log(1.0 + (ndocs - df + 0.5) / (df + 0.5))


class BM25Scorer:
    def __init__(self, stats: CorpusStats, k1: float = 0.9, b: float = 0.4):
        self.stats = stats
        self.k1 = k1
        self.b = b
        # per-norm-byte denominator component: k1 * (1 - b + b*dl/avgdl),
        # precomputed over the 256 possible norm bytes like Lucene's cache
        avgdl = stats.avgdl if stats.avgdl > 0 else 1.0
        self.norm_cache = k1 * ((1.0 - b) + b * DECODE_TABLE / avgdl)

    def idf(self, df: int) -> float:
        return bm25_idf(df, self.stats.ndocs)

    def score_postings(
        self, tfs: np.ndarray, norm_bytes: np.ndarray, df: int, qtf: int = 1
    ) -> np.ndarray:
        """Vectorized per-posting scores for one query term."""
        tf = tfs.astype(np.float64)
        denom = tf + self.norm_cache[norm_bytes]
        return (qtf * self.idf(df)) * (tf / denom)

    def score_postings_dl(
        self, tfs: np.ndarray, dls: np.ndarray, df: int, qtf: int = 1
    ) -> np.ndarray:
        """Exact-doc-length variant (no byte4 quantization) — used as
        the SQL-expressible conformance oracle mode; quantized scores
        upper-bound these (quantization rounds dl down)."""
        avgdl = self.stats.avgdl if self.stats.avgdl > 0 else 1.0
        tf = tfs.astype(np.float64)
        denom = tf + self.k1 * ((1.0 - self.b) + self.b * dls / avgdl)
        return (qtf * self.idf(df)) * (tf / denom)

    def denom_for_norms(self, norm_bytes: np.ndarray) -> np.ndarray:
        """k1*(1-b+b*dl_q/avgdl) per posting from quantized norm bytes."""
        return self.norm_cache[norm_bytes]

    def denom_for_dl(self, dls: np.ndarray) -> np.ndarray:
        avgdl = self.stats.avgdl if self.stats.avgdl > 0 else 1.0
        return self.k1 * ((1.0 - self.b) + self.b * dls / avgdl)

    def max_block_score(self, max_tf: int, min_norm_byte: int, df: int,
                        qtf: int = 1) -> float:
        """Upper bound of this term's score within a block (block-max)."""
        denom = max_tf + self.norm_cache[min_norm_byte]
        return qtf * self.idf(df) * (max_tf / denom)

    def max_block_scores(self, max_tfs: np.ndarray, min_norm_bytes: np.ndarray,
                         df: int, qtf: int = 1) -> np.ndarray:
        """Vectorized per-block upper bounds. Uses the SAME numpy ops as
        :meth:`score_postings` so the bound holds in floating point: for
        the (max_tf, min_norm) posting the two computations are
        bit-identical, and tf/(tf+c) is monotone through correctly
        rounded +, /, * — a true score can never exceed its block's
        bound by rounding alone."""
        tf = max_tfs.astype(np.float64)
        denom = tf + self.norm_cache[min_norm_bytes]
        return (qtf * self.idf(df)) * (tf / denom)


class QLDScorer:
    def __init__(self, stats: CorpusStats, mu: float = 1000.0):
        self.stats = stats
        self.mu = mu
        self.doclen_cache = np.log(mu / (DECODE_TABLE + mu))

    def score_postings(
        self, tfs: np.ndarray, norm_bytes: np.ndarray, cf: int, qtf: int = 1
    ) -> np.ndarray:
        p_w = cf / self.stats.total_tf
        s = np.log1p(tfs.astype(np.float64) / (self.mu * p_w))
        s += self.doclen_cache[norm_bytes]
        return qtf * np.maximum(s, 0.0)

    def score_postings_dl(
        self, tfs: np.ndarray, dls: np.ndarray, cf: int, qtf: int = 1
    ) -> np.ndarray:
        p_w = cf / self.stats.total_tf
        s = np.log1p(tfs.astype(np.float64) / (self.mu * p_w))
        s += np.log(self.mu / (dls + self.mu))
        return qtf * np.maximum(s, 0.0)

    def max_block_score(self, max_tf: int, min_norm_byte: int, cf: int,
                        qtf: int = 1) -> float:
        p_w = cf / self.stats.total_tf
        s = math.log1p(max_tf / (self.mu * p_w)) + self.doclen_cache[min_norm_byte]
        return qtf * max(s, 0.0)

    def max_block_scores(self, max_tfs: np.ndarray, min_norm_bytes: np.ndarray,
                         cf: int, qtf: int = 1) -> np.ndarray:
        """Vectorized per-block upper bounds via the same ``np.log1p``
        as :meth:`score_postings` (NOT ``math.log1p``: the two can
        differ in the last ulp, which would make the bound unsound for
        the block's own (max_tf, min_norm) posting)."""
        p_w = cf / self.stats.total_tf
        s = np.log1p(max_tfs.astype(np.float64) / (self.mu * p_w))
        s += self.doclen_cache[min_norm_bytes]
        return qtf * np.maximum(s, 0.0)


def make_scorer(name: str, stats: CorpusStats, *, k1=0.9, b=0.4, mu=1000.0):
    if name == "bm25":
        return BM25Scorer(stats, k1=k1, b=b)
    if name == "qld":
        return QLDScorer(stats, mu=mu)
    raise ValueError(f"unknown scorer: {name}")
