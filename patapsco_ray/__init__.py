"""patapsco_ray — a Ray-Data-native full-text indexing + retrieval engine.

A from-scratch rebuild of the query/data-processing capabilities of
hltcoe/patapsco (reference at /root/reference, cited by file:line in
docstrings) expressed as Ray Data pipelines:

- ``ray.data.read_parquet`` over Common-Crawl-style web-page tables
  ``(url, warc_ts, html, text, lang)``
- zero-copy Arrow ``map_batches`` stages for text extraction,
  normalization, tokenization, stemming and stopword removal
- inverted-index construction as either a shuffle-free per-partition
  segment build (Lucene-style) or an explicit ``groupby(term)`` shuffle
  with ordinal-range salting for head terms
- delta-gap + varint compressed posting lists with block-max metadata
- Lucene-faithful BM25 (k1=0.9, b=0.4 defaults) / QLD top-k scoring
- resumable builds with per-partition lineage manifests

Nothing here calls ``ray.init`` — callers own the Ray session.
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("PATAPSCO_RAY_NO_MALLOC_TUNE"):
    # raise glibc's mmap threshold once per process (driver AND every
    # Ray worker that deserializes our UDFs): large numpy buffers then
    # reuse warm arena pages instead of paying a fresh mmap fault-in
    # per batch/segment — measured 100x stalls under memory pressure
    # and 2x end-to-end index-build throughput (util.tune_malloc).
    # Set the env var above to opt out.
    from .util import tune_malloc as _tune_malloc

    _tune_malloc()
