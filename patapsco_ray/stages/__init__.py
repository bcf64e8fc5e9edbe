"""Pipeline stages: document processing, doc store, reranking.

The reference's stage-1/stage-2 Task chain (pipeline.py:162-207)
re-expressed as Ray Data transforms.
"""

from .process import DocumentProcessor, process_documents
from .docstore import DocStore, write_doc_store
from .rerank import MockReranker, ShellReranker, rerank_results

__all__ = [
    "DocumentProcessor",
    "process_documents",
    "DocStore",
    "write_doc_store",
    "MockReranker",
    "ShellReranker",
    "rerank_results",
]
