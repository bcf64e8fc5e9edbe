"""Interactive query surfaces: HTTP service + one-shot query CLI.

Parity targets:
- reference ``patapsco/bin/web.py:21-58`` — a flask app exposing
  ``/doc/<id>`` (JSON doc from the database, 404 when absent) and
  ``/query/<query>`` (processed query -> retriever results as JSON).
  Flask is not available in this environment, so the service is built
  on the stdlib ``http.server`` with identical routes, JSON bodies and
  the permissive CORS header flask_cors added.
- reference ``patapsco/bin/query.py`` — query an index once from the
  command line, printing ``doc_id\\tscore`` lines ("No results" when
  empty). Exposed as ``python -m patapsco_ray`` ``query``/``web``
  subcommands (see __main__.py).

These read a built index (and optionally a doc store) directly; no Ray
session is required — searching is a driver-side operation over the
segment files, matching the reference's single-process web service.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .search import IndexSearcher
from .stages.docstore import DocStore


def make_handler(searcher: IndexSearcher, store: DocStore | None,
                 k: int = 1000):
    """Build the request-handler class bound to one searcher/store.

    Searches are serialized with a lock: ThreadingHTTPServer handles
    each request on its own thread, but the shared IndexSearcher's
    SegmentScorer caches (lazily-opened pyarrow ParquetFile handles,
    norm/doc-id arrays) are not thread-safe. The reference web service
    is effectively single-process, so a lock preserves its semantics
    while keeping slow clients from wedging the accept loop."""

    search_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode("utf8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            # flask_cors.CORS default: allow any origin
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            path = urllib.parse.unquote(self.path)
            if path.startswith("/doc/"):
                doc_id = path[len("/doc/"):]
                if store is None:
                    self._send(503, {"error": "no document store attached"})
                    return
                with search_lock:
                    doc = store.get(doc_id)
                if doc is None:
                    self._send(404, {"error": f"unknown doc {doc_id}"})
                    return
                self._send(200, doc)
            elif path.startswith("/query/"):
                text = path[len("/query/"):]
                with search_lock:
                    hits = searcher.search(text, k=k)
                self._send(200, [
                    {"doc_id": h["doc_id"], "rank": h["rank"],
                     "score": h["score"]} for h in hits
                ])
            else:
                self._send(404, {"error": "routes: /doc/<id>, "
                                          "/query/<query>"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(index_dir: str, *, store_dir: str | None = None,
          host: str = "0.0.0.0", port: int = 8080,
          scorer: str = "bm25", k: int = 1000,
          k1: float = 0.9, b: float = 0.4, mu: float = 1000.0
          ) -> ThreadingHTTPServer:
    """Create (and return) the HTTP server; call ``serve_forever()`` on
    the result to block. Returned unstarted so tests and embedders can
    run it on a thread and shut it down."""
    searcher = IndexSearcher(index_dir, scorer=scorer, k1=k1, b=b, mu=mu)
    store = DocStore(store_dir) if store_dir else None
    return ThreadingHTTPServer((host, port),
                               make_handler(searcher, store, k=k))


def query_once(
    index_dir: str,
    query_text: str,
    *,
    scorer: str = "bm25",
    k1: float = 0.9,
    b: float = 0.4,
    mu: float = 1000.0,
    count: int | None = None,
    parse_bool: bool = False,
    psq_path: str | None = None,
    rm3: bool = False,
    store_dir: str | None = None,
    fb_terms: int = 10,
    fb_docs: int = 10,
    original_query_weight: float = 0.5,
    stem: str | bool = False,
    stopwords: str | bool = False,
    query_lang: str = "eng",
) -> list[dict]:
    """One-shot query (reference bin/query.py semantics): returns the
    hit dicts; the CLI prints doc_id\\tscore per hit."""
    from .text import TextConfig

    del query_lang  # query language == index language, as the manifest
    # records it; kept in the signature for bin/query.py CLI parity
    cfg = TextConfig(tokenize="whitespace", stopwords=stopwords, stem=stem)
    searcher = IndexSearcher(index_dir, scorer=scorer, k1=k1, b=b, mu=mu,
                             text_config=cfg)
    k = count or 1000
    if psq_path:
        from .search.psq import PSQGenerator

        clauses = PSQGenerator(searcher.processor, psq_path).generate(
            query_text)
        return searcher.search_psq(clauses, k=k)
    if rm3:
        if not store_dir:
            raise ValueError("--rm3 requires --store (document store)")
        from .search.rm3 import search_rm3

        return search_rm3(searcher, DocStore(store_dir), query_text, k=k,
                          fb_terms=fb_terms, fb_docs=fb_docs,
                          original_query_weight=original_query_weight)
    if parse_bool:
        from .search.luceneq import search_lucene

        return search_lucene(searcher, query_text, k=k)
    return searcher.search(query_text, k=k)
