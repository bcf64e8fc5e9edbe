"""CLI entry points.

- ``python -m patapsco_ray <config.yml|config.json>`` — mirrors the
  reference's ``patapsco config.yml`` command
  (/root/reference/patapsco/bin/main.py:8-25) including ``--set
  key=value`` config overrides (config.py:409-441).
- ``python -m patapsco_ray query -i INDEX -q TEXT [...]`` — one-shot
  query (reference patapsco/bin/query.py).
- ``python -m patapsco_ray web -i INDEX --port P [--store DIR]`` —
  HTTP query/doc service (reference patapsco/bin/web.py:21-58).
- ``python -m patapsco_ray build -i PARQUET -o IDX [...]`` — direct
  index build (aligned or shuffle strategy).
- ``python -m patapsco_ray compact -i IDX -o OUT [--target-docs N]``
  — merge small segments into larger ones (purges tombstones unless
  ``--keep-deletes``).
- ``python -m patapsco_ray delete -i IDX id1 id2 ...`` — tombstone
  documents (Lucene-style: filtered at search, purged at compaction).
"""

from __future__ import annotations

import argparse
import json
import sys


def _apply_override(cfg: dict, expr: str) -> None:
    key, _, value = expr.partition("=")
    node = cfg
    parts = key.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    try:
        node[parts[-1]] = json.loads(value)
    except json.JSONDecodeError:
        node[parts[-1]] = value


def _query_main(argv: list[str]) -> int:
    """Reference patapsco/bin/query.py surface (no Ray session)."""
    ap = argparse.ArgumentParser(prog="patapsco_ray query",
                                 description="Query an index once")
    ap.add_argument("-i", "--index", required=True)
    ap.add_argument("-q", "--query", required=True)
    ap.add_argument("--query_lang", default="eng")
    ap.add_argument("--stem", default=False)
    ap.add_argument("--stopwords", default=False)
    ap.add_argument("-c", "--count", type=int, default=None)
    g = ap.add_mutually_exclusive_group()
    g.add_argument("--bool", action="store_true", dest="parse_bool")
    g.add_argument("--psq", default=None, help="PSQ json table path")
    ap.add_argument("--k1", type=float, default=0.9)
    ap.add_argument("--b", type=float, default=0.4)
    ap.add_argument("--qld", action="store_true")
    ap.add_argument("--mu", type=float, default=1000.0)
    ap.add_argument("--rm3", action="store_true")
    ap.add_argument("--store", default=None, help="doc store dir (rm3)")
    ap.add_argument("--fb_terms", type=int, default=10)
    ap.add_argument("--fb_docs", type=int, default=10)
    ap.add_argument("--original_query_weight", type=float, default=0.5)
    a = ap.parse_args(argv)

    from .web import query_once

    hits = query_once(
        a.index, a.query, scorer="qld" if a.qld else "bm25",
        k1=a.k1, b=a.b, mu=a.mu, count=a.count, parse_bool=a.parse_bool,
        psq_path=a.psq, rm3=a.rm3, store_dir=a.store,
        fb_terms=a.fb_terms, fb_docs=a.fb_docs,
        original_query_weight=a.original_query_weight,
        stem=a.stem, stopwords=a.stopwords, query_lang=a.query_lang,
    )
    if not hits:
        print("No results")  # reference bin/query.py:69
        return 0
    for i, h in enumerate(hits):
        if a.count is not None and i == a.count:
            break
        print(f"{h['doc_id']}\t{h['score']}")
    return 0


def _web_main(argv: list[str]) -> int:
    """Reference patapsco/bin/web.py surface (no Ray session)."""
    ap = argparse.ArgumentParser(prog="patapsco_ray web",
                                 description="HTTP query/doc service")
    ap.add_argument("-i", "--index", required=True)
    ap.add_argument("--port", required=True, type=int)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--store", default=None, help="doc store dir")
    ap.add_argument("--k", type=int, default=1000)
    a = ap.parse_args(argv)

    from .web import serve

    srv = serve(a.index, store_dir=a.store, host=a.host, port=a.port,
                k=a.k)
    print(f"serving on {a.host}:{a.port} (routes: /doc/<id>, "
          f"/query/<query>)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def _build_main(argv: list[str]) -> int:
    """Direct index build over parquet inputs (the library call
    ``index.build_index`` from the shell)."""
    ap = argparse.ArgumentParser(prog="patapsco_ray build",
                                 description="Build an inverted index")
    ap.add_argument("-i", "--input", required=True,
                    help="parquet file/dir (repeatable)", action="append")
    ap.add_argument("-o", "--output", required=True, help="index dir")
    ap.add_argument("--id-column", default="url")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--html-column", default="html")
    ap.add_argument("--stem", default=False)
    ap.add_argument("--stopwords", default=False)
    ap.add_argument("--rows-per-segment", type=int, default=250_000)
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--strategy", choices=("aligned", "shuffle"),
                    default="aligned")
    a = ap.parse_args(argv)

    import ray

    started = not ray.is_initialized()
    if started:
        ray.init(address="local", include_dashboard=False)
    try:
        from .text import TextConfig

        cfg = TextConfig(stem=a.stem, stopwords=a.stopwords)
        inputs = a.input if len(a.input) > 1 else a.input[0]
        if a.strategy == "shuffle":
            from .index.build_shuffle import build_index_shuffle

            m = build_index_shuffle(
                inputs, a.output, text_config=cfg,
                id_column=a.id_column, text_column=a.text_column,
                html_column=a.html_column or None,
                concurrency=a.concurrency)
        else:
            from .index import build_index

            m = build_index(
                inputs, a.output, text_config=cfg,
                id_column=a.id_column, text_column=a.text_column,
                html_column=a.html_column or None,
                rows_per_segment=a.rows_per_segment,
                concurrency=a.concurrency, resume=a.resume)
        print(json.dumps({"ndocs": m["ndocs"],
                          "segments": len(m["segments"])}))
        return 0
    finally:
        if started:
            ray.shutdown()


def _norm_main(argv: list[str]) -> int:
    """Normalize a text file to stdout (reference
    patapsco/bin/normalize.py: pre_normalize, lowercase off)."""
    ap = argparse.ArgumentParser(
        prog="patapsco_ray norm",
        description="Normalize a text file. Output to stdout.")
    ap.add_argument("-l", "--lang", required=True,
                    help="ISO 639-3 language code")
    ap.add_argument("file", help="Path to text file to normalize")
    a = ap.parse_args(argv)
    import pathlib

    from .text.normalize import Normalizer

    # all reference language subclasses share Generic behavior
    # (normalize.py:264-302); the lang flag is accepted for CLI parity
    _ = a.lang
    text = pathlib.Path(a.file).read_text()
    print(Normalizer(lowercase=False).pre_normalize(text))
    return 0


def _delete_main(argv: list[str]) -> int:
    """Tombstone documents (``index.deletes.delete_documents``)."""
    ap = argparse.ArgumentParser(
        prog="patapsco_ray delete",
        description="Tombstone doc ids (filtered at search; purged by "
                    "the next compact)")
    ap.add_argument("-i", "--index", required=True)
    ap.add_argument("ids", nargs="*", help="doc ids; or use --from-file")
    ap.add_argument("--from-file", default=None,
                    help="newline-delimited doc-id file")
    a = ap.parse_args(argv)
    ids = list(a.ids)
    if a.from_file:
        with open(a.from_file) as f:
            ids.extend(line.strip() for line in f if line.strip())
    if not ids:
        print("no doc ids given", file=sys.stderr)
        return 2
    from .index.deletes import delete_documents

    total = delete_documents(a.index, ids)
    print(json.dumps({"deleted_total": total}))
    return 0


def _compact_main(argv: list[str]) -> int:
    """Segment compaction (``index.compact.compact_index``)."""
    ap = argparse.ArgumentParser(prog="patapsco_ray compact",
                                 description="Merge small index segments")
    ap.add_argument("-i", "--index", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--target-docs", type=int, default=1_000_000)
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--keep-deletes", action="store_true",
                    help="carry tombstones over instead of purging")
    a = ap.parse_args(argv)

    import ray

    started = not ray.is_initialized()
    if started:
        ray.init(address="local", include_dashboard=False)
    try:
        from .index.compact import compact_index

        m = compact_index(a.index, a.output,
                          target_docs_per_segment=a.target_docs,
                          concurrency=a.concurrency,
                          purge_deletes=not a.keep_deletes)
        print(json.dumps({"ndocs": m["ndocs"],
                          "segments": len(m["segments"])}))
        return 0
    finally:
        if started:
            ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "query":
        return _query_main(argv[1:])
    if argv and argv[0] == "web":
        return _web_main(argv[1:])
    if argv and argv[0] == "build":
        return _build_main(argv[1:])
    if argv and argv[0] == "compact":
        return _compact_main(argv[1:])
    if argv and argv[0] == "delete":
        return _delete_main(argv[1:])
    if argv and argv[0] == "norm":
        return _norm_main(argv[1:])
    ap = argparse.ArgumentParser(
        prog="patapsco_ray",
        description="Run a config-driven index+retrieve pipeline",
    )
    ap.add_argument("config", help="YAML or JSON config file")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="override a config value (repeatable)")
    args = ap.parse_args(argv)

    import ray

    started = not ray.is_initialized()
    if started:
        ray.init(address="local", include_dashboard=False)
    try:
        from .pipelines.runner import Runner, _load_config

        cfg = _load_config(args.config)
        for expr in getattr(args, "set"):
            _apply_override(cfg, expr)
        out = Runner(cfg).run()
        print(json.dumps({k: v for k, v in out.items() if k != "manifest"},
                         indent=1))
        return 0
    finally:
        if started:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
