"""Config-driven end-to-end runs (the reference's Runner / JobBuilder).

The reference builds a two-stage pipeline from a YAML/JSON config
(/root/reference/patapsco/run.py:14-41, job.py:612-670):

  stage 1: documents -> [database] -> index
  stage 2: topics -> queries -> retrieve -> [rerank] -> run file [-> score]

Here each stage is a Ray Data pipeline; artifacts land in a run
directory mirroring the reference's layout (helpers.py:99-114):

  <run path>/
    index/            inverted index (resumable, per-segment lineage)
    database/         doc store (when rerank or database requested)
    <results file>    TREC run
    scores.txt        metrics (when score.qrels given)
    timing.json

Resume: the index build resumes from segment lineage automatically;
stage 2 is skipped entirely when the run file already exists — the
reference's run-level .complete semantics (job.py:112-116).

Config keys (dict or JSON/YAML-loadable path) — close to the
reference's schema (schema.py) but flattened:

  run:       {name, path, results="results.txt"}
  documents: {input: {format: "parquet"|"jsonl"|"tsv"|"sgml",
              path, lang="eng", id_column/text_column/html_column}}
  text:      {tokenize="whitespace", stopwords="lucene", stem=False,
              lowercase=True}
  index:     {strategy: "aligned"|"shuffle", rows_per_segment}
  database:  {enabled: bool}
  topics:    {input: {format: "jsonl"|"tsv"|"sgml", path, lang,
              source="original"}, fields: "title"}
  queries:   optional explicit [[query_id, text], ...]
  retrieve:  {name: "bm25"|"qld", k1, b, mu, number=1000, rm3: bool,
              fb_terms, fb_docs, original_query_weight,
              psq: {path, threshold}}
  rerank:    {name: "mock"|"shell", script, extra_args}
  score:     {qrels, metrics: ["map", "ndcg", ...]}
"""

from __future__ import annotations

import json
import pathlib
import time

import pyarrow as pa

import ray.data

from ..index import build_index, build_index_shuffle
from ..results import evaluate, read_qrels, write_scores_file, write_trec_run
from ..search import IndexSearcher, PSQGenerator
from ..search.rm3 import search_rm3
from ..sources import (
    read_jsonl_documents,
    read_jsonl_topics,
    read_sgml_documents,
    read_sgml_topics,
    read_tsv_documents,
    read_tsv_topics,
    topics_to_queries,
)
from ..stages import (
    DocStore,
    MockReranker,
    ShellReranker,
    process_documents,
    rerank_results,
    write_doc_store,
)
from ..text import TextConfig


class ConfigError(ValueError):
    """Invalid or inconsistent run configuration — the reference's
    ConfigError (config.py:20-33 ``pydantic.Extra.forbid`` rejects
    unknown fields; job.py:929-962 cross-checks plan consistency)."""


# Allowed keys per config section (the reference's pydantic models with
# Extra.forbid, schema.py). ``comment`` is legal in every section
# (reference SectionConfig). A trailing "*" entry marks a free-form
# subtree (rerank extra_args).
_ALLOWED: dict[str, set] = {
    "": {"run", "documents", "text", "index", "database", "topics",
         "queries", "retrieve", "rerank", "score"},
    "run": {"name", "path", "results"},
    "documents": {"input"},
    "documents.input": {"format", "path", "lang", "id_column",
                        "text_column", "html_column"},
    "text": {"tokenize", "stopwords", "stem", "lowercase"},
    "index": {"strategy", "rows_per_segment"},
    "database": {"enabled"},
    "topics": {"input", "fields"},
    "topics.input": {"format", "path", "lang", "source", "qrels_lang",
                     "strip_non_digits"},
    "retrieve": {"name", "k1", "b", "mu", "number", "rm3", "fb_terms",
                 "fb_docs", "original_query_weight", "psq", "parse"},
    "retrieve.psq": {"path", "threshold"},
    "rerank": {"name", "script", "extra_args"},
    "rerank.extra_args": {"*"},
    "score": {"qrels", "metrics"},
}

_ENUMS = {
    "documents.input.format": {"parquet", "jsonl", "json", "tsv",
                               "msmarco", "sgml"},
    "topics.input.format": {"jsonl", "json", "tsv", "msmarco", "sgml"},
    "index.strategy": {"aligned", "shuffle"},
    "retrieve.name": {"bm25", "qld"},
    "rerank.name": {"mock", "shell"},
}


def _validate_config(cfg: dict) -> None:
    """Reject unknown keys (a typo'd ``stemm:`` must ERROR, not run the
    wrong pipeline) and out-of-range enum values; then check the plan's
    required fields. Registry-registered custom formats/rerankers are
    exempt from their enum check."""
    from .. import registry

    def walk(node: dict, path: str) -> None:
        allowed = _ALLOWED.get(path)
        if allowed is None or "*" in allowed:
            return
        for key, val in node.items():
            if key == "comment":  # legal everywhere (SectionConfig)
                continue
            if key not in allowed:
                where = f"section '{path}'" if path else "top level"
                raise ConfigError(
                    f"unknown config key '{key}' at {where} "
                    f"(allowed: {', '.join(sorted(allowed))})")
            sub = f"{path}.{key}" if path else key
            if isinstance(val, dict):
                walk(val, sub)
            elif sub in _ENUMS and val is not None:
                custom = None
                if sub == "documents.input.format":
                    custom = registry.resolve("documents", val)
                elif sub == "rerank.name":
                    custom = registry.resolve("rerank", val)
                if custom is None and val not in _ENUMS[sub]:
                    raise ConfigError(
                        f"invalid value {val!r} for '{sub}' "
                        f"(one of: {', '.join(sorted(_ENUMS[sub]))})")

    walk(cfg, "")
    if "documents" not in cfg or "path" not in cfg.get(
            "documents", {}).get("input", {}):
        raise ConfigError("config requires documents.input.path")
    if "topics" not in cfg and "queries" not in cfg:
        raise ConfigError("config requires a topics section or explicit "
                          "queries")
    if "topics" in cfg and "path" not in cfg["topics"].get("input", {}):
        raise ConfigError("topics section requires topics.input.path")
    ret = cfg.get("retrieve", {})
    if isinstance(ret.get("psq"), dict) and "path" not in ret["psq"]:
        raise ConfigError("retrieve.psq requires a path")
    rr = cfg.get("rerank")
    if rr and rr.get("name") == "shell" and not rr.get("script"):
        raise ConfigError("rerank.name=shell requires rerank.script")


def _load_config(config) -> dict:
    """Load + preprocess a config: YAML/JSON files, ``inherit:``
    section inheritance (reference config.py:444-490) and ``{a.b}``
    string interpolation (config.py:331-406)."""
    if isinstance(config, (str, pathlib.Path)):
        text = pathlib.Path(config).read_text()
        try:
            cfg = json.loads(text)
        except json.JSONDecodeError:
            import yaml

            cfg = yaml.safe_load(text)
    else:
        cfg = dict(config)
    cfg = _apply_inheritance(cfg)
    return _interpolate(cfg, cfg)


def _apply_inheritance(cfg, root=None):
    """``inherit: other.section`` merges that section's keys under the
    current one (explicit keys win) — reference config.py:444-490."""
    if root is None:
        root = cfg
    if isinstance(cfg, dict):
        out = {k: _apply_inheritance(v, root) for k, v in cfg.items()
               if k != "inherit"}
        if "inherit" in cfg:
            node = root
            for part in str(cfg["inherit"]).split("."):
                node = node[part]
            for k, v in node.items():
                out.setdefault(k, _apply_inheritance(v, root))
        return out
    if isinstance(cfg, list):
        return [_apply_inheritance(v, root) for v in cfg]
    return cfg


def _interpolate(node, root):
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        import re

        def repl(m):
            cur = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return str(cur)

        return re.sub(r"\{([A-Za-z0-9_.]+)\}", repl, node)
    return node


def _text_config(cfg: dict) -> TextConfig:
    t = cfg.get("text", {})
    return TextConfig(
        tokenize=t.get("tokenize", "whitespace"),
        stopwords=t.get("stopwords", "lucene"),
        stem=t.get("stem", False),
        lowercase=t.get("lowercase", True),
    )


def _read_documents(cfg: dict) -> ray.data.Dataset:
    from .. import registry

    d = cfg["documents"]["input"]
    fmt = d.get("format", "parquet")
    lang = d.get("lang", "eng")
    custom = registry.resolve("documents", fmt)
    if custom is not None:  # user-registered reader (registry.py)
        return custom(d["path"], lang)
    if fmt == "parquet":
        return ray.data.read_parquet(d["path"])
    if fmt in ("jsonl", "json"):
        return read_jsonl_documents(d["path"], lang)
    if fmt in ("tsv", "msmarco"):
        return read_tsv_documents(d["path"], lang)
    if fmt == "sgml":
        return read_sgml_documents(d["path"], lang)
    raise ValueError(f"unknown documents format {fmt}")


def _doc_columns(cfg: dict) -> dict:
    d = cfg["documents"]["input"]
    fmt = d.get("format", "parquet")
    if fmt == "parquet":
        return {
            "id_column": d.get("id_column", "url"),
            "text_column": d.get("text_column", "text"),
            "html_column": d.get("html_column", "html"),
        }
    return {"id_column": "doc_id", "text_column": "text",
            "html_column": None}


def _read_topics(cfg: dict) -> pa.Table:
    t = cfg["topics"]["input"]
    fmt = t.get("format", "jsonl")
    lang = t.get("lang", "eng")
    if fmt in ("jsonl", "json"):
        return read_jsonl_topics(t["path"], lang,
                                 t.get("source", "original"),
                                 t.get("qrels_lang"))
    if fmt in ("tsv", "msmarco"):
        return read_tsv_topics(t["path"], lang)
    if fmt == "sgml":
        return read_sgml_topics(t["path"], lang,
                                t.get("strip_non_digits", False))
    raise ValueError(f"unknown topics format {fmt}")


class Runner:
    """Library entry point (reference run.py:14-41): build from a
    config dict, ``run()`` executes both stages."""

    def __init__(self, config):
        self.config = _load_config(config)
        _validate_config(self.config)
        run = self.config.get("run", {})
        self.run_path = pathlib.Path(
            run.get("path") or f"runs/{run.get('name', 'run')}"
        )
        self.results_file = run.get("results", "results.txt")
        self.timing: dict[str, float] = {}

    def run(self) -> dict:
        self.run_path.mkdir(parents=True, exist_ok=True)
        results_path = self.run_path / self.results_file
        cfg = self.config
        tconf = _text_config(cfg)
        lang = cfg.get("documents", {}).get("input", {}).get("lang", "eng")
        cols = _doc_columns(cfg)

        # ---- stage 1: index (+ doc store) ----
        t0 = time.time()
        index_dir = self.run_path / "index"
        # plan cross-check (reference job.py:952-962): a resumed index
        # must have been built with THIS run's text processing — query
        # terms are processed with the current config, so a mismatch
        # would silently score garbage
        if (index_dir / "manifest.json").exists():
            from ..index import read_manifest

            prev = read_manifest(index_dir).get("text_config", {})
            cur = {"tokenize": tconf.tokenize, "stopwords": tconf.stopwords,
                   "stem": tconf.stem, "lowercase": tconf.lowercase}
            if prev and any(prev.get(f) != cur[f] for f in cur):
                raise ConfigError(
                    "text processing for documents and queries does not "
                    f"match: existing index at {index_dir} was built "
                    f"with {prev}, this run's text config is {cur}")
        builder = (
            build_index_shuffle
            if cfg.get("index", {}).get("strategy") == "shuffle"
            else build_index
        )
        kwargs = dict(text_config=tconf, lang=lang, **cols)
        rps = cfg.get("index", {}).get("rows_per_segment")
        if rps:
            key = ("rows_per_block" if builder is build_index_shuffle
                   else "rows_per_segment")
            kwargs[key] = rps
        src = cfg["documents"]["input"]
        if src.get("format", "parquet") == "parquet":
            manifest = builder(src["path"], index_dir, **kwargs)
        else:
            # non-parquet sources are staged through parquet first so
            # the index build gets splittable, resumable input
            staged = self.run_path / "staged_docs"
            if not (staged / ".complete").exists():
                _read_documents(cfg).write_parquet(str(staged))
                (staged / ".complete").touch()
            manifest = builder(str(staged), index_dir, **kwargs)
        self.timing["index"] = time.time() - t0

        need_store = "rerank" in cfg or cfg.get("database", {}).get("enabled")
        store_dir = self.run_path / "database"
        if need_store and not (store_dir / ".complete").exists():
            t0 = time.time()
            proc = process_documents(
                _read_documents(cfg), text_config=tconf, lang=lang,
                **{k: v for k, v in cols.items()},
            )
            write_doc_store(proc, store_dir)
            # source lineage for the same-source cross-check below
            (store_dir / ".config.json").write_text(json.dumps(
                {"documents": {"input": cfg["documents"]["input"]}}))
            (store_dir / ".complete").touch()
            self.timing["database"] = time.time() - t0
        elif need_store:
            # plan cross-check (reference job.py:929-950
            # check_sources_of_documents): a REUSED doc store must hold
            # the same documents the index was built from — compare
            # source path basenames against the store's config artifact
            # (missing artifact only warns, matching the reference)
            self._check_store_source(store_dir, cfg)

        # ---- stage 2: topics -> queries -> retrieve -> rerank ----
        if results_path.exists():  # run-level resume (job.py:112-116)
            return {"run_path": str(self.run_path),
                    "results": str(results_path), "resumed": True,
                    "manifest": manifest}
        t0 = time.time()
        if "queries" in cfg:
            queries = [(str(q), t) for q, t in cfg["queries"]]
        else:
            topics = _read_topics(cfg)
            qt = topics_to_queries(topics,
                                   cfg["topics"].get("fields", "title"))
            queries = list(zip(qt.column("query_id").to_pylist(),
                               qt.column("query").to_pylist()))

        # queries artifact (reference QueryWriter, topics.py:275-309)
        pa_queries = pa.table({
            "query_id": pa.array([q for q, _ in queries], pa.string()),
            "query": pa.array([t for _, t in queries], pa.string()),
        })
        qdir = self.run_path / "queries"
        qdir.mkdir(exist_ok=True)
        import pyarrow.parquet as _pq

        _pq.write_table(pa_queries, qdir / "queries.parquet")

        ret = cfg.get("retrieve", {})
        k = ret.get("number", 1000)
        searcher = IndexSearcher(
            index_dir,
            scorer=ret.get("name", "bm25"),
            k1=ret.get("k1", 0.9), b=ret.get("b", 0.4),
            mu=ret.get("mu", 1000.0),
        )
        if ret.get("parse"):  # Lucene-syntax queries (schema.py:124)
            from ..search.luceneq import search_lucene

            rows = []
            for qid, text in queries:
                for hit in search_lucene(searcher, text, k):
                    rows.append((qid, hit["doc_id"], hit["rank"],
                                 hit["score"]))
            results = _rows_table(rows)
        elif ret.get("psq"):
            gen = PSQGenerator(searcher.processor, ret["psq"]["path"],
                               ret["psq"].get("threshold", 0.97))
            rows = []
            for qid, text in queries:
                for hit in searcher.search_psq(gen.generate(text), k):
                    rows.append((qid, hit["doc_id"], hit["rank"],
                                 hit["score"]))
            results = _rows_table(rows)
        elif ret.get("rm3"):
            store = DocStore(store_dir) if need_store else None
            if store is None:
                raise ValueError("rm3 requires database.enabled")
            rows = []
            for qid, text in queries:
                for hit in search_rm3(
                    searcher, store, text, k=k,
                    fb_terms=ret.get("fb_terms", 10),
                    fb_docs=ret.get("fb_docs", 10),
                    original_query_weight=ret.get(
                        "original_query_weight", 0.5),
                ):
                    rows.append((qid, hit["doc_id"], hit["rank"],
                                 hit["score"]))
            results = _rows_table(rows)
        else:
            results = searcher.search_batch(queries, k=k)
        self.timing["retrieve"] = time.time() - t0

        rr = cfg.get("rerank")
        if rr:
            from .. import registry

            t0 = time.time()
            custom = registry.resolve("rerank", rr.get("name", "mock"))
            if custom is not None:
                cls, ckw = custom, {"store_path": str(store_dir),
                                    **rr.get("extra_args", {})}
            elif rr.get("name", "mock") == "mock":
                cls, ckw = MockReranker, {"store_path": str(store_dir)}
            else:
                cls = ShellReranker
                ckw = {"store_path": str(store_dir),
                       "script": rr["script"],
                       "doc_lang": lang,
                       "query_lang": cfg.get("topics", {}).get(
                           "input", {}).get("lang", lang),
                       "extra_args": rr.get("extra_args")}
            results = pa.concat_tables(
                ray.get(
                    rerank_results(
                        ray.data.from_arrow(results), cls,
                        constructor_kwargs=ckw,
                    ).to_arrow_refs()
                ),
                promote_options="default",
            )
            self.timing["rerank"] = time.time() - t0

        write_trec_run(results, results_path,
                       system=cfg.get("run", {}).get("name", "patapsco_ray"))

        out = {"run_path": str(self.run_path), "results": str(results_path),
               "resumed": False, "manifest": manifest}

        sc = cfg.get("score")
        if sc:
            qrels = read_qrels(sc["qrels"])
            per_query = evaluate(qrels, results,
                                 sc.get("metrics", ["map", "ndcg"]))
            write_scores_file(per_query, self.run_path / "scores.txt")
            out["scores"] = str(self.run_path / "scores.txt")

        (self.run_path / "timing.json").write_text(
            json.dumps(self.timing, indent=1))
        return out


    @staticmethod
    def _check_store_source(store_dir: pathlib.Path, cfg: dict) -> None:
        import logging

        art = store_dir / ".config.json"
        if not art.exists():
            logging.getLogger(__name__).warning(
                "Unable to load config for the document database")
            return
        prev = json.loads(art.read_text())["documents"]["input"]
        cur = cfg["documents"]["input"]
        prev_path, cur_path = prev.get("path"), cur.get("path")
        if isinstance(prev_path, str) != isinstance(cur_path, str):
            raise ConfigError(
                "documents in index do not match documents in database")
        names = lambda p: ([pathlib.Path(p).name] if isinstance(p, str)
                           else [pathlib.Path(x).name for x in p])
        if names(prev_path) != names(cur_path):
            raise ConfigError(
                "documents in index do not match documents in database")


def _rows_table(rows) -> pa.Table:
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.string()),
        "doc_id": pa.array([r[1] for r in rows], pa.string()),
        "rank": pa.array([r[2] for r in rows], pa.int32()),
        "score": pa.array([r[3] for r in rows], pa.float64()),
    })


def run_pipeline(config) -> dict:
    return Runner(config).run()
