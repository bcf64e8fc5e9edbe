"""Document / topic / query readers, Ray-Data-native.

Re-expresses the reference's InputIterator zoo
(/root/reference/patapsco/docs.py, topics.py) as Dataset constructors.
GlobIterator's multi-file concatenation (util/__init__.py:222-301) is
native to ``read_json``/``read_csv`` path lists; SlicedIterator
sharding (util/__init__.py:184-214) is Ray block splitting.

Output schemas:
    documents: doc_id:string, lang:string, text:string, date:string?
    topics:    topic_id:string, lang:string, title:string, desc:string,
               report:string?
    queries:   query_id:string, lang:string, query:string, text:string
"""

from __future__ import annotations

import glob as globlib
import gzip
import json
import pathlib
import re

import pyarrow as pa

import ray.data


def _expand(paths: str | list[str]) -> list[str]:
    if isinstance(paths, (str, pathlib.Path)):
        paths = [str(paths)]
    out: list[str] = []
    for p in paths:
        matches = sorted(globlib.glob(str(p)))
        if matches:
            out.extend(matches)
        elif pathlib.Path(p).exists():
            out.append(str(p))
        else:
            # reference GlobIterator errors on empty matches
            raise FileNotFoundError(f"no input matches {p}")
    return out


def read_jsonl_documents(
    paths: str | list[str], lang: str = "eng"
) -> ray.data.Dataset:
    """CC-News-style JSONL docs (reference Hc4JsonDocumentReader,
    docs.py:62-99). The extraction invariant: text is
    ``title.strip() + ' ' + text.strip()`` (docs.py:92)."""
    ds = ray.data.read_json(_expand(paths))

    def project(tbl: pa.Table) -> pa.Table:
        titles = [t.strip() for t in tbl.column("title").to_pylist()]
        texts = [t.strip() for t in tbl.column("text").to_pylist()]
        dates = (
            # read_json may infer date32; normalize to YYYY-MM-DD strings
            # (dates are plain strings in the reference data plane,
            # docs/formats.md)
            [None if d is None
             else (d.strftime("%Y-%m-%d") if hasattr(d, "strftime")
                   else str(d))
             for d in tbl.column("date").to_pylist()]
            if "date" in tbl.schema.names else [None] * tbl.num_rows
        )
        return pa.table({
            "doc_id": pa.compute.cast(tbl.column("id"), pa.string()),
            "lang": pa.array([lang] * tbl.num_rows, pa.string()),
            "text": pa.array(
                [f"{a} {b}" for a, b in zip(titles, texts)], pa.string()),
            "date": pa.array(dates, pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def read_tsv_documents(
    paths: str | list[str], lang: str = "eng"
) -> ray.data.Dataset:
    """MSMARCO passages TSV ``id\\ttext`` (TsvDocumentReader,
    docs.py:102-125)."""
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        _expand(paths),
        read_options=pacsv.ReadOptions(
            column_names=["doc_id", "text"], use_threads=False),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(
            column_types={"doc_id": pa.string(), "text": pa.string()}),
    )

    def project(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        return pa.table({
            "doc_id": tbl.column("doc_id"),
            "lang": pa.array([lang] * n, pa.string()),
            "text": tbl.column("text"),
            "date": pa.array([None] * n, pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


# --- TREC SGML (SgmlDocumentReader, docs.py:42-59) -------------------

# text tags concatenated in this order (util/formats.py:17)
_SGML_TEXT_TAGS = ["headline", "title", "hl", "head", "ttl", "dd",
                   "date", "lp", "leadpara", "text"]
_TAG_STRIP = re.compile(r"<[^>]+>")


def _sgml_tag_text(doc: str, tag: str) -> str | None:
    m = re.search(rf"<{tag}[^>]*>(.*?)</{tag}>", doc,
                  re.DOTALL | re.IGNORECASE)
    if m is None:
        return None
    return _TAG_STRIP.sub("", m.group(1)).strip()


def parse_sgml_documents(raw: str):
    """Yield (doc_id, text) per <DOC> (util/formats.py:15-31: first
    matching text tag per tag name, ' '-joined)."""
    for m in re.finditer(r"<DOC[ >].*?</DOC>", raw, re.DOTALL | re.IGNORECASE):
        doc = m.group(0)
        doc_id = _sgml_tag_text(doc, "DOCNO")
        parts = []
        for tag in _SGML_TEXT_TAGS:
            t = _sgml_tag_text(doc, tag)
            if t is not None:
                parts.append(t)
        yield doc_id, " ".join(parts)


def read_sgml_documents(
    paths: str | list[str], lang: str = "eng", encoding: str = "utf8"
) -> ray.data.Dataset:
    files = _expand(paths)
    ds = ray.data.read_binary_files(files)

    def parse(tbl: pa.Table) -> pa.Table:
        ids, texts = [], []
        for payload in tbl.column("bytes").to_pylist():
            raw = (gzip.decompress(payload) if payload[:2] == b"\x1f\x8b"
                   else payload).decode(encoding)
            for doc_id, text in parse_sgml_documents(raw):
                ids.append(doc_id)
                texts.append(text)
        n = len(ids)
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "lang": pa.array([lang] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "date": pa.array([None] * n, pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# --- topics ----------------------------------------------------------


def read_jsonl_topics(
    paths: str | list[str],
    lang: str = "eng",
    source: str = "original",
    qrels_lang: str | None = None,
) -> pa.Table:
    """HC4 JSONL topics (Hc4JsonTopicReader, topics.py:145-212):
    select the (lang, source) entry per topic, filter by
    languages_with_qrels, skip null title/desc. Topic sets are tiny
    (stage-2 progress interval is 10, schema.py:227) so this is a
    driver-side parse returning an Arrow table."""
    ids, titles, descs, reports = [], [], [], []
    for path in _expand(paths):
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt", encoding="utf8") as fp:
            for line in fp:
                if not line.strip():
                    continue
                data = json.loads(line)
                if qrels_lang and qrels_lang not in data.get(
                        "languages_with_qrels", []):
                    continue
                for topic in data["topics"]:
                    if topic["lang"] == lang and topic["source"] == source:
                        if (topic["topic_title"] is None
                                or topic["topic_description"] is None):
                            break
                        ids.append(str(data["topic_id"]))
                        titles.append(topic["topic_title"].strip())
                        descs.append(topic["topic_description"].strip())
                        reports.append(
                            data["report"]["text"]
                            if "report" in data else None)
                        break
    if not ids:
        raise ValueError(f"no topics available for {lang} {source}")
    n = len(ids)
    return pa.table({
        "topic_id": pa.array(ids, pa.string()),
        "lang": pa.array([lang] * n, pa.string()),
        "title": pa.array(titles, pa.string()),
        "desc": pa.array(descs, pa.string()),
        "report": pa.array(reports, pa.string()),
    })


def read_tsv_topics(paths: str | list[str], lang: str = "eng") -> pa.Table:
    """MSMARCO queries TSV (TsvTopicReader, topics.py:215-239)."""
    ids, titles = [], []
    for path in _expand(paths):
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt", encoding="utf8") as fp:
            for line in fp:
                if not line.strip():
                    continue
                qid, text = line.rstrip("\n").split("\t", 1)
                ids.append(qid)
                titles.append(text)
    n = len(ids)
    return pa.table({
        "topic_id": pa.array(ids, pa.string()),
        "lang": pa.array([lang] * n, pa.string()),
        "title": pa.array(titles, pa.string()),
        "desc": pa.array([""] * n, pa.string()),
        "report": pa.array([None] * n, pa.string()),
    })


def read_sgml_topics(
    paths: str | list[str], lang: str = "eng",
    strip_non_digits: bool = False,
) -> pa.Table:
    """TREC SGML topics <top><num><title><desc><narr>
    (SgmlTopicReader, topics.py:96-118; util/formats.py:62-79: field
    text kept verbatim apart from whitespace strip; digit extraction
    only via ``strip_non_digits``, topics.py:111)."""
    ids, titles, descs, narrs = [], [], [], []
    for path in _expand(paths):
        raw = pathlib.Path(path).read_text(encoding="utf8")
        for m in re.finditer(r"<top>(.*?)</top>", raw, re.DOTALL):
            body = m.group(1)

            def field(tag: str) -> str:
                fm = re.search(
                    rf"<{tag}>(.*?)(?:</{tag}>|(?=<)|$)",
                    body, re.DOTALL | re.IGNORECASE)
                return fm.group(1).strip() if fm else ""

            num = field("num")
            if strip_non_digits:
                num = re.sub(r"\D", "", num)
            ids.append(num)
            titles.append(field("title"))
            descs.append(field("desc"))
            narrs.append(field("narr"))
    n = len(ids)
    return pa.table({
        "topic_id": pa.array(ids, pa.string()),
        "lang": pa.array([lang] * n, pa.string()),
        "title": pa.array(titles, pa.string()),
        "desc": pa.array(descs, pa.string()),
        "report": pa.array([None] * n, pa.string()),
    })


# --- topic -> query (TopicProcessor, topics.py:55-93) ----------------

FIELD_MAP = {"title": "title", "name": "title",
             "desc": "desc", "description": "desc"}


def topics_to_queries(topics: pa.Table, fields: str = "title") -> pa.Table:
    """Join the selected topic fields with ' ' into query text
    (fields are '+'-separated with aliases, topics.py:58-63,76-82)."""
    try:
        cols = [FIELD_MAP[f.lower()] for f in fields.split("+")]
    except KeyError as e:
        raise ValueError(f"unrecognized topic field: {e}")
    parts = [topics.column(c).to_pylist() for c in cols]
    text = [" ".join(p[i].strip() for p in parts)
            for i in range(topics.num_rows)]
    return pa.table({
        "query_id": topics.column("topic_id"),
        "lang": topics.column("lang"),
        "query": pa.array(text, pa.string()),
        "text": pa.array(text, pa.string()),
    })
