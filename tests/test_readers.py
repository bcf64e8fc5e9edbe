"""Tests for document/topic readers against reference-format fixtures."""

import pyarrow as pa
import pytest

from patapsco_ray.sources import (
    read_jsonl_documents,
    read_jsonl_topics,
    read_sgml_documents,
    read_sgml_topics,
    read_tsv_documents,
    read_tsv_topics,
    topics_to_queries,
)

DOCS_JSONL = (
    '{"id": "abcdef", "date": "2020-12-31", "title": "title1 ", '
    '"text": " text1", "url": "https://example.org/doc1.html"}\n'
    '{"id": "tuvwxy", "date": "2020-12-31", "title": "title2", '
    '"text": "text2", "url": "https://example.org/doc2.html"}\n'
)

TOPICS_JSONL = (
    '{"topic_id": "001", "languages_with_qrels": ["eng", "rus"], "topics": '
    '[{"lang": "eng", "source": "original", "topic_title": "Test 1", '
    '"topic_description": "First test"}, {"lang": "rus", "source": '
    '"translation", "topic_title": "T1", "topic_description": "P1"}], '
    '"report": {"url": "https://example.org", "text": "report 1"}}\n'
    '{"topic_id": "002", "languages_with_qrels": ["rus"], "topics": '
    '[{"lang": "eng", "source": "original", "topic_title": "Test 2", '
    '"topic_description": "Second test"}]}\n'
    '{"topic_id": "003", "languages_with_qrels": ["eng"], "topics": '
    '[{"lang": "eng", "source": "original", "topic_title": null, '
    '"topic_description": "Null title"}]}\n'
)

SGML = """<DOC>
<DOCNO> ABC-123 </DOCNO>
<HEADLINE>The Headline</HEADLINE>
<TEXT>Body text
here.</TEXT>
</DOC>
<DOC>
<DOCNO>XYZ-9</DOCNO>
<TEXT>Second doc.</TEXT>
</DOC>
"""


def test_jsonl_documents(ray_session, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(DOCS_JSONL)
    got = read_jsonl_documents(str(p)).to_pandas().set_index("doc_id")
    # title.strip() + ' ' + text.strip() (reference docs.py:92)
    assert got.loc["abcdef", "text"] == "title1 text1"
    assert got.loc["tuvwxy", "text"] == "title2 text2"
    assert got.loc["abcdef", "date"] == "2020-12-31"


def test_tsv_documents(ray_session, tmp_path):
    p = tmp_path / "docs.tsv"
    p.write_text("d1\tpassage one\nd2\tpassage two\n")
    got = (read_tsv_documents(str(p), lang="eng").to_pandas()
           .sort_values("doc_id"))  # block order is not guaranteed
    assert got["doc_id"].tolist() == ["d1", "d2"]
    assert got["text"].tolist() == ["passage one", "passage two"]


def test_sgml_documents(ray_session, tmp_path):
    p = tmp_path / "docs.sgml"
    p.write_text(SGML)
    got = read_sgml_documents(str(p)).to_pandas().set_index("doc_id")
    assert got.loc["ABC-123", "text"] == "The Headline Body text\nhere."
    assert got.loc["XYZ-9", "text"] == "Second doc."


def test_jsonl_topics_filtering(tmp_path):
    p = tmp_path / "topics.jsonl"
    p.write_text(TOPICS_JSONL)
    t = read_jsonl_topics(str(p), lang="eng", source="original")
    # 002 has no eng qrels but qrels_lang unset -> kept; 003 null title
    assert t.column("topic_id").to_pylist() == ["001", "002"]
    t2 = read_jsonl_topics(str(p), lang="eng", source="original",
                           qrels_lang="eng")
    assert t2.column("topic_id").to_pylist() == ["001"]
    assert t2.column("report").to_pylist() == ["report 1"]
    with pytest.raises(ValueError):
        read_jsonl_topics(str(p), lang="zho", source="original")


def test_tsv_topics_and_query_join(tmp_path):
    p = tmp_path / "queries.tsv"
    p.write_text("100\twhat is ray\n101\thow to arrow\n")
    topics = read_tsv_topics(str(p))
    q = topics_to_queries(topics, fields="title")
    assert q.column("query_id").to_pylist() == ["100", "101"]
    assert q.column("query").to_pylist() == ["what is ray", "how to arrow"]


def test_sgml_topics(tmp_path):
    p = tmp_path / "topics.sgml"
    p.write_text(
        "<top>\n<num> Number: 301 </num>\n<title> Topic One </title>\n"
        "<desc> the description text </desc>\n"
        "<narr> narr text </narr>\n</top>\n"
    )
    t = read_sgml_topics(str(p), strip_non_digits=True)
    assert t.column("topic_id").to_pylist() == ["301"]
    assert t.column("title").to_pylist() == ["Topic One"]
    q = topics_to_queries(t, fields="title+desc")
    assert q.column("query")[0].as_py() == "Topic One the description text"


def test_topics_to_queries_aliases():
    t = pa.table({
        "topic_id": ["1"], "lang": ["eng"],
        "title": ["T"], "desc": ["D"], "report": [None],
    })
    assert topics_to_queries(t, "name+description").column(
        "query")[0].as_py() == "T D"
    with pytest.raises(ValueError):
        topics_to_queries(t, "bogus")
